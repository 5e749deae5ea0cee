"""Token-budget mixture planning: DuckDB oracle parity for the rates
frame, closed-form semantics, and the budget-hitting composition with
stratified sampling.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.functions.text import token_count
from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
    mixture_rates,
    sample_to_budget,
)
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table

from conftest import assert_matches_oracle

BUDGETS = {"en": 3000, "zh": 1}  # en partially sampled, zh effectively dropped

_N_TOKENS = "CASE WHEN trim(text)='' THEN 0 ELSE len(string_split_regex(trim(text), '[ \t\n\r]+')) END"

_ORACLE = f"""
WITH avail AS (
  SELECT lang AS stratum, sum({_N_TOKENS})::BIGINT AS available_tokens
  FROM documents GROUP BY lang
)
SELECT stratum, available_tokens,
       (CASE WHEN stratum = 'en' THEN 3000 WHEN stratum = 'zh' THEN 1 END)::BIGINT AS budget_tokens,
       round(CASE WHEN stratum = 'en' AND available_tokens > 3000 THEN 3000 / available_tokens::DOUBLE
                  WHEN stratum = 'zh' AND available_tokens > 1 THEN 1 / available_tokens::DOUBLE
                  ELSE 1.0 END, 6) AS rate
FROM avail"""


def test_mixture_rates_match_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    assert_matches_oracle(mixture_rates(docs, BUDGETS), duck, _ORACLE)


def test_mixture_rates_closed_form(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d", "en"), (2, "e f g h", "en"),      # en: 8 tokens
            (3, "i j", "fr"),                                 # fr: 2 tokens, no budget
            (4, "k l m", "zh"),                               # zh: 3 tokens, budget 6 > avail
        ],
        "doc_id long, text string, lang string",
    )
    out = {r["stratum"]: r for r in mixture_rates(docs, {"en": 4, "zh": 6}).collect()}
    assert out["en"]["rate"] == 0.5 and out["en"]["available_tokens"] == 8
    assert out["fr"]["rate"] == 1.0 and out["fr"]["budget_tokens"] is None
    assert out["zh"]["rate"] == 1.0  # cannot up-sample by dropping


def test_sample_to_budget_hits_budget_in_expectation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    kept = sample_to_budget(docs, BUDGETS)
    mass = {
        r["lang"]: r["m"]
        for r in kept.groupBy("lang").agg(F.sum(token_count(F.col("text"))).alias("m")).collect()
    }
    # en lands near its budget (doc-level sampling: tolerance is a few docs'
    # mass); zh's rate ~0 drops everything; unbudgeted strata keep all
    assert 0.4 * BUDGETS["en"] <= mass.get("en", 0) <= 2.0 * BUDGETS["en"]
    assert mass.get("zh", 0) == 0
    full = {
        r["lang"]: r["m"]
        for r in docs.groupBy("lang").agg(F.sum(token_count(F.col("text"))).alias("m")).collect()
    }
    for lang in full:
        if lang not in BUDGETS:
            assert mass.get(lang, 0) == full[lang]
    # deterministic: same salt, same sample
    again = sample_to_budget(docs, BUDGETS)
    assert kept.exceptAll(again).count() == 0 and again.exceptAll(kept).count() == 0


class TestTemperatureMixture:
    def test_exact_delivery_and_caps(self):
        from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
            temperature_targets,
        )

        masses = {"en": 1_000_000, "fr": 100_000, "sw": 1_000}
        t = temperature_targets(masses, 500_000, alpha=0.7)
        assert abs(sum(t.values()) - 500_000) < 1e-6
        for s, m in masses.items():
            assert t[s] <= m + 1e-9

    def test_alpha_one_is_proportional(self):
        from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
            temperature_targets,
        )

        masses = {"a": 300, "b": 100}
        t = temperature_targets(masses, 200, alpha=1.0)
        assert abs(t["a"] / t["b"] - 3.0) < 1e-9

    def test_lower_alpha_lifts_rare_strata(self):
        from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
            temperature_targets,
        )

        masses = {"big": 1_000_000, "small": 10_000}
        flat = temperature_targets(masses, 100_000, alpha=0.3)
        prop = temperature_targets(masses, 100_000, alpha=1.0)
        assert flat["small"] > prop["small"]

    def test_waterfilling_redistributes_capped_surplus(self):
        from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
            temperature_targets,
        )

        # uniform (alpha=0) split of 300 over capacities (50, 1000, 1000):
        # the 100-per-stratum ask caps the first at 50; the 50 surplus
        # splits over the remaining two -> 125 each
        t = temperature_targets({"x": 50, "y": 1000, "z": 1000}, 300, alpha=0.0)
        assert t["x"] == 50 and abs(t["y"] - 125) < 1e-9 and abs(t["z"] - 125) < 1e-9

    def test_budget_above_total_keeps_everything(self):
        from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
            temperature_targets,
        )

        masses = {"a": 10, "b": 20}
        t = temperature_targets(masses, 1_000, alpha=0.7)
        assert t == {"a": 10.0, "b": 20.0}

    def test_operator_frame_and_expected_delivery(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from document_clustering_with_hadoop_mapreduce_spark.functions.text import (
            token_count,
        )
        from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
            sample_to_temperature_budget,
            temperature_mixture,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        total = docs.select(F.sum(token_count(F.col("text")))).collect()[0][0]
        budget = int(total * 0.4)
        plan = temperature_mixture(docs, budget, alpha=0.7)
        rows = plan.collect()
        assert abs(sum(r["target_tokens"] for r in rows) - budget) <= len(rows)
        assert all(0.0 <= r["rate"] <= 1.0 for r in rows)

        kept = sample_to_temperature_budget(docs, budget, alpha=0.7)
        kept_tokens = kept.select(F.sum(token_count(F.col("text")))).collect()[0][0]
        # expectation-level delivery: hash sampling is per-document
        assert 0.25 * total < kept_tokens < 0.55 * total

    def test_validation(self):
        import pytest as pt

        from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
            temperature_targets,
        )

        with pt.raises(ValueError, match="total_budget"):
            temperature_targets({"a": 1}, -1)
        with pt.raises(ValueError, match="alpha"):
            temperature_targets({"a": 1}, 1, alpha=-0.1)
