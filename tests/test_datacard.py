"""Corpus data card: DuckDB oracle parity on the fixture, interpolated
quantile math against numpy, and the sort-not-buffer plan discipline.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.datacard import (
    corpus_datacard,
    exact_quantiles,
)
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table

from conftest import assert_matches_oracle

_TOKS_CLEAN = (
    "list_filter(string_split_regex(regexp_replace(lower(text), "
    "'[^a-z0-9 \\t\\n\\r]', '', 'g'), '[ \\t\\n\\r]+'), t -> t <> '')"
)

_ORACLE = f"""
WITH counted AS (
  SELECT source, lang,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '[ \\t\\n\\r]+')) END AS nt,
         length(text) AS nc
  FROM documents
),
base AS (
  SELECT source, lang,
         count(*)::BIGINT AS n_docs,
         sum(CASE WHEN nt = 0 THEN 1 ELSE 0 END)::BIGINT AS n_blank,
         sum(nt)::BIGINT AS total_tokens,
         sum(nc)::BIGINT AS total_chars,
         round(avg(nt), 6) AS avg_tokens,
         round(quantile_cont(nt, 0.5), 6) AS median_tokens,
         round(quantile_cont(nt, 0.95), 6) AS p95_tokens
  FROM counted GROUP BY source, lang
),
vocab AS (
  SELECT source, lang, count(DISTINCT tok)::BIGINT AS vocab_size
  FROM (SELECT source, lang, unnest({_TOKS_CLEAN}) AS tok FROM documents)
  GROUP BY source, lang
)
SELECT b.source, b.lang, b.n_docs, b.n_blank, b.total_tokens, b.total_chars,
       b.avg_tokens, b.median_tokens, b.p95_tokens,
       coalesce(v.vocab_size, 0) AS vocab_size
FROM base b LEFT JOIN vocab v USING (source, lang)
"""


def test_corpus_datacard_matches_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    assert_matches_oracle(corpus_datacard(docs), duck, _ORACLE)


def test_exact_quantiles_match_numpy_linear(spark):
    """quantile_cont == numpy's 'linear' interpolation — pin the window
    formulation to the continuous definition on awkward group sizes
    (1, 2, even, odd, ties)."""
    rows = [
        ("a", v) for v in [3.0]
    ] + [
        ("b", v) for v in [1.0, 9.0]
    ] + [
        ("c", v) for v in [5.0, 1.0, 7.0, 3.0]
    ] + [
        ("d", v) for v in [2.0, 2.0, 2.0, 8.0, 11.0]
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: (r["med"], r["p90"])
        for r in exact_quantiles(df, ["g"], "v", (0.5, 0.9), ("med", "p90")).collect()
    }
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        want = (
            round(float(np.percentile(vs, 50, method="linear")), 6),
            round(float(np.percentile(vs, 90, method="linear")), 6),
        )
        assert got[g] == want, (g, got[g], want)


def test_datacard_plan_sorts_instead_of_buffering(spark, sf_dir):
    """The quantile path must be the window sort, never Spark's
    group-buffering `percentile` aggregate; group-sized sides broadcast."""
    docs = load_table(spark, sf_dir, "documents", fan_out=False)
    plan = corpus_datacard(docs)._jdf.queryExecution().executedPlan().toString()
    assert "percentile" not in plan.lower()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_approx_mode_error_bounds(spark, sf_dir):
    """The 100 TB reporting path: HLL vocab and t-digest quantiles must
    land within tight relative error of the exact card on real data."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.source, r.lang): r for r in corpus_datacard(docs).collect()
    }
    approx = {
        (r.source, r.lang): r for r in corpus_datacard(docs, approx=True).collect()
    }
    assert set(exact) == set(approx)
    for key, e in exact.items():
        a = approx[key]
        # counts/sums are still exact in approx mode
        assert (a.n_docs, a.n_blank, a.total_tokens, a.total_chars) == (
            e.n_docs, e.n_blank, e.total_tokens, e.total_chars,
        )
        if e.vocab_size > 0:
            assert abs(a.vocab_size - e.vocab_size) / e.vocab_size < 0.1
    # quantile error is only meaningful over a real population: the tiny
    # per-(source,lang) fixture groups (~5 docs) make element-returning
    # t-digest vs interpolating quantile_cont diverge by definition, so
    # pin the bound on the single-slice card over the whole corpus
    whole = docs.withColumn("corpus", F.lit("all"))
    ge = corpus_datacard(whole, group_cols=("corpus",)).collect()[0]
    ga = corpus_datacard(whole, group_cols=("corpus",), approx=True).collect()[0]
    assert abs(ga.median_tokens - ge.median_tokens) / ge.median_tokens < 0.05
    assert abs(ga.p95_tokens - ge.p95_tokens) / ge.p95_tokens < 0.05
    assert abs(ga.vocab_size - ge.vocab_size) / ge.vocab_size < 0.05


def test_approx_mode_plan_has_no_per_group_sort(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        corpus_datacard(docs, approx=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan  # no row_number ranking pass in approx mode
