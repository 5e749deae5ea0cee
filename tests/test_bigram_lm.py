"""Bigram-interpolated LM scorer: DuckDB oracle parity, order sensitivity
(the property unigram perplexity cannot have), OOV fallback semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.functions.text import (
    CLEAN_RE_DUCKDB,
    STOPWORDS,
)
from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
    bigram_cross_entropy,
    bigram_lm,
    bigram_stream,
)

STOPWORDS_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# filtered token ARRAY per doc (order matters for bigrams, so the oracle
# keeps the list form instead of the unnest-then-filter TOKENS_CTE)
ARR_CTE = f"""
arr AS (
  SELECT doc_id,
         list_filter(
           string_split_regex(regexp_replace(lower(text), '{CLEAN_RE_DUCKDB}', '', 'g'), '[ \t\n\r]+'),
           t -> t <> '' AND t NOT IN ({STOPWORDS_SQL})
         ) AS a
  FROM documents
),
bi AS (
  SELECT doc_id, a[i] AS w1, a[i + 1] AS w2
  FROM arr, LATERAL (SELECT unnest(generate_series(1, len(a) - 1)) AS i) g
  WHERE len(a) >= 2
),
uni AS (
  SELECT doc_id, unnest(a) AS w2 FROM arr
)"""

ORACLE_SQL = f"""
WITH {ARR_CTE},
bi_counts AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY w1, w2),
ctx AS (SELECT w1, sum(c) AS cx FROM bi_counts GROUP BY w1),
p_bi AS (
  SELECT bi_counts.w1, bi_counts.w2, c::DOUBLE / cx AS p_bi
  FROM bi_counts JOIN ctx USING (w1)
),
uni_counts AS (SELECT w2, count(*) AS c FROM uni GROUP BY w2),
m AS (SELECT sum(c)::DOUBLE AS m FROM uni_counts),
p_uni AS (SELECT w2, c::DOUBLE / m.m AS p_uni FROM uni_counts, m)
SELECT bi.doc_id,
       round(-CAST(sum(CAST(round(ln({{lam}} * p_bi + {{one_minus}} * p_uni), 12)
                            AS DECIMAL(38,12))) AS DOUBLE) / count(*), 6) AS cross_entropy,
       count(*) AS n_bigrams
FROM bi JOIN p_bi USING (w1, w2) JOIN p_uni USING (w2)
GROUP BY bi.doc_id
"""


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


class TestBigramStream:
    def test_adjacent_pairs_small(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "solo"), (3, ""), (4, None)],
            "doc_id int, text string",
        )
        rows = sorted(
            bigram_stream(df).collect(), key=lambda r: (r.doc_id, r.w1, r.w2)
        )
        assert [(r.doc_id, r.w1, r.w2) for r in rows] == [
            (1, "alpha", "beta"),
            (1, "beta", "gamma"),
        ]

    def test_stopwords_bridge_adjacency(self, spark):
        # "alpha the beta": stopword drops -> (alpha, beta) IS a bigram
        df = spark.createDataFrame([(1, "alpha the beta")], "doc_id int, text string")
        rows = bigram_stream(df).collect()
        assert [(r.w1, r.w2) for r in rows] == [("alpha", "beta")]

    def test_zero_shuffle_plan(self, spark):
        df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
        plan = bigram_stream(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestOracleParity:
    @pytest.mark.parametrize("lam", [0.8, 0.5])
    def test_self_trained_matches_duckdb(self, spark, sf_dir, docs, lam):
        got = {
            r.doc_id: (r.cross_entropy, r.n_bigrams)
            for r in bigram_cross_entropy(docs, lam=lam).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = {
            d: (ce, n)
            for d, ce, n in con.execute(
                ORACLE_SQL.format(lam=lam, one_minus=round(1.0 - lam, 12))
            ).fetchall()
        }
        assert set(got) == set(want)
        # tolerance = one 6dp rounding step: per-element ln can differ by
        # 1 ulp between libm implementations, which near a x.xxxxxx5
        # boundary legitimately flips the last rounded digit — exact
        # equality would be fixture-dependent flakiness, not rigor
        for d in want:
            assert got[d][1] == want[d][1], d
            assert got[d][0] == pytest.approx(want[d][0], abs=1.5e-6), d

    def test_conditional_rows_sum_to_one(self, spark, docs):
        bi, uni = bigram_lm(docs)
        bad = (
            bi.groupBy("w1")
            .agg(F.sum("p_bi").alias("s"))
            .where(F.abs(F.col("s") - 1.0) > 1e-9)
            .count()
        )
        assert bad == 0
        mass = uni.agg(F.sum("p_uni")).collect()[0][0]
        assert mass == pytest.approx(1.0, abs=1e-9)


class TestOrderSensitivity:
    def test_shuffled_text_scores_worse_than_natural(self, spark):
        # Score a natural sentence vs the SAME BAG of words scrambled,
        # against an LM trained on natural text. The bigram LM must
        # separate them; a unigram LM can't (identical bags -> identical
        # unigram score by construction).
        natural = "market prices rose sharply after strong quarterly earnings"
        words = natural.split()
        scrambled = " ".join(words[::2] + words[1::2][::-1])
        train = spark.createDataFrame(
            [(i, natural) for i in range(5)], "doc_id long, text string"
        )
        probe = spark.createDataFrame(
            [(9000001, natural), (9000002, scrambled)], "doc_id long, text string"
        )
        scores = {
            r.doc_id: r.cross_entropy
            for r in bigram_cross_entropy(
                probe, lm=bigram_lm(train), materialize=False
            ).collect()
        }
        assert scores[9000002] > scores[9000001]


class TestExternalLM:
    def test_oov_fallback_left_join(self, spark):
        train = spark.createDataFrame(
            [(1, "alpha beta alpha beta"), (2, "beta gamma")],
            "doc_id int, text string",
        )
        score = spark.createDataFrame(
            [(10, "alpha beta"), (11, "zzz qqq")], "doc_id int, text string"
        )
        lm = bigram_lm(train)
        out = {
            r.doc_id: (r.cross_entropy, r.n_bigrams)
            for r in bigram_cross_entropy(
                score, lm=lm, materialize=False
            ).collect()
        }
        # seen bigram: finite, small; fully-OOV doc: floor probability,
        # large but FINITE (left joins — the doc is not dropped)
        assert out[10][1] == 1 and out[11][1] == 1
        assert out[10][0] < out[11][0] < float("inf")

    def test_lam_validation(self, spark):
        df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
        with pytest.raises(ValueError, match="lam"):
            bigram_cross_entropy(df, lam=0.0)
        with pytest.raises(ValueError, match="lam"):
            bigram_cross_entropy(df, lam=1.5)


class TestExternalLamGuard:
    def test_lam_one_with_external_lm_rejected(self, spark):
        # lam=1 + external LM would send OOV bigrams through ln(0) -> NULL,
        # which sum() drops while count() keeps — silently understating
        # cross-entropy for the worst docs. Must refuse loudly.
        train = spark.createDataFrame([(1, "alpha beta")], "doc_id int, text string")
        probe = spark.createDataFrame([(2, "zzz qqq")], "doc_id int, text string")
        with pytest.raises(ValueError, match="lam=1.0 with an external lm"):
            bigram_cross_entropy(probe, lam=1.0, lm=bigram_lm(train))

    def test_lam_one_self_trained_still_legal(self, spark):
        df = spark.createDataFrame([(1, "alpha beta alpha beta")], "doc_id int, text string")
        assert bigram_cross_entropy(df, lam=1.0).count() == 1
