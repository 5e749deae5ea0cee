"""frequent_ngrams: exact two-pass heavy hitters vs the straight DuckDB count.

The exactness claim is that the sketch-shaped two-pass plan (bounded bucket
count -> candidate semi-join -> exact recount) equals the naive exact
GROUP BY/HAVING bit-for-bit — including under forced bucket collisions.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.heavyhitters import (
    frequent_ngrams,
    frequent_ngrams_oracle_sql,
    heavy_buckets,
    _gram_stream,
)

from conftest import assert_matches_oracle


def test_matches_exact_oracle_on_fixture(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = frequent_ngrams(docs, n=2, min_count=3)
    assert_matches_oracle(got, duck, frequent_ngrams_oracle_sql(n=2, min_count=3))
    # a trivially-empty result would make this gate meaningless
    assert got.limit(1).count() == 1


def test_exact_under_forced_collisions(spark, sf_dir, duck):
    """n_buckets=8 over thousands of distinct grams: nearly every bucket is
    a candidate and every gram collides — the HAVING in pass 2 must still
    strip all false positives."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = frequent_ngrams(docs, n=2, min_count=3, n_buckets=8)
    assert_matches_oracle(got, duck, frequent_ngrams_oracle_sql(n=2, min_count=3))


@pytest.fixture(scope="module")
def mini(spark, duck):
    """Planted corpus: one boilerplate trigram in 7 docs, one phrase at
    exactly min_count-1, unique filler everywhere else."""
    rows = []
    for i in range(7):
        rows.append((i, f"Site Header Boilerplate! unique filler {i} aa{i} bb{i} cc{i}"))
    for i in range(7, 9):
        rows.append((i, f"almost heavy phrase pad{i} qq{i}"))
    rows.append((9, ""))
    rows.append((10, "tiny"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    duck.register("hh_mini", pdf)
    return spark.createDataFrame(pdf)


def test_planted_boilerplate_found_exactly(spark, duck, mini):
    got = frequent_ngrams(mini, n=3, min_count=3)
    assert_matches_oracle(
        got, duck, frequent_ngrams_oracle_sql(n=3, min_count=3, source="hh_mini")
    )
    rows = {r["ngram"]: r["cnt"] for r in got.collect()}
    assert rows["site header boilerplate"] == 7
    # 2 < min_count: the almost-heavy phrase must NOT appear
    assert "almost heavy phrase" not in rows


def test_superset_guarantee_pass1(spark, mini):
    """Every truly-heavy gram's bucket must appear in heavy_buckets, even
    with heavy collision pressure (the no-false-negatives invariant)."""
    from document_clustering_with_hadoop_mapreduce_spark.functions.hashing import md5_int60

    n_buckets = 4
    grams = _gram_stream(mini, 3, "text")
    cand = {r["bucket"] for r in heavy_buckets(grams, 3, n_buckets).collect()}
    truth = (
        grams.groupBy("ngram").count().filter(F.col("count") >= 3)
        .select(F.pmod(md5_int60(F.col("ngram")), F.lit(n_buckets)).alias("b"))
    )
    assert {r["b"] for r in truth.collect()} <= cand


def test_empty_and_short_docs(spark, duck):
    pdf = pd.DataFrame({"doc_id": [0, 1], "text": ["", "one two"]})
    duck.register("hh_short", pdf)
    got = frequent_ngrams(spark.createDataFrame(pdf), n=3, min_count=1)
    assert got.count() == 0
    assert duck.execute(
        frequent_ngrams_oracle_sql(n=3, min_count=1, source="hh_short")
    ).fetchdf().empty


def test_min_count_validation(spark, mini):
    with pytest.raises(ValueError, match="min_count"):
        frequent_ngrams(mini, min_count=0)


def test_plan_shape(spark, sf_dir):
    """The candidate filter must be a broadcast LEFT SEMI (the gram stream
    never carries bucket counts); no cartesian/nested-loop anywhere."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = frequent_ngrams(docs, n=2, min_count=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
