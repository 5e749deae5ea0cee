"""global_shuffle / write_training_shards: deterministic corpus permutation.

Gates: bit-exact DuckDB oracle on (shard, pos), invariance to input
partitioning/order, dense per-shard positions, decorrelation from input
order, shard balance, and the on-disk shard layout round-trip.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.sources.export import (
    global_shuffle,
    global_shuffle_oracle_sql,
    write_training_shards,
)

from conftest import assert_matches_oracle

N_SHARDS = 8
SALT = "test-shuffle"


def test_matches_duckdb_oracle(spark, sf_dir, duck):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = global_shuffle(docs, N_SHARDS, SALT).select("doc_id", "shard", "pos")
    assert_matches_oracle(got, duck, global_shuffle_oracle_sql(N_SHARDS, SALT))


def test_invariant_to_input_order_and_partitioning(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = global_shuffle(docs, N_SHARDS, SALT).select("doc_id", "shard", "pos")
    scrambled = docs.orderBy(F.reverse(F.col("text"))).repartition(13)
    b = global_shuffle(scrambled, N_SHARDS, SALT).select("doc_id", "shard", "pos")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_positions_dense_and_complete(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = global_shuffle(docs, N_SHARDS, SALT)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    per = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.min("pos").alias("lo"), F.max("pos").alias("hi")
    )
    for r in per.collect():
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1


def test_order_is_decorrelated_from_ids(spark):
    """Sequential ids in, shuffled order out: within a shard, consecutive
    positions should step UP in doc_id only about half the time."""
    pdf = pd.DataFrame({"doc_id": range(2000), "text": ["x"] * 2000})
    out = (
        global_shuffle(spark.createDataFrame(pdf), 4, SALT)
        .orderBy("shard", "pos")
        .collect()
    )
    ups = downs = 0
    for prev, cur in zip(out, out[1:]):
        if cur["shard"] != prev["shard"]:
            continue
        if cur["doc_id"] > prev["doc_id"]:
            ups += 1
        else:
            downs += 1
    frac_up = ups / (ups + downs)
    assert 0.4 < frac_up < 0.6, f"order still correlated: frac_up={frac_up}"


def test_shard_balance(spark):
    pdf = pd.DataFrame({"doc_id": range(4000), "text": ["x"] * 4000})
    sizes = [
        r["n"]
        for r in global_shuffle(spark.createDataFrame(pdf), N_SHARDS, SALT)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(sizes) == N_SHARDS
    mean = sum(sizes) / len(sizes)
    assert max(sizes) < 1.3 * mean and min(sizes) > 0.7 * mean


def test_salt_changes_permutation(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in global_shuffle(docs, N_SHARDS, "epoch-0").collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"]) for r in global_shuffle(docs, N_SHARDS, "epoch-1").collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > 0.9 * len(a)


def test_write_round_trip(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, N_SHARDS, SALT)
    back = spark.read.parquet(path)
    expect = global_shuffle(docs, N_SHARDS, SALT)
    assert sorted(
        map(tuple, back.select("doc_id", "shard", "pos").collect())
    ) == sorted(map(tuple, expect.select("doc_id", "shard", "pos").collect()))
    # every shard directory exists and holds exactly its own rows
    per_dir = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(per_dir) == set(range(N_SHARDS))


def test_n_shards_validation(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(ValueError, match="n_shards"):
        global_shuffle(docs, 0)


class TestCurriculumOrder:
    def test_matches_duckdb_oracle(self, spark, sf_dir, duck):
        from document_clustering_with_hadoop_mapreduce_spark.functions.text import (
            token_count,
        )
        from document_clustering_with_hadoop_mapreduce_spark.sources.export import (
            curriculum_order,
            curriculum_order_oracle_sql,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # difficulty proxy: token length, easy(short)-first
        scored = docs.withColumn("score", token_count(F.col("text")))
        got = curriculum_order(scored, "score", N_SHARDS, salt=SALT).select(
            "doc_id", "shard", "pos"
        )
        sql = curriculum_order_oracle_sql(
            "CASE WHEN trim(text) = '' OR text IS NULL THEN 0 "
            "ELSE len(string_split_regex(trim(text), '[ \t\n\r]+')) END",
            N_SHARDS,
            SALT,
        )
        assert_matches_oracle(got, duck, sql)

    def test_score_monotone_within_shard_and_shards_unbiased(self, spark, sf_dir):
        from document_clustering_with_hadoop_mapreduce_spark.functions.text import (
            token_count,
        )
        from document_clustering_with_hadoop_mapreduce_spark.sources.export import (
            curriculum_order,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        scored = docs.withColumn("score", token_count(F.col("text")))
        out = curriculum_order(scored, "score", N_SHARDS, salt=SALT)
        pdf = out.select("shard", "pos", "score").toPandas()
        for s, grp in pdf.groupby("shard"):
            seq = grp.sort_values("pos")["score"].tolist()
            assert seq == sorted(seq), f"shard {s} not score-ordered"
        # shard assignment ignores the score: per-shard mean score stays
        # near the global mean (randomized assignment, not score-blocked)
        global_mean = pdf["score"].mean()
        per_shard = pdf.groupby("shard")["score"].mean()
        assert (abs(per_shard - global_mean) < 0.5 * global_mean).all()

    def test_descending_reverses(self, spark, sf_dir):
        from document_clustering_with_hadoop_mapreduce_spark.sources.export import (
            curriculum_order,
        )

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(40)], "doc_id int, score double"
        )
        up = curriculum_order(df, "score", 2, ascending=True, salt=SALT)
        down = curriculum_order(df, "score", 2, ascending=False, salt=SALT)
        first_up = {
            r.doc_id for r in up.where(F.col("pos") == 0).collect()
        }
        first_down = {
            r.doc_id for r in down.where(F.col("pos") == 0).collect()
        }
        assert min(first_up) < min(first_down)
        for s in (up, down):
            assert s.count() == 40
