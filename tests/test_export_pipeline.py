"""build_training_export: the shuffle+pack capstone round-trips and is
deterministic."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.pipelines import build_training_export


@pytest.mark.slow
def test_export_round_trip_and_determinism(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n = docs.count()
    out1, out2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    s1 = build_training_export(docs, out1, n_shards=8, max_tokens=512)
    s2 = build_training_export(docs, out2, n_shards=8, max_tokens=512)
    assert s1 == s2
    assert s1["n_docs"] == n and s1["n_shards"] == 8

    a = spark.read.parquet(f"{out1}/shards").select("doc_id", "shard", "pos")
    b = spark.read.parquet(f"{out2}/shards").select("doc_id", "shard", "pos")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # every doc exactly once, manifest covers the same set
    assert a.select("doc_id").distinct().count() == n
    m = spark.read.parquet(f"{out1}/manifest")
    assert m.count() == n
    # packing conservation: per-stream token mass equals sum of members
    chk = m.groupBy("stream").agg(
        (F.max(F.col("global_start") + F.col("n_tokens"))).alias("end"),
        F.sum("n_tokens").alias("mass"),
    )
    assert chk.filter(F.col("end") != F.col("mass")).count() == 0
