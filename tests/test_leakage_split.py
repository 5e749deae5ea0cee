"""leakage_safe_split: no component straddles splits, singleton parity with
hash_split, end-to-end through the real dedup chain, fraction sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
    hash_split,
    leakage_safe_split,
)


def test_end_to_end_no_near_dup_straddles_splits(spark, sf_dir):
    """Plant near-dup clusters, run the REAL LSH -> components chain, and
    assert the leakage-safe split puts every cluster wholly in one split
    while the doc-level split (measurably) does not."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
        duplicate_components,
        jaccard_verify_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_hashes,
        shingles,
    )

    n_clusters = 120
    docs = spark.range(3 * n_clusters).select(
        F.col("id").alias("doc_id"),
        F.format_string(
            "pc%s qd%s re%s sf%s tg%s uh%s vi%s wj%s",
            *([F.col("id") % n_clusters] * 8),
        ).alias("text"),
    )
    sigs = minhash_signatures(shingle_hashes(docs, n=3))
    pairs = jaccard_verify_pairs(
        lsh_candidate_pairs(sigs), shingles(docs, n=3), min_jaccard=0.8
    ).select("doc_a", "doc_b")
    comps = duplicate_components(pairs, documents=docs)
    safe = leakage_safe_split(docs, comps, salt="lk")
    # every component maps to exactly one split
    straddlers = (
        safe.join(comps, "doc_id")
        .groupBy("component")
        .agg(F.count_distinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0
    # the naive doc-level split DOES straddle some planted cluster
    naive = hash_split(docs, salt="lk")
    naive_straddlers = (
        naive.join(comps, "doc_id")
        .groupBy("component")
        .agg(F.count_distinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert naive_straddlers > 0


def test_singletons_match_hash_split_exactly(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # empty component table: every doc is a singleton
    empty = spark.createDataFrame([], "doc_id long, component long")
    safe = {r.doc_id: (r.bucket, r.split) for r in leakage_safe_split(docs, empty, salt="s").collect()}
    base = {r.doc_id: (r.bucket, r.split) for r in hash_split(docs, salt="s").collect()}
    assert safe == base


def test_fractions_approximate_requested(spark):
    docs = spark.range(20000).select(F.col("id").alias("doc_id"))
    empty = spark.createDataFrame([], "doc_id long, component long")
    out = leakage_safe_split(docs, empty, train=0.8, valid=0.1)
    frac = {
        r.split: r.n / 20000
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert frac["train"] == pytest.approx(0.8, abs=0.02)
    assert frac["valid"] == pytest.approx(0.1, abs=0.01)
    assert frac["test"] == pytest.approx(0.1, abs=0.01)


def test_component_members_share_key_and_split(spark):
    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    comps = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (5, 5), (6, 5)], "doc_id long, component long"
    )
    out = {r.doc_id: (r.split_key, r.split) for r in leakage_safe_split(docs, comps).collect()}
    assert out[0] == out[1] == out[2]
    assert out[5] == out[6]
    assert out[3][0] == 3 and out[9][0] == 9  # singletons keyed by self


def test_threshold_rounding_no_float_truncation(spark):
    """Regression: train=0.7, valid=0.1 must cut at buckets 7000/8000 —
    int((0.7+0.1)*10000) truncates to 7999 (float 0.7999999...), silently
    moving one 1/10000 bucket from valid to test. Doc ids below are
    precomputed to land exactly on the boundary buckets of the default
    salt (md5('split-v1:<id>') % 10000)."""
    boundary = {3373: 8000, 5345: 7999, 7637: 7000, 16102: 6999}
    docs = spark.createDataFrame([(i,) for i in boundary], "doc_id long")
    for fn in (
        lambda d: hash_split(d, train=0.7, valid=0.1),
        lambda d: leakage_safe_split(
            d, spark.createDataFrame([], "doc_id long, component long"),
            train=0.7, valid=0.1,
        ),
    ):
        got = {r.doc_id: (r.bucket, r.split) for r in fn(docs).collect()}
        assert got[16102] == (6999, "train")
        assert got[7637] == (7000, "valid")
        assert got[5345] == (7999, "valid")  # the truncation casualty
        assert got[3373] == (8000, "test")
