"""Similarity-search value tests: LSH bucket ids vs a pure-python
reproduction, and the block-partitioned exact top-pairs vs the O(n^2)
nested-loop baseline (bit-identical contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.similarity import (
    block_topk_pairs,
    lsh_buckets,
    random_hyperplanes,
    top_similar_pairs,
)
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table

DIM = 64
PLANES = random_hyperplanes(8, DIM, seed=7)


def test_lsh_buckets_match_pure_python(spark, sf_dir):
    """Bucket id = packed sign bits of hyperplane dots, reproduced exactly
    in python (same plane constants, same left-to-right summation)."""
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    got = {r["vec_id"]: r["bucket"] for r in lsh_buckets(emb, PLANES).collect()}
    rows = emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")).collect()
    for r in rows:
        v = list(r["v"])
        want = 0
        for p, plane in enumerate(PLANES):
            dot = 0.0
            for x, y in zip(v, plane):
                dot += x * y
            if dot > 0:
                want |= 1 << p
        assert got[r["vec_id"]] == want
    assert len(got) == len(rows)


def test_block_topk_pairs_equals_bruteforce(spark, sf_dir):
    """The block-partitioned exact top-k pair search returns exactly the
    nested-loop baseline's rows (values AND order), for several block
    counts including B > distinct blocks touched."""
    emb = load_table(spark, sf_dir, "embeddings")
    want = [tuple(r) for r in top_similar_pairs(emb, k=25).collect()]
    for n_blocks in (1, 4, 8):
        got = [tuple(r) for r in block_topk_pairs(emb, k=25, n_blocks=n_blocks).collect()]
        assert got == want, f"n_blocks={n_blocks}"


def test_block_topk_pairs_plan_has_no_nested_loop(spark, sf_dir):
    """The registered embedding_top_pairs path must never plan a
    BroadcastNestedLoopJoin or cartesian product — pairs materialize only
    inside the equi-join on the block-task key."""
    emb = load_table(spark, sf_dir, "embeddings")
    plan = block_topk_pairs(emb, k=20, n_blocks=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
