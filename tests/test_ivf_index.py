"""IVF index-as-layout: building the index writes the corpus bucketed by
coarse cell, so probe joins are co-located. Gates: (1) the indexed probe
returns row-for-row what the in-memory ivf_topk returns, (2) with a
non-broadcast probe set the sort-merge join exchanges ONLY the probe side
— the corpus reads its buckets in place."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.similarity import (
    build_ivf_index,
    ivf_probe_indexed,
    ivf_topk,
)
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table

N_CELLS = 8
NPROBE = 2
K = 3


@pytest.fixture(scope="module")
def ivf_table(spark, sf_dir, tmp_path_factory):
    emb = load_table(spark, sf_dir, "embeddings")
    # same coarse quantizer as ivf_topk: the n_cells lowest-id vectors
    rows = emb.orderBy("vec_id").limit(N_CELLS).collect()
    cents = [[float(x) for x in r["embedding"]] for r in rows]
    path = tmp_path_factory.mktemp("ivf") / "emb_ivf"
    build_ivf_index(emb, cents, "emb_ivf", str(path), n_buckets=8)
    yield "emb_ivf", cents, emb
    spark.sql("DROP TABLE IF EXISTS emb_ivf")


def test_indexed_probe_equals_in_memory_ivf(spark, ivf_table):
    table, cents, emb = ivf_table
    queries = emb.filter(F.col("vec_id") < 5)
    want = sorted(tuple(r) for r in ivf_topk(emb, queries, N_CELLS, NPROBE, K).collect())
    got = sorted(
        tuple(r)
        for r in ivf_probe_indexed(spark, table, queries, cents, NPROBE, K).collect()
    )
    assert got == want and len(got) > 0


def test_indexed_probe_nonbroadcast_equals_too(spark, ivf_table):
    table, cents, emb = ivf_table
    queries = emb.filter(F.col("vec_id") < 5)
    want = sorted(tuple(r) for r in ivf_topk(emb, queries, N_CELLS, NPROBE, K).collect())
    got = sorted(
        tuple(r)
        for r in ivf_probe_indexed(
            spark, table, queries, cents, NPROBE, K, broadcast_probes=False
        ).collect()
    )
    assert got == want


def test_corpus_side_reads_buckets_in_place(spark, ivf_table):
    """Non-broadcast probe join: the ONLY exchange below the join feeds the
    probe side; the bucketed corpus scan joins with zero exchange (the
    build-time shuffle is amortized over every probe)."""
    table, cents, emb = ivf_table
    queries = emb.filter(F.col("vec_id") < 5)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        scored = ivf_probe_indexed(
            spark, table, queries, cents, NPROBE, K, broadcast_probes=False
        )
        plan = scored._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    join = plan[plan.index("SortMergeJoin"):]
    # the corpus branch appears as a bucketed file scan with no Exchange
    # between it and the join; count exchanges under the join: the window's
    # exchange sits ABOVE, so below the join there must be exactly one
    assert "SortMergeJoin" in plan
    n_exchanges_below = join.count("Exchange hashpartitioning(cell")
    assert n_exchanges_below == 1, plan
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan
