"""Sparse doc-clustering invariants + the A11 pivot (term-aligned vectors)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.doc_cluster import (
    pivot_to_sparse_vectors,
    seeded_sparse_centroids,
    sparse_assign,
)
from document_clustering_with_hadoop_mapreduce_spark.operators.term_matrix import term_doc_counts
from document_clustering_with_hadoop_mapreduce_spark.operators.tfidf import tfidf
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table


def _matrix(spark, sf_dir):
    return tfidf(term_doc_counts(load_table(spark, sf_dir, "documents")))


def test_seed_docs_assigned_to_own_cluster(spark, sf_dir):
    """A seed doc's distance to its own centroid is exactly 0."""
    m = _matrix(spark, sf_dir)
    cents = seeded_sparse_centroids(m, 5)
    assigned = sparse_assign(m, cents)
    seeds = [r["doc_id"] for r in m.select("doc_id").distinct().orderBy("doc_id").limit(5).collect()]
    got = {r["doc_id"]: (r["cluster"], r["dist_sq"])
           for r in assigned.filter(F.col("doc_id").isin(seeds)).collect()}
    for rank, doc in enumerate(sorted(seeds)):
        assert got[doc] == (rank, 0.0)


def test_every_doc_assigned_once(spark, sf_dir):
    m = _matrix(spark, sf_dir)
    assigned = sparse_assign(m, seeded_sparse_centroids(m, 5))
    n_docs = m.select("doc_id").distinct().count()
    assert assigned.count() == n_docs
    assert assigned.select("doc_id").distinct().count() == n_docs
    assert assigned.filter(F.col("dist_sq") < 0).count() == 0


def test_pivot_vectors_term_aligned(spark, sf_dir):
    """A11 + N5 fix: vector slots are term-dictionary positions, so two docs
    sharing a term share the index; norms match the matrix."""
    m = _matrix(spark, sf_dir).filter(F.col("doc_id") < 100)
    vecs = pivot_to_sparse_vectors(m)
    row = vecs.first()
    dim = row["features"].size
    vocab = m.select("term").distinct().count()
    assert dim == vocab
    # per-doc nnz in the vector == rows in the matrix
    nnz = {r["doc_id"]: r["n"] for r in m.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in vecs.limit(20).collect():
        assert len(r["features"].indices) == nnz[r["doc_id"]]


@pytest.mark.slow
def test_sparse_lloyd_wcss_non_increasing(spark, sf_dir):
    """Full sparse Lloyd: WCSS monotone, k clusters, sparse centroids."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.doc_cluster import sparse_lloyd

    m = _matrix(spark, sf_dir)
    assigned, cents, trace = sparse_lloyd(m, k=4, max_iter=3)
    assert len(trace) == 3
    for a, b in zip(trace, trace[1:]):
        assert b <= a + 1e-6, f"WCSS increased: {trace}"
    assert assigned.select("cluster").distinct().count() <= 4
    # centroids stay sparse: nnz bounded by union of member terms
    vocab = m.select("term").distinct().count()
    per_cluster_nnz = cents.groupBy("cluster").count().collect()
    assert all(r["count"] <= vocab for r in per_cluster_nnz)


@pytest.mark.slow
def test_sparse_lloyd_centroid_truncation_caps_broadcast(spark, sf_dir):
    """centroid_top_t (the spherical-k-means sparse-projection scale path)
    caps every centroid's support at T terms — the k x V densification an
    exact mean produces never reaches the next broadcast."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.doc_cluster import sparse_lloyd

    m = _matrix(spark, sf_dir)
    assigned, cents, trace = sparse_lloyd(m, k=4, max_iter=3, centroid_top_t=5)
    assert len(trace) == 3
    per_cluster_nnz = cents.groupBy("cluster").count().collect()
    assert all(r["count"] <= 5 for r in per_cluster_nnz)
    n_docs = m.select("doc_id").distinct().count()
    assert assigned.count() == n_docs


def test_pandas_udf_matches_jvm_normalize(spark, sf_dir):
    """The Arrow pandas-UDF escape hatch computes exactly what the JVM
    higher-order-function path computes (so the slow path can never
    silently drift from the fast one)."""
    from document_clustering_with_hadoop_mapreduce_spark.functions.vector import (
        l2_normalize,
        l2_normalize_pandas_udf,
    )
    from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(100).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    udf = l2_normalize_pandas_udf()
    both = emb.select(
        "vec_id", l2_normalize(F.col("v")).alias("jvm"), udf("v").alias("py")
    ).collect()
    for r in both:
        assert len(r["jvm"]) == len(r["py"])
        for a, b in zip(r["jvm"], r["py"]):
            assert abs(a - b) < 1e-12
