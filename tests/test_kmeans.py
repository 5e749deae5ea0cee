"""Clustering invariants (SURVEY.md §5 item 4) — randomness-proof checks
the reference never had: nearest-assignment consistency, WCSS monotonicity,
seeded reproducibility, label agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.kmeans import (
    assign_nearest,
    lloyd_kmeans,
    mllib_kmeans,
    recompute_centroids,
)
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table


def test_assign_nearest_is_argmin(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    init = emb.filter(F.col("vec_id") < 3).orderBy("vec_id").collect()
    centroids = [[float(x) for x in r["embedding"]] for r in init]
    out = assign_nearest(emb, centroids, "embedding", round_decimals=None)
    # recompute distances to every centroid; assigned must be the min
    rows = out.collect()
    for r in rows[:50]:
        v = [float(x) for x in r["embedding"]]
        dists = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in centroids]
        assert r["cluster"] == dists.index(min(dists))
        assert abs(r["dist_sq"] - min(dists)) < 1e-9


def test_lloyd_wcss_non_increasing(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    _, _, trace = lloyd_kmeans(emb, k=4, max_iter=6)
    wcss = [t.wcss for t in trace]
    assert len(wcss) >= 2
    for a, b in zip(wcss, wcss[1:]):
        assert b <= a + 1e-6, f"WCSS increased: {wcss}"


def test_lloyd_centroids_are_cluster_means(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids, _ = lloyd_kmeans(emb, k=3, max_iter=3)
    means = {r["cluster"]: list(r["centroid"]) for r in recompute_centroids(assigned).collect()}
    for cid, c in means.items():
        assert all(abs(a - b) < 1e-9 for a, b in zip(c, centroids[cid]))


def test_mllib_kmeans_seeded_reproducible(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    _, a1 = mllib_kmeans(emb, k=5, seed=42)
    _, a2 = mllib_kmeans(emb, k=5, seed=42)
    d1 = {r["vec_id"]: r["cluster"] for r in a1.select("vec_id", "cluster").collect()}
    d2 = {r["vec_id"]: r["cluster"] for r in a2.select("vec_id", "cluster").collect()}
    assert d1 == d2
    assert len(set(d1.values())) == 5


def test_mllib_assignment_is_nearest_final_centroid(spark, sf_dir):
    """After Lloyd converges, every point sits in the cluster of its nearest
    final center (SURVEY.md §5 item 4 — the invariant the reference's
    unseeded runs could never assert). NOTE: the synthetic embeddings are
    near-isotropic noise (labels don't correspond to geometric clusters),
    so label-recovery is NOT a valid check here; geometry invariants are."""
    emb = load_table(spark, sf_dir, "embeddings")
    model, assigned = mllib_kmeans(emb, k=5, seed=42, max_iter=50)
    centers = [list(map(float, c)) for c in model.clusterCenters()]
    for r in assigned.select("embedding", "cluster").collect()[:100]:
        v = [float(x) for x in r["embedding"]]
        dists = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in centers]
        assert r["cluster"] == dists.index(min(dists))
