"""Clustering query surface (reference tasks 2.1-2.3, Spark-first).

``kmeans_assign_seeded`` is the oracle-checked core: deterministic
centroids (the k lowest vec_ids), one nearest-centroid assignment pass —
exactly the per-iteration step of Lloyd (ref sources/2.2/source/
KMeansMapper.java:77-105), SQL-expressible so DuckDB can verify it.

The full iterative fits (MLlib k-means|| / traced Lloyd) are genuinely
non-SQL-expressible — registered without oracles (driver records the
weaker rows-only check); their invariants are pytest-enforced
(tests/test_kmeans.py): WCSS non-increasing, assignment = nearest centroid,
k clusters, seeded reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.kmeans import assign_nearest, lloyd_kmeans, mllib_kmeans
from ..sources.tables import load_table
from .registry import register

K = 5

_ASSIGN_ORACLE = f"""
WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec FROM embeddings WHERE vec_id < {K}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS evec FROM embeddings),
d AS (
  SELECT e.vec_id, c.cid,
         round(list_sum(list_transform(generate_series(1, len(e.evec)),
               i -> (e.evec[i]-c.cvec[i])*(e.evec[i]-c.cvec[i]))), 6) AS dist_sq
  FROM e CROSS JOIN c
),
r AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist_sq ASC, cid ASC) AS rn FROM d)
SELECT vec_id, cid::INT AS cluster, dist_sq FROM r WHERE rn = 1
"""


@register(
    "kmeans_assign_seeded",
    _ASSIGN_ORACLE,
    "M4/J5: one nearest-centroid pass (euclidean, deterministic init = "
    "lowest vec_ids) — the oracle-checkable Lloyd step "
    "(ref sources/2.2/source/KMeansMapper.java:77-105)",
    tags=("cluster", "task2.1", "task2.2"),
)
def q_kmeans_assign_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    init = emb.filter(F.col("vec_id") < K).orderBy("vec_id").collect()
    centroids = [[float(x) for x in r["embedding"]] for r in init]
    out = assign_nearest(emb, centroids, "embedding", round_decimals=6)
    return out.select("vec_id", "cluster", "dist_sq")


@register(
    "kmeans_cluster_sizes",
    None,  # iterative MLlib fit — rows-only; invariants in tests/test_kmeans.py
    "M1-M7: full seeded MLlib KMeans (k-means|| init, k=5) -> cluster sizes",
    tags=("cluster", "task2.3", "bench"),
)
def q_kmeans_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    _, assigned = mllib_kmeans(emb, k=K, seed=42)
    return (
        assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cluster")
    )


@register(
    "kmeans_lloyd_trace",
    None,  # iterative — rows-only; WCSS monotonicity asserted in tests
    "M7-M9: traced DataFrame-native Lloyd (per-iteration WCSS + max centroid "
    "shift — the reference's .losses artifact, ref KMeansReducer.java:108-128)",
    tags=("cluster", "task2.2"),
)
def q_kmeans_lloyd_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    _, _, trace = lloyd_kmeans(emb, k=K, max_iter=5)
    return spark.createDataFrame(
        [(t.iteration, round(t.wcss, 4), round(t.max_shift, 8)) for t in trace],
        "iteration INT, wcss DOUBLE, max_shift DOUBLE",
    )


@register(
    "kmeans_cosine_sizes",
    None,  # iterative MLlib fit — rows-only; N3-vs-true-cosine in pytest
    "task 2.3: seeded MLlib KMeans with CORRECT cosine distance + "
    "k-means|| init (the Bahmani et al. algorithm the reference hand-rolls "
    "at sources/2.2/source/ScalableKMeans.java; its N3 'cosine' is the "
    "compat shim) -> cluster sizes",
    tags=("cluster", "task2.3"),
)
def q_kmeans_cosine_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    _, assigned = mllib_kmeans(
        emb, k=K, seed=42, distance="cosine", init_mode="k-means||"
    )
    return (
        assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cluster")
    )
