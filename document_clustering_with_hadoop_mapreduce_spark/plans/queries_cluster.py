"""Clustering query surface (reference tasks 2.1-2.3, Spark-first).

``kmeans_assign_seeded`` is the oracle-checked single Lloyd step
(ref sources/2.2/source/KMeansMapper.java:77-105); ``kmeans_lloyd_trace``
extends that to the ITERATED loop — deterministic init, fixed 3
iterations, 6dp-rounded centroids/distances and decimal WCSS sums —
so DuckDB verifies the per-iteration WCSS trace (M6-M9) value-for-value
via an unrolled CTE. Between them the full Lloyd algebra (assignment,
centroid recompute, loss accounting) is hash-gated, not just rows-only.

Only the genuinely non-deterministic-across-engines path remains
rows-only: ``kmeans_mllib_sizes`` (seeded MLlib k-means|| fits, euclidean
+ cosine in one query); its invariants are pytest-enforced
(tests/test_kmeans.py): WCSS non-increasing, assignment = nearest
centroid, k clusters, seeded reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.kmeans import assign_nearest, lloyd_trace_deterministic, mllib_kmeans
from ..sources.tables import load_table
from .registry import register

K = 5
LLOYD_ITERS = 3

_ASSIGN_ORACLE = f"""
WITH c AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding::DOUBLE[] AS cvec
  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {K})
),
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
    # k LOWEST ids (not `id < k`): same init semantics as the oracle and
    # lloyd_trace_deterministic even when the id space is non-contiguous
    init = emb.orderBy("vec_id").limit(K).collect()
    centroids = [[float(x) for x in r["embedding"]] for r in init]
    out = assign_nearest(emb, centroids, "embedding", round_decimals=6)
    return out.select("vec_id", "cluster", "dist_sq")


def _lloyd_trace_oracle(k: int, iters: int) -> str:
    """Unrolled Lloyd in DuckDB SQL: per-(vec,dim) long form, each
    iteration = assign (argmin of 6dp-rounded dist) -> decimal WCSS ->
    6dp-rounded per-dim means. Seeds via ORDER BY vec_id LIMIT k with
    row_number-derived cluster ids (the engine's exact init semantics —
    no contiguous-id assumption), and a cluster that empties at iteration
    i keeps its iteration-i centroid (c{i+1} chains from c{i}, NOT from
    c0) — the exact float discipline and empty-cluster rule of
    operators.kmeans.lloyd_trace_deterministic."""
    ctes = [
        """e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim, unnest(embedding)::DOUBLE AS x
  FROM embeddings
)""",
        f"""seed AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cluster
  FROM (SELECT DISTINCT vec_id FROM e) ORDER BY vec_id LIMIT {k}
)""",
        "c0 AS (SELECT s.cluster, e.dim, e.x AS m FROM e JOIN seed s USING (vec_id))",
    ]
    wcss_parts = []
    for i in range(iters):
        c, a, m, nc = f"c{i}", f"a{i}", f"m{i}", f"c{i + 1}"
        ctes.append(f"""{a} AS (
  SELECT vec_id, cluster, dist_sq,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist_sq ASC, cluster ASC) AS rn
  FROM (
    SELECT e.vec_id, {c}.cluster,
           round(sum((e.x - {c}.m) * (e.x - {c}.m)), 6) AS dist_sq
    FROM e JOIN {c} USING (dim) GROUP BY e.vec_id, {c}.cluster
  )
)""")
        wcss_parts.append(
            f"SELECT {i} AS iteration, "
            f"round(CAST(sum(CAST(dist_sq AS DECIMAL(28,6))) AS DOUBLE), 6) AS wcss "
            f"FROM {a} WHERE rn = 1"
        )
        if i < iters - 1:
            ctes.append(f"""{m} AS (
  SELECT a.cluster, e.dim, round(avg(e.x), 6) AS m
  FROM e JOIN (SELECT vec_id, cluster FROM {a} WHERE rn = 1) a USING (vec_id)
  GROUP BY a.cluster, e.dim
)""")
            ctes.append(f"""{nc} AS (
  SELECT {c}.cluster, {c}.dim, coalesce({m}.m, {c}.m) AS m
  FROM {c} LEFT JOIN {m} USING (cluster, dim)
)""")
    union = " UNION ALL ".join(wcss_parts)
    return "WITH " + ",\n".join(ctes) + f"\nSELECT iteration, wcss FROM ({union}) ORDER BY iteration"


@register(
    "kmeans_lloyd_trace",
    _lloyd_trace_oracle(K, LLOYD_ITERS),
    "M6-M9 VALUE-GATED: deterministic Lloyd (init = lowest vec_ids, fixed "
    "3 iterations, 6dp centroid/distance rounding, decimal WCSS) -> "
    "per-iteration WCSS trace, hash-verified against an unrolled DuckDB "
    "CTE (the reference's .losses artifact, ref KMeansReducer.java:108-128)",
    tags=("cluster", "task2.2", "bench"),
)
def q_kmeans_lloyd_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    trace = lloyd_trace_deterministic(emb, k=K, iters=LLOYD_ITERS)
    return spark.createDataFrame(trace, "iteration INT, wcss DOUBLE").orderBy("iteration")


@register(
    "kmeans_mllib_sizes",
    None,  # iterative seeded MLlib fits — rows-only; invariants in tests/test_kmeans.py
    "M1-M7 + M3/A15/O4 scale path: seeded MLlib KMeans fits (k-means|| "
    "init; euclidean AND correct-cosine — the reference's N3 'cosine' is "
    "the compat shim, ref sources/2.2/source/ScalableKMeans.java) -> "
    "cluster sizes per distance measure",
    tags=("cluster", "task2.3"),
)
def q_kmeans_mllib_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = []
    for distance in ("euclidean", "cosine"):
        _, assigned = mllib_kmeans(emb, k=K, seed=42, distance=distance)
        out.append(
            assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(distance).alias("distance"), "cluster", "n")
        )
    return out[0].unionAll(out[1]).orderBy("distance", "cluster")
