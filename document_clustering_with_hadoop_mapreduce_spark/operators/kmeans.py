"""K-Means clustering — the reference's core capability, Spark-first.

Reference parity (SURVEY.md §2.6 M1-M9):
- tasks 2.1/2.2/2.3 run hand-rolled MR Lloyd iterations with centroids
  shipped as config strings and re-read from HDFS each iteration
  (ref sources/2.2/source/KMeans.java:167-195). Here the scale path is
  ``pyspark.ml.clustering.KMeans`` (seeded, cached features, centroids
  broadcast internally; k-means|| init is M3's Bahmani et al. algorithm,
  built in). A DataFrame-native Lloyd loop is also provided for traced
  per-iteration artifacts (M9: losses, WCSS) and for oracle-checkable
  single-step semantics.

Scale notes: assignment is a broadcast nearest-neighbor "join" (ref J5) —
k×d floats to every executor, argmin via an array-of-struct min, no
shuffle. The only exchange per Lloyd iteration is the k-group mean
aggregate (map-side partial). Features are cached once.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def assign_nearest(
    df: DataFrame,
    centroids: list[list[float]],
    features_col: str = "embedding",
    round_decimals: int | None = 6,
) -> DataFrame:
    """M4/M5: nearest-centroid assignment as a pure column expression.

    Emits ``cluster`` (argmin of squared euclidean, smallest-id tie-break)
    and ``dist_sq``. Distances are optionally rounded before the argmin so
    the choice is reproducible across engines/partitionings (same
    round-before-rank discipline as the top-k operators).

    The centroids enter the plan as ONE k x d nested-array literal and the
    per-centroid distance is zip_with + aggregate (JVM higher-order
    functions, same left-to-right fold order as an unrolled sum, so results
    are bit-identical). The previously unrolled per-dimension expression
    took seconds of DRIVER time per call just to build (k*d py4j column
    ops) — measured 3.5-5.5 s/iteration at k=5, d=64, dominating the whole
    Lloyd loop; the literal form builds in ~10 ms and the executor-side
    work is the same one narrow pass either way.
    """
    vec = _as_double_array(F.col(features_col))
    cents = F.lit([[float(v) for v in c] for c in centroids])

    def dist(c: Column) -> Column:
        d = F.aggregate(
            F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.round(d, round_decimals) if round_decimals is not None else d

    best = F.array_min(
        F.transform(cents, lambda c, i: F.struct(dist(c).alias("d"), i.alias("cid")))
    )
    return df.withColumn("cluster", best["cid"]).withColumn("dist_sq", best["d"])


# The HOF assignment above is O(k*d) INTERPRETED work per row (~1 us per
# element) — the right shape for a handful of centroids, a scale-killer
# once k grows with the corpus (SemDeDup's k, k-means||'s candidate set).
# Callers switch to the Arrow twin below past this k.
ARROW_ASSIGN_MIN_K = 16


def assign_nearest_arrow(
    df: DataFrame,
    centroids: list[list[float]],
    features_col: str = "embedding",
    round_decimals: int | None = 6,
) -> DataFrame:
    """``assign_nearest`` semantics on a NumPy batch path: squared
    euclidean per centroid (vectorized one-centroid-at-a-time — no
    |v|^2+|c|^2-2vc expansion, whose cancellation error would differ from
    the fold for near-duplicate vectors), optional HALF_UP distance round,
    argmin with smallest-cid tie-break (NumPy argmin returns the first
    minimum). mapInPandas keeps it map-side (no shuffle, no join-back);
    the k x d centroid matrix ships once per task in the closure.

    Emits the SAME columns as ``assign_nearest`` (input + cluster +
    dist_sq) — but the input passes through Arrow, so callers must select
    Arrow-friendly columns first (no UDTs). Float-summation order differs
    from the JVM fold at ~1e-16, the accepted class (see the block matmul
    engines); pinned equal to ``assign_nearest`` on real fixture data in
    tests/test_semdedup.py.

    Magnitude contract (round 9, enforced): the HALF_UP emulation
    ``floor(d2*10^r + 0.5)`` is exact only while ``d2*10^r < 2^52`` —
    already at odd integers in [2^52, 2^53) the ``+ 0.5`` is not
    representable (ulp = 1) and rounds half-to-even UP, so the floor
    lands one past the true value and silently diverges from
    ``assign_nearest``'s decimal ``F.round`` (verified numerically at
    2^52 + 1). Fine for normalized embeddings (d2 <= 4); a
    large-magnitude feature space that crosses the bound RAISES with a
    pointer at ``round_decimals=None`` (exact, unrounded distances)
    rather than returning assignments under different tie-break
    semantics.
    """
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    cmat = [[float(v) for v in c] for c in centroids]
    # fresh StructType — df.schema is memoized on the DataFrame and
    # StructType.add mutates in place, so .add on it would poison the
    # input frame's own schema
    schema = StructType(
        list(df.schema.fields)
        + [StructField("cluster", IntegerType()), StructField("dist_sq", DoubleType())]
    )
    scale = None if round_decimals is None else float(10**round_decimals)

    def assign(batches):
        import numpy as np

        C = np.asarray(cmat, dtype=np.float64)
        for pdf in batches:
            pdf = pdf.reset_index(drop=True)
            if not len(pdf):
                continue
            m = np.asarray(pdf[features_col].tolist(), dtype=np.float64)
            d2 = np.empty((len(pdf), len(C)), dtype=np.float64)
            for ci in range(len(C)):
                diff = m - C[ci]
                d2[:, ci] = (diff * diff).sum(axis=1)
            if scale is not None:
                scaled = d2 * scale
                # max propagates NaN, so one comparison catches both a
                # corrupt (NaN/Inf) embedding and the magnitude bound —
                # NaN >= x is False, hence the explicit isnan arm
                mx = scaled.max(initial=0.0)
                if np.isnan(mx) or mx >= 2.0**52:  # see docstring
                    raise ValueError(
                        "assign_nearest_arrow: a squared distance is "
                        "non-finite (NaN/Inf embedding?) or exceeds "
                        f"2^52/10^{int(np.log10(scale))}, where the HALF_UP "
                        "emulation loses integer precision (the +0.5 rounds "
                        "half-to-even at ulp >= 1) and diverges from "
                        "assign_nearest's decimal F.round — clean the "
                        "vectors, pass round_decimals=None (exact "
                        "distances), or normalize the feature space."
                    )
                d2 = np.floor(scaled + 0.5) / scale  # HALF_UP, d2 >= 0
            cl = d2.argmin(axis=1)
            pdf["cluster"] = cl.astype("int32")
            pdf["dist_sq"] = d2[np.arange(len(pdf)), cl]
            yield pdf

    return df.mapInPandas(assign, schema)


def recompute_centroids(
    assigned: DataFrame,
    features_col: str = "embedding",
    round_decimals: int | None = None,
) -> DataFrame:
    """M6: element-wise mean per cluster via posexplode + group-avg.

    Two narrow shuffles on (cluster, dim) then (cluster) — no whole-group
    buffering (the reference's reducer held every member vector in RAM,
    ref sources/2.2/source/KMeansReducer.java:153-192).

    ``round_decimals`` rounds each mean coordinate in-plan (engine-side
    round, same semantics as the DuckDB oracle's) so iterated centroids
    stay bit-comparable across engines.
    """
    exploded = assigned.select(
        "cluster", F.posexplode(_as_double_array(F.col(features_col))).alias("dim", "x")
    )
    m = F.avg("x")
    if round_decimals is not None:
        m = F.round(m, round_decimals)
    means = exploded.groupBy("cluster", "dim").agg(m.alias("m"))
    return (
        means.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
        .select("cluster", F.transform("dm", lambda s: s["m"]).alias("centroid"))
    )


@dataclass
class LloydTrace:
    iteration: int
    wcss: float
    max_shift: float


def random_dense_init(k: int, dim: int, seed: int = 42) -> list[list[float]]:
    """M2 reference parity (sources/2.2/source/KMeans.java:146-155): a
    k x dim dense centroid matrix of uniform [0,1) draws, each rounded to
    3 decimals (the reference formats every draw through a default
    ``DecimalFormat``).

    The reference's ``new Random()`` is UNSEEDED — irreproducible by
    construction — so this engine substitutes a salted-md5 uniform draw:
    the matrix is a pure function of (seed, j, t), identical across runs,
    engines, and partitionings, and value-gated by a pure-python oracle
    (tests/test_kmeans.py). Driver footprint is k x dim floats — the same
    matrix the reference itself builds driver-side and ships via its
    Configuration string; for vocabulary-sized dims prefer
    ``seeded_sparse_centroids`` / ``scalable_kmeans_init``."""
    import hashlib

    two60 = float(1 << 60)
    return [
        [
            round(
                int(hashlib.md5(f"{seed}:{j}:{t}".encode()).hexdigest()[:15], 16) / two60,
                3,
            )
            for t in range(dim)
        ]
        for j in range(k)
    ]


def lloyd_kmeans(
    df: DataFrame,
    k: int,
    features_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 10,
    tol: float = 1e-5,
    init_centroids: list[list[float]] | None = None,
) -> tuple[DataFrame, list[list[float]], list[LloydTrace]]:
    """Traced Lloyd iterations (reference M7-M9 semantics, sane math).

    Deterministic init: the k rows with smallest ``id_col`` (the reference's
    unseeded ``Random`` init is irreproducible by design — SURVEY.md §5);
    pass ``init_centroids`` (e.g. ``random_dense_init`` for M2 parity) to
    override. Centroids live on the driver (k×d floats — same as MLlib) and
    enter the plan as literals, i.e. broadcast; the data never leaves the
    cluster.

    Returns (assignments, final_centroids, per-iteration trace).
    """
    feats = df.select(id_col, _as_double_array(F.col(features_col)).alias(features_col)).cache()
    if init_centroids is not None:
        centroids = [list(c) for c in init_centroids]
        if len(centroids) != k:
            raise ValueError(f"init_centroids has {len(centroids)} rows, expected k={k}")
        dims = {len(c) for c in centroids}
        if len(dims) != 1:
            raise ValueError(f"init_centroids rows have inconsistent dimensions: {sorted(dims)}")
        # cheap 1-row probe: a wrong-dim init (e.g. a stale random_dense_init)
        # would otherwise flow into the literal-array distance math and fail
        # late (or silently compute over mismatched lengths)
        first = feats.select(F.size(features_col).alias("d")).head()
        if first is not None and first["d"] != dims.pop():
            raise ValueError(
                f"init_centroids dimension {len(centroids[0])} != data "
                f"dimension {first['d']} in column {features_col!r}"
            )
    else:
        init_rows = feats.orderBy(id_col).limit(k).collect()
        centroids = [list(r[features_col]) for r in init_rows]

    trace: list[LloydTrace] = []
    for it in range(max_iter):
        assigned = assign_nearest(feats, centroids, features_col, round_decimals=None).cache()
        stats = assigned.agg(F.sum("dist_sq").alias("wcss")).collect()[0]
        new_rows = recompute_centroids(assigned, features_col).collect()
        assigned.unpersist()
        new_centroids = list(centroids)
        for r in new_rows:
            new_centroids[r["cluster"]] = list(r["centroid"])
        max_shift = max(
            max(abs(a - b) for a, b in zip(old, new)) if old != new else 0.0
            for old, new in zip(centroids, new_centroids)
        )
        trace.append(LloydTrace(it, float(stats["wcss"]), float(max_shift)))
        centroids = new_centroids
        if max_shift < tol:
            break
    # the in-loop assignment is always one centroid update stale (on the
    # tol exit too: a point within ~tol of a bisector can flip when judged
    # against the post-update centroids) — re-assign against the FINAL
    # centroids on EVERY exit path so the returned (assignments, centroids)
    # pair is self-consistent by construction.
    assigned = assign_nearest(feats, centroids, features_col, round_decimals=None)
    feats.unpersist()
    return assigned, centroids, trace


def lloyd_trace_deterministic(
    df: DataFrame,
    k: int,
    iters: int = 3,
    features_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, float]]:
    """Oracle-checkable Lloyd: deterministic init (k lowest ``id_col``),
    a FIXED iteration count, and the cross-engine float discipline —
    distances rounded to 6dp before the argmin, centroid means rounded to
    6dp in-plan, WCSS summed as decimal(28,6) (exact, order-independent).

    Every step is SQL-expressible, so the whole per-iteration WCSS trace
    is verified against an unrolled DuckDB CTE (plans/queries_cluster.py)
    — this is the hard value gate for the iterative path M6-M9 that the
    seeded MLlib fit (non-deterministic across engines) cannot provide.

    Returns [(iteration, wcss), ...]; empty clusters keep their previous
    centroid (same as ``lloyd_kmeans``).
    """
    feats = df.select(id_col, _as_double_array(F.col(features_col)).alias(features_col)).cache()
    init_rows = feats.orderBy(id_col).limit(k).collect()
    centroids = [list(r[features_col]) for r in init_rows]

    from decimal import ROUND_HALF_UP, Decimal

    trace: list[tuple[int, float]] = []
    for it in range(iters):
        assigned = assign_nearest(feats, centroids, features_col, round_decimals=6)
        if it == iters - 1:
            # final iteration: the recompute would be discarded — WCSS only
            agg = assigned.agg(
                F.round(
                    F.sum(F.col("dist_sq").cast("decimal(28,6)")).cast("double"), 6
                ).alias("wcss")
            ).collect()[0]
            trace.append((it, float(agg["wcss"])))
            break
        # ONE job per iteration: the posexplode aggregate yields both the
        # 6dp-rounded per-(cluster,dim) means AND a per-cluster decimal
        # WCSS partial (each row carries dist_sq exactly once, on dim 0)
        exploded = assigned.select(
            "cluster", "dist_sq",
            F.posexplode(_as_double_array(F.col(features_col))).alias("dim", "x"),
        )
        rows = (
            exploded.groupBy("cluster", "dim")
            .agg(
                F.round(F.avg("x"), 6).alias("m"),
                F.sum(
                    F.when(F.col("dim") == 0, F.col("dist_sq")).cast("decimal(28,6)")
                ).alias("w_part"),
            )
            .collect()
        )
        # decimal partials sum exactly; float() then HALF_UP-quantize on the
        # shortest repr replicates Spark's round(cast(sum AS DOUBLE), 6)
        # (BigDecimal.valueOf + setScale(6, HALF_UP)) bit-for-bit
        total = sum(r["w_part"] for r in rows if r["dim"] == 0)
        wcss = float(
            Decimal(repr(float(total))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )
        trace.append((it, wcss))
        new_centroids = [list(c) for c in centroids]
        dims: dict[int, list[tuple[int, float]]] = {}
        for r in rows:
            dims.setdefault(r["cluster"], []).append((r["dim"], r["m"]))
        for cluster, dm in dims.items():
            new_centroids[cluster] = [m for _, m in sorted(dm)]
        centroids = new_centroids
    feats.unpersist()
    return trace


def scalable_kmeans_init(
    df: DataFrame,
    k: int,
    l: float = 10.0,
    rounds: int = 5,
    features_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[tuple[int, list[float]]], dict[int, int]]:
    """M3/A15/M1: deterministic k-means|| init (Bahmani et al., VLDB'12).

    The reference hand-rolls this per reducer group with an UNSEEDED
    ``Random`` (ref sources/2.2/source/ScalableKMeans.java:86-156:
    oversample with p = l*d/psi per round, weight each candidate by its
    nearest-point count, keep the top-k by weight) — irreproducible by
    design. This version replaces the RNG with a HASH-BASED Bernoulli
    draw so the init is deterministic, partition-independent, and
    SQL-expressible (hence oracle-checkable, unlike a seeded MLlib fit):

        select x in round r  iff  u(x, r) < min(1, l * d(x) / psi)

    where u(x, r) is the top 60 bits of md5(``"<id>_<r>"``) read as a
    uniform draw in [0, 1). The comparison happens in HEX-STRING space —
    ``substr(md5, 1, 15) < lpad(hex(floor(p * 2^60)), 15, '0')`` — which
    equals the numeric comparison (fixed-width lowercase hex is
    order-isomorphic to the integers) and both engines produce identical
    md5/hex strings, so Spark and DuckDB select byte-identical candidate
    sets.

    Scale shape: candidates live on the driver (expected l per round +
    seed ≈ l*rounds k×d floats — same driver footprint as MLlib's own
    k-means||) and enter each pass as one nested-array literal; each
    round is ONE cached distance pass over the data (psi aggregate +
    filtered collect read the same cache), so the whole init is
    O(rounds) scans with no shuffle beyond the scalar aggregate.
    Distances use the engine-wide 6dp round-before-compare discipline.

    Returns (final_centroids, weights): ``final_centroids`` is the top-k
    as [(seed_id, vector), ...] ordered by seed_id (cluster i = i-th
    lowest surviving seed id), ``weights`` maps seed_id -> nearest-point
    count.
    """
    two60 = 1152921504606846976.0  # 2^60
    feats = df.select(
        F.col(id_col).alias("id"), _as_double_array(F.col(features_col)).alias("v")
    )
    # The init runs ~rounds+2 distance passes of per-row HOF math over the
    # CACHED frame: on an under-split local scan (the sf fixtures are one
    # row group) every pass serializes onto one core. Fan out once before
    # caching when the scan arrived with fewer splits than cores — the
    # shuffle is paid once, every pass reuses the layout (measured at
    # sf0.1/local[32], current fixture generation: 11.9 s -> 8.6 s warm;
    # an EARLIER generation measured fan-out as a loss for the
    # per-iteration-job shape, so this stays conditional and cache-scoped,
    # not a blanket force_fan_out). On a real cluster the input arrives
    # already split and this branch is a no-op.
    par = feats.sparkSession.sparkContext.defaultParallelism
    if feats.rdd.getNumPartitions() < par:
        feats = feats.repartition(par)
    feats = feats.cache()
    first = feats.orderBy("id").limit(1).collect()[0]
    cands: dict[int, list[float]] = {first["id"]: list(first["v"])}

    # the candidate set GROWS ~l per round (that is k-means||'s whole
    # point), so later distance passes pay O(|cands| * d) per row — the
    # interpreted HOF form past ARROW_ASSIGN_MIN_K candidates is exactly
    # the cost the round-8 similarity audit removed; same switch here
    def nearest(cents: list[list[float]]) -> DataFrame:
        if len(cents) > ARROW_ASSIGN_MIN_K:
            return assign_nearest_arrow(feats, cents, "v", round_decimals=6)
        return assign_nearest(feats, cents, "v", round_decimals=6)

    for r in range(rounds):
        ordered = sorted(cands)
        dists = nearest(
            [cands[i] for i in ordered]
        ).select("id", "v", "dist_sq").cache()
        psi_df = dists.agg(
            F.sum(F.col("dist_sq").cast("decimal(28,6)")).cast("double").alias("psi")
        )
        p = (F.lit(float(l)) * F.col("dist_sq")) / F.col("psi")
        draw = F.substring(
            F.md5(F.concat(F.col("id").cast("string"), F.lit(f"_{r}"))), 1, 15
        )
        # The hex threshold only exists for p < 1 (floor(p * 2^60) with
        # p > 8 overflows BIGINT, and ANSI mode would raise rather than
        # wrap) — the p >= 1 arm of the filter admits those rows anyway,
        # and NULL from the WHEN falls out of `draw < thresh` as NULL,
        # which OR(true, NULL) absorbs. d == 0 rows are existing
        # candidates and can never be drawn (threshold is all-zeros).
        thresh = F.when(
            p < 1.0,
            F.lower(F.lpad(F.hex(F.floor(p * F.lit(two60)).cast("long")), 15, "0")),
        )
        selected = (
            dists.crossJoin(F.broadcast(psi_df))
            .filter(
                (F.col("dist_sq") > 0)
                & (F.col("psi") > 0)
                & ((p >= 1.0) | (draw < thresh))
            )
            .select("id", "v")
            .collect()
        )
        dists.unpersist()
        for row in selected:
            cands[row["id"]] = list(row["v"])
    # weight = nearest-point count over ALL candidates (6dp-rounded dist,
    # lowest-candidate-id tie-break — assign_nearest's struct-min order)
    ordered = sorted(cands)
    assigned = nearest([cands[i] for i in ordered])
    wrows = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("w")).collect()
    feats.unpersist()
    weights = {ordered[row["cluster"]]: int(row["w"]) for row in wrows}
    top = sorted(((weights.get(i, 0), i) for i in ordered), key=lambda t: (-t[0], t[1]))[:k]
    chosen = sorted(i for _, i in top)
    return [(i, cands[i]) for i in chosen], {i: weights.get(i, 0) for i in chosen}


def mllib_kmeans(
    df: DataFrame,
    k: int,
    features_col: str = "embedding",
    distance: str = "euclidean",
    init_mode: str = "k-means||",
    seed: int = 42,
    max_iter: int = 20,
    tol: float = 1e-5,
):
    """M1-M7 scale path: pyspark.ml KMeans over an array column.

    ``distance='cosine'`` gives task 2.2/2.3 semantics with CORRECT cosine
    (the reference's N3 dot/(|a|+|b|) variant is in ``compat``);
    ``init_mode='k-means||'`` is M3 (same Bahmani et al. paper the
    reference hand-rolls at sources/2.2/source/ScalableKMeans.java).
    Returns (model, assignments DataFrame).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.withColumn("__features", array_to_vector(_as_double_array(F.col(features_col))))
    km = KMeans(
        k=k, seed=seed, maxIter=max_iter, tol=tol,
        featuresCol="__features", predictionCol="cluster",
        initMode=init_mode, distanceMeasure=distance,
    )
    model = km.fit(feats)
    out = model.transform(feats).drop("__features")
    return model, out
