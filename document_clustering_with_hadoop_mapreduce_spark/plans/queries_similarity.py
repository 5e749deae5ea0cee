"""Similarity-search query surface: exact KNN, LSH buckets, LSH ANN,
embedding near-dup pairs. Hyperplane constants are seeded and shared with
the generated oracle SQL (bit-identical bucket assignment)."""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    block_topk_pairs,
    semdedup,
    cosine_topk,
    lsh_bucketed_topk,
    random_hyperplanes,
)
from ..sources.tables import load_table
from .registry import register

N_QUERIES = 5
DIM = 64
PLANES = random_hyperplanes(8, DIM, seed=7)

# cosine over DOUBLE[] columns, index-order sums (mirrors functions.vector,
# including the zero-norm -> 0.0 guard)
def _cos_sql(a: str, b: str) -> str:
    nprod = (
        f"(sqrt(list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i]*{a}[i])))"
        f" * sqrt(list_sum(list_transform(generate_series(1, len({b})), i -> {b}[i]*{b}[i]))))"
    )
    dot = f"list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i]*{b}[i]))"
    return f"(CASE WHEN {nprod} = 0 THEN 0.0 ELSE {dot} / {nprod} END)"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


@register(
    "knn_bruteforce",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
    scored AS (
      SELECT query_id, vec_id, round({_cos_sql('ev', 'qv')}, 6) AS cos
      FROM e CROSS JOIN q WHERE vec_id <> query_id
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)::INT AS rank FROM scored)
    SELECT query_id, vec_id, cos, rank FROM r WHERE rank <= 5""",
    "exact cosine top-5 neighbors for each of the first 5 query vectors "
    "(broadcast queries, one scan, window top-k)",
    tags=("similarity", "bench"),
)
def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one-pass distance math per row: fan the single-row-group scan out so
    # the cosine CPU parallelizes (measured -40% at sf0.1)
    emb = load_table(spark, sf_dir, "embeddings", force_fan_out=True)
    return cosine_topk(emb, emb.filter(F.col("vec_id") < N_QUERIES), k=5)


def _planes_values_sql() -> str:
    rows = ", ".join(
        f"({p}, {list(plane)}::DOUBLE[])" for p, plane in enumerate(PLANES)
    )
    return f"(VALUES {rows}) AS planes(p, pl)"


# NOTE: lsh_buckets (bucket id per vector) is a strict sub-plan of
# ann_lsh_topk below; tests/test_similarity.py value-tests it directly
# (bucket ids vs a pure-python reproduction) rather than it holding its
# own registry slot (the driver gate records at most 50 queries — every
# slot must be a distinct capability).


@register(
    "ann_lsh_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    dots AS (
      SELECT vec_id, p,
             list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * pl[i])) AS d
      FROM e CROSS JOIN {_planes_values_sql()}
    ),
    b AS (
      SELECT vec_id, CAST(sum(CASE WHEN d > 0 THEN (1 << p) ELSE 0 END) AS BIGINT) AS bucket
      FROM dots GROUP BY vec_id
    ),
    eb AS (SELECT e.vec_id, v, bucket FROM e JOIN b USING (vec_id)),
    scored AS (
      SELECT l.vec_id AS query_id, r.vec_id AS vec_id,
             round({_cos_sql('l.v', 'r.v')}, 6) AS cos
      FROM eb l JOIN eb r ON l.bucket = r.bucket AND l.vec_id <> r.vec_id
    ),
    rk AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)::INT AS rank FROM scored)
    SELECT query_id, vec_id, cos, rank FROM rk WHERE rank <= 3""",
    "ANN top-3 within LSH bucket (sub-block pair tasks per bucket — "
    "candidate volume bounded by bucket sizes, never O(n^2); since round "
    "10 the sub-block count auto-sizes PER BUCKET from sampled occupancy, "
    "so hot buckets spread to ~target_bucket_rows-per-side tasks and cold "
    "buckets pay zero replication, with no caller-side skew knowledge)",
    tags=("similarity",),
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_bucketed_topk(_emb(spark, sf_dir), PLANES, k=3)


def _sqd_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> ({a}[i]-{b}[i])*({a}[i]-{b}[i])))"
    )


# SemDeDup half of the fused embedding_top_pairs slot: seeded gaussian
# centroids (data-independent literals shared with the oracle), within-
# cluster pair threshold picked at the ~99.9th pct of this corpus's
# pairwise-cosine distribution so the verified set is non-trivial but
# bounded at every SF.
SD_K = 8
SD_THRESH = 0.35

# Hard-negative slice knobs (round 11): anchors = the HN_ANCHORS lowest
# ids; each anchor's declared positive is its exact top-1 cosine neighbor
# (so the anti join provably bites — the hardest candidate IS a positive
# and must be excluded); over-fetch HN_SEARCH_K, keep HN_NEG hardest.
HN_ANCHORS = 8
HN_SEARCH_K = 10
HN_NEG = 3


def _sd_centroids() -> list[list[float]]:
    rng = random.Random(21)
    return [
        [round(rng.gauss(0.0, 1.0), 6) for _ in range(DIM)] for _ in range(SD_K)
    ]


def _semdedup_fused_oracle() -> str:
    cent_rows = ", ".join(
        f"({cid}, {c}::DOUBLE[])" for cid, c in enumerate(_sd_centroids())
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    top AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round({_cos_sql('a.v', 'b.v')}, 6) AS cos
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      ORDER BY cos DESC, vec_a ASC, vec_b ASC LIMIT 20
    ),
    cents(cid, c) AS (VALUES {cent_rows}),
    d AS (
      SELECT vec_id, v, cid,
             round({_sqd_sql('v', 'c')}, 6) AS dist
      FROM e CROSS JOIN cents
    ),
    a AS (
      SELECT vec_id, v, cid AS cluster,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
      FROM d
    ),
    base AS (
      SELECT vec_id, v, cluster, round({_cos_sql('v', 'c')}, 6) AS centroid_cos
      FROM a JOIN cents ON cluster = cid WHERE rn = 1
    ),
    sd_pairs AS (
      SELECT l.cluster, l.vec_id AS vec_a, r.vec_id AS vec_b,
             round({_cos_sql('l.v', 'r.v')}, 6) AS cos,
             l.centroid_cos AS cos_a, r.centroid_cos AS cos_b
      FROM base l JOIN base r ON l.cluster = r.cluster AND l.vec_id < r.vec_id
    ),
    hits AS (SELECT * FROM sd_pairs WHERE cos >= {SD_THRESH}),
    dropped AS (
      SELECT DISTINCT CASE WHEN cos_b >= cos_a THEN vec_b ELSE vec_a END AS vec_id
      FROM hits
    ),
    hn_scored AS (
      SELECT a.vec_id AS anchor_id, b.vec_id AS cand_id,
             round({_cos_sql('a.v', 'b.v')}, 6) AS cos
      FROM e a JOIN e b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {HN_ANCHORS}
    ),
    hn_ranked AS (
      SELECT *, row_number() OVER (PARTITION BY anchor_id ORDER BY cos DESC, cand_id ASC) AS rn
      FROM hn_scored
    ),
    hn_pos AS (SELECT anchor_id, cand_id AS positive_id FROM hn_ranked WHERE rn = 1),
    hn AS (
      SELECT anchor_id, cand_id, cos,
             row_number() OVER (PARTITION BY anchor_id ORDER BY cos DESC, cand_id ASC) AS neg_rank
      FROM hn_ranked t
      WHERE rn <= {HN_SEARCH_K}
        AND NOT EXISTS (SELECT 1 FROM hn_pos p
                        WHERE p.anchor_id = t.anchor_id AND p.positive_id = t.cand_id)
    )
    SELECT 'top' AS kind, vec_a AS id_a, vec_b AS id_b, cos AS value FROM top
    UNION ALL
    SELECT 'sd_pair' AS kind, vec_a, vec_b, cos FROM hits
    UNION ALL
    SELECT 'sd_drop' AS kind, b.vec_id, b.cluster::BIGINT, b.centroid_cos
    FROM base b JOIN dropped d ON b.vec_id = d.vec_id
    UNION ALL
    SELECT 'hardneg' AS kind, anchor_id, cand_id, cos FROM hn WHERE neg_rank <= {HN_NEG}"""


@register(
    "embedding_top_pairs",
    _semdedup_fused_oracle(),
    "embedding near-dup, fused slot: kind='top' rows are the 20 globally "
    "most-similar pairs, EXACT via block-pair partitioning (equi-join on "
    "block-task key, no broadcast nested loop; LSH can't reach recall-1 on "
    "isotropic data — see operators.similarity.block_topk_pairs); "
    "kind='sd_pair'/'sd_drop' rows are SemDeDup (Abbas et al. 2023): "
    "within-cluster near-dup edges over seeded centroids and the dropped "
    "(higher-centroid-sim) member of each, cluster-bounded candidate "
    "volume; kind='hardneg' rows (round 11) are DPR-style hard-negative "
    "mining (mine_hard_negatives): each anchor's exact top-1 neighbor is "
    "its declared positive, removed by the pair-sized anti join, and the "
    "3 hardest surviving candidates re-rank densely — broadcast-probe "
    "scan, positives never corpus-sized",
    tags=("similarity", "dedup"),
)
def q_embedding_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import mine_hard_negatives

    emb = _emb(spark, sf_dir)
    top = block_topk_pairs(emb, k=20, n_blocks=16)
    docs, sd_pairs = semdedup(emb, _sd_centroids(), threshold=SD_THRESH)
    anchors = emb.filter(F.col("vec_id") < HN_ANCHORS)
    positives = cosine_topk(emb, anchors, k=1).select(
        F.col("query_id").alias("anchor_id"),
        F.col("vec_id").alias("positive_id"),
    )
    # anchor_vectors: the slot HOLDS the anchor frame (positives derive
    # from it), so don't let the operator re-derive anchors from the
    # positives plan — those validation counts + the probe collect would
    # re-execute the top-1 corpus scan ~4x at every PLAN CONSTRUCTION
    # (the VERDICT-r10-#1 cost class; construction-jobs test pins it).
    # validate_anchors=False: coverage holds BY CONSTRUCTION (every
    # positives row's anchor_id is a query_id cosine_topk emitted for a
    # row of `anchors` itself), and the default anti-join count would
    # execute the top-1 corpus scan once more at construction.
    hardneg = mine_hard_negatives(
        positives, emb, n_neg=HN_NEG, search_k=HN_SEARCH_K,
        anchor_vectors=anchors, validate_anchors=False,
    )
    top_rows = top.select(
        F.lit("top").alias("kind"),
        F.col("vec_a").alias("id_a"),
        F.col("vec_b").alias("id_b"),
        F.col("cos").alias("value"),
    )
    pair_rows = sd_pairs.select(
        F.lit("sd_pair").alias("kind"),
        F.col("vec_a").alias("id_a"),
        F.col("vec_b").alias("id_b"),
        F.col("cos").alias("value"),
    )
    drop_rows = docs.filter(~F.col("keep")).select(
        F.lit("sd_drop").alias("kind"),
        F.col("vec_id").alias("id_a"),
        F.col("cluster").cast("long").alias("id_b"),
        F.col("centroid_cos").alias("value"),
    )
    hn_rows = hardneg.select(
        F.lit("hardneg").alias("kind"),
        F.col("anchor_id").alias("id_a"),
        F.col("negative_id").alias("id_b"),
        F.col("cos").alias("value"),
    )
    return (
        top_rows.unionByName(pair_rows)
        .unionByName(drop_rows)
        .unionByName(hn_rows)
    )


N_CELLS = 8
NPROBE = 2
Q_BITS = 8
Q_LEVELS = (1 << Q_BITS) - 1


def _int8_oracle_ctes() -> str:
    """The quantized slice's oracle: re-derive the per-dimension affine
    params IN SQL (round(min/max, 6); scale = round((mx-mn)/levels, 6) —
    Python round() and DuckDB round() agree on every fixture value,
    verified at 3 SFs), quantize-reconstruct every vector with the
    floor(+0.5)+clamp form both engines evaluate identically under IEEE
    doubles, then run the SAME IVF pipeline over reconstructions —
    centroids = the n_cells lowest-id RECONSTRUCTED vectors."""
    return f"""
    dims AS (SELECT unnest(generate_series(1, {DIM})) AS i),
    qs AS (
      SELECT i, round(min(v[i]), 6) AS mn, round(max(v[i]), 6) AS mx
      FROM e CROSS JOIN dims GROUP BY i
    ),
    qp AS (SELECT i, mn, round((mx - mn) / {Q_LEVELS}, 6) AS sc FROM qs),
    pm AS (SELECT list(mn ORDER BY i) AS mns, list(sc ORDER BY i) AS scs FROM qp),
    er AS (
      SELECT vec_id, list_transform(generate_series(1, {DIM}), i ->
        mns[i] + least({Q_LEVELS}, greatest(0,
          CASE WHEN scs[i] = 0 THEN 0
               ELSE CAST(floor((v[i] - mns[i]) / scs[i] + 0.5) AS BIGINT) END)) * scs[i]
      ) AS v
      FROM e CROSS JOIN pm
    ),
    icents AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
      FROM (SELECT vec_id, v FROM er ORDER BY vec_id LIMIT {N_CELLS})
    ),
    icell_d AS (
      SELECT er.vec_id, c.cell, round({_sqd_sql('er.v', 'c.cv')}, 6) AS d
      FROM er CROSS JOIN icents c
    ),
    icells AS (
      SELECT vec_id, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        FROM icell_d
      ) WHERE rn = 1
    ),
    iq AS (SELECT vec_id AS query_id, v AS qv FROM er WHERE vec_id < {N_QUERIES}),
    iprobe_d AS (
      SELECT q.query_id, c.cell, round({_sqd_sql('q.qv', 'c.cv')}, 6) AS d, q.qv
      FROM iq q CROSS JOIN icents c
    ),
    iprobes AS (
      SELECT query_id, cell, qv FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY d ASC, cell ASC) AS rn
        FROM iprobe_d
      ) WHERE rn <= {NPROBE}
    ),
    iscored AS (
      SELECT p.query_id, er.vec_id, round({_cos_sql('p.qv', 'er.v')}, 6) AS cos
      FROM iprobes p JOIN icells cl USING (cell) JOIN er ON er.vec_id = cl.vec_id
      WHERE er.vec_id <> p.query_id
    ),
    irk AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)::INT AS rank FROM iscored)"""

# One index build per (Spark app, sf): the fixture parquet is immutable
# within a process lifetime (the _n_docs precedent), and the build is a
# full corpus shuffle + bucketed write — repeat slot invocations (the
# driver runs each query twice; bench min-of-N; sweeps) must not pay it
# again. Keyed on the application id too: the registered table lives in a
# session catalog, so a fresh Spark app must rebuild/re-register. The
# path carries the PID so two processes on the same SF never overwrite
# each other's live index (mode=overwrite only makes SEQUENTIAL re-builds
# idempotent). Maps (app_id, realpath key) -> (table, centroids,
# (mins, scales)) — the int8 slice and the round-6 monitor read the
# cached quantization params so they score with EXACTLY the affine rule
# the slot used (recomputing could diverge if the fixture were
# regenerated mid-process).
_IVF_INDEX_CACHE: dict[
    tuple[str, str], tuple[str, list[list[float]], tuple[list[float], list[float]]]
] = {}


@register(
    "ann_ivf_topk",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
      FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {N_CELLS})
    ),
    cell_d AS (
      SELECT e.vec_id, c.cell, round({_sqd_sql('e.v', 'c.cv')}, 6) AS d
      FROM e CROSS JOIN cents c
    ),
    cells AS (
      SELECT vec_id, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
        FROM cell_d
      ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
    probe_d AS (
      SELECT q.query_id, c.cell, round({_sqd_sql('q.qv', 'c.cv')}, 6) AS d, q.qv
      FROM q CROSS JOIN cents c
    ),
    probes AS (
      SELECT query_id, cell, qv FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY d ASC, cell ASC) AS rn
        FROM probe_d
      ) WHERE rn <= {NPROBE}
    ),
    scored AS (
      SELECT p.query_id, e.vec_id, round({_cos_sql('p.qv', 'e.v')}, 6) AS cos
      FROM probes p JOIN cells cl USING (cell) JOIN e ON e.vec_id = cl.vec_id
      WHERE e.vec_id <> p.query_id
    ),
    rk AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC)::INT AS rank FROM scored),
    {_int8_oracle_ctes()}
    SELECT 'direct' AS kind, query_id, vec_id, cos, rank FROM rk WHERE rank <= 3
    UNION ALL
    SELECT 'indexed' AS kind, query_id, vec_id, cos, rank FROM rk WHERE rank <= 3
    UNION ALL
    SELECT 'int8' AS kind, query_id, vec_id, cos, rank FROM irk WHERE rank <= 3""",
    "IVF ANN, fused slot: kind='direct' rows run the in-memory inverted-"
    "file path (coarse-quantizer cells from seeded deterministic "
    "centroids, each query probes its 2 nearest cells — candidate volume "
    "= probed cell sizes); kind='indexed' rows run the SAME probe against "
    "a build_ivf_index table (the corpus written bucketed BY cell — at "
    "100 TB the index IS the layout: the probe join reads corpus buckets "
    "in place with no exchange, the scale path the in-memory cap errors "
    "redirect to); kind='int8' rows run the same IVF over the symmetric-"
    "int8-QUANTIZED corpus (per-dim affine params derived from the corpus "
    "and re-derived independently in the oracle SQL; cells assigned over "
    "reconstructions — what a code-only store can do; 4x scan/shuffle "
    "bytes cut at 100 TB). direct and indexed slices are row-identical "
    "by contract; the oracle pins every slice.",
    tags=("similarity",),
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import re
    import tempfile

    from ..operators.similarity import (
        build_ivf_index,
        ivf_centroids,
        ivf_probe_indexed,
        ivf_topk,
        quantization_params,
        quantized_ivf_topk,
        requantize_point,
    )

    from ..caches import sf_key

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    tag = re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.rstrip("/")).strip("_")
    # key on the CANONICAL realpath (caches.sf_key), never the sanitized
    # tag: the tag is lossy (two dirs differing only in punctuation
    # collapse to one tag) and a tag-shared entry would silently probe
    # the wrong corpus's index — the tag is only a filesystem/table NAME.
    # realpath (vs the round-10 raw string) folds spelling variants of
    # ONE directory into one entry, so '/x/sf0.1' vs '/x/sf0.1/' no
    # longer rebuilds and leaks a second bucketed corpus copy (ADVICE r10)
    key = (spark.sparkContext.applicationId, sf_key(sf_dir))
    if key not in _IVF_INDEX_CACHE:
        import atexit
        import shutil

        # ONE centroid derivation for all slices (ivf_centroids is the
        # shared quantizer rule — the direct path below receives the same
        # list and the int8 slice its driver-side requantization, so the
        # slices cannot drift and the collect happens once)
        cents = ivf_centroids(emb, N_CELLS)
        qparams = quantization_params(emb, Q_BITS)
        # cache-size suffix: two RAW dirs can collapse to one tag, and a
        # shared table/path would overwrite the first entry's live index
        table = f"ann_ivf_idx_{tag}_{os.getpid()}_{len(_IVF_INDEX_CACHE)}"
        path = f"{tempfile.gettempdir()}/sparkgraft_ivf/{table}"
        build_ivf_index(emb, cents, table, path, n_buckets=8)
        # the PID suffix isolates concurrent processes; it also means no
        # later run overwrites this dir, so remove it on exit or every
        # process leaks a corpus-sized bucketed copy into the tempdir
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        _IVF_INDEX_CACHE[key] = (table, cents, qparams)
    table, cents, qparams = _IVF_INDEX_CACHE[key]
    direct = ivf_topk(emb, queries, n_cells=N_CELLS, nprobe=NPROBE, k=3, centroids=cents)
    indexed = ivf_probe_indexed(spark, table, queries, cents, nprobe=NPROBE, k=3)
    # int8 slice: same IVF geometry over the quantize->reconstruct corpus.
    # Cells come from the SAME seeded centroid rule, requantized driver-
    # side (bit-identical to reconstructing them through the quantize
    # plan) — no extra collect beyond the cached params.
    int8 = quantized_ivf_topk(
        emb,
        queries,
        n_cells=N_CELLS,
        nprobe=NPROBE,
        k=3,
        bits=Q_BITS,
        params=qparams,
        centroids=[requantize_point(c, *qparams, bits=Q_BITS) for c in cents],
    )
    return (
        direct.select(F.lit("direct").alias("kind"), "*")
        .unionByName(indexed.select(F.lit("indexed").alias("kind"), "*"))
        .unionByName(int8.select(F.lit("int8").alias("kind"), "*"))
    )
