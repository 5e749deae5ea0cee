"""Tripwire for the ``_round6`` shortest-decimal vs binary-double HALF_UP
mismatch class (VERDICT r9 #2).

``operators.similarity._round6`` emulates Spark's ``F.round(col, 6)`` by
flooring the BINARY double scaled by 1e6, while the JVM rounds the
SHORTEST DECIMAL REPRESENTATION via BigDecimal HALF_UP — the two can
disagree only when an unrounded score sits within ~1e-9 of an exact
``n + 0.5`` boundary at the 6th decimal (see the ``_round6`` docstring
for the worked example). No hit has ever occurred across the 50-slot
oracle gate at three SFs; this module makes that claim MEASURED every
round instead of remembered: for each similarity slot it recomputes the
slot's output scores UNROUNDED (float64, same dot/(na*nb) zero-norm-
guarded form) and counts (a) actual binary-floor vs shortest-decimal
HALF_UP disagreements — asserted 0 by the test gate — and (b) the
conservative near-boundary early-warning count (within 1e-9; reported,
not asserted: such values both engines still round identically). A
future nonzero disagreement count is the diagnosis that would otherwise
take an archaeology session when a one-row hash mismatch first fires.

SCOPE — only the slices that actually flow through ``_round6`` are
scanned: knn_bruteforce and ann_lsh_topk entirely, ann_ivf_topk's
kind='direct' and kind='int8' slices (round 11 — the int8 slice's
scores are ``_round6`` cosines of the quantize->RECONSTRUCT vectors,
so the recompute reconstructs through ``requantize_point`` with the
slot's own param rule first), and embedding_top_pairs' kind='sd_pair'
and kind='hardneg' slices (round 11 — hardneg scores are ``_round6``
cosines of the original vectors via ``cosine_topk``). The other slices
(ivf kind='indexed', pairs kind='top'/'sd_drop') round via JVM
``F.round`` — BigDecimal HALF_UP on the shortest decimal, i.e. the
SAME rule the DuckDB oracle applies — so the _round6 mismatch class
cannot exist there by construction, and counting a floor-vs-decimal
disagreement against them would claim the exact inverse of reality.

PRECISION — the recompute's summation order (NumPy ddot) differs from
the engines' (BLAS dgemm blocking in the Arrow tasks) by ~1-2 ulp, so
the disagreement count is exact only for the recomputed double; a true
engine-side straddle (a <0.5-ulp window) can land on either side of it.
The robust tripwire is the NEAR-BOUNDARY band: 1e-9 is ~7 orders of
magnitude wider than ulp noise, so every engine value that could
possibly straddle lands in the band regardless of the recompute's ±ulp
— investigate a mismatch by re-deriving the exact engine double for the
banded rows, not by trusting the recomputed one.

Driver note: this is a DIAGNOSTIC (test/tool surface, not an operator) —
it collects the slot outputs (top-k-bounded) and the embedding table
(capped, raising past ``max_corpus_rows``) to recompute scores in NumPy.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# |unrounded| * 1e6 within this distance of an exact n + 0.5 marks a score
# as boundary-adjacent (1e-3 scaled units = 1e-9 in score units)
BOUNDARY_TOL_SCALED = 1e-3

# similarity slots with at least one slice flowing through _round6 in an
# Arrow task; scan_slot restricts fused slots to exactly those slices
# (the JVM-F.round slices cannot exhibit the class — see module docstring)
SIMILARITY_SLOTS = (
    "knn_bruteforce",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_top_pairs",
)


def boundary_hits(scores) -> int:
    """Count scores within 1e-9 of a 0.5e-6 HALF_UP boundary — the
    CONSERVATIVE early-warning count. Values here are ~8 orders of
    magnitude more common than actual disagreements (a straddle needs the
    binary double and its shortest decimal repr on OPPOSITE sides of the
    boundary, a < 0.5-ulp window); the test SF corpus measures 2 such
    near values with both engines agreeing. Reported, not asserted."""
    import numpy as np

    y = np.abs(np.asarray(scores, dtype=np.float64)) * 1e6
    frac = y - np.floor(y)
    return int((np.abs(frac - 0.5) < BOUNDARY_TOL_SCALED).sum())


def halfup_disagreements(scores) -> int:
    """Count scores where ``_round6`` (floor of the BINARY double + 0.5)
    and decimal HALF_UP on the SHORTEST DECIMAL REPRESENTATION (what the
    JVM's BigDecimal.valueOf and DuckDB effectively round) actually
    DISAGREE — the exact mismatch class the ``_round6`` docstring names.
    Python's ``repr`` is the same shortest-round-trip decimal as Java's
    ``Double.toString``. Expected 0; a nonzero count is the engine-side
    explanation for a similarity-slot hash mismatch."""
    from decimal import ROUND_HALF_UP, Decimal

    from ..operators.similarity import _round6

    n = 0
    for x in scores:
        x = float(x)
        dec = float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )
        if dec != float(_round6(x)):
            n += 1
    return n


def _load_vectors(spark: SparkSession, sf_dir: str, max_corpus_rows: int) -> dict:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").limit(max_corpus_rows + 1).collect()
    if len(rows) > max_corpus_rows:
        raise ValueError(
            f"round6 boundary scan collects the embedding table to recompute "
            f"scores; {sf_dir} exceeds max_corpus_rows={max_corpus_rows} — "
            "run the scan at a test SF or raise the cap explicitly."
        )
    return {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}


def _raw_cos(a: list, b: list) -> float:
    import numpy as np

    va, vb = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    den = float(np.sqrt(va @ va) * np.sqrt(vb @ vb))
    return 0.0 if den == 0.0 else float(va @ vb) / den


def scan_slot(
    spark: SparkSession, sf_dir: str, name: str, max_corpus_rows: int = 200_000
) -> dict:
    """{'rows', 'disagreements', 'near_boundary'} for one similarity slot:
    recompute the slot's ``_round6``-rounded slices unrounded (ONLY those
    — see the module docstring's SCOPE note) and count actual
    floor-vs-decimal disagreements plus boundary-adjacent values.
    ``rows`` counts the scanned slice, not the slot's full output."""
    from .registry import all_queries

    vecs = _load_vectors(spark, sf_dir, max_corpus_rows)
    out = all_queries()[name].spark(spark, sf_dir).collect()

    def _vec(vid):
        # a slot row referencing an id absent from the loaded window would
        # otherwise KeyError with no context (ADVICE r11) — name the cap
        # so the operator (raise max_corpus_rows / fix the fixture) is
        # obvious from the diagnostic alone
        try:
            return vecs[vid]
        except KeyError:
            raise KeyError(
                f"slot '{name}' references vec_id {vid!r} which is not in "
                f"the loaded embedding window ({len(vecs)} rows, "
                f"max_corpus_rows={max_corpus_rows}) — raise the cap or "
                f"check the fixture for id drift"
            ) from None

    raw: list[float] = []
    # ONLY the _round6-rounded slices (see module docstring): the JVM
    # F.round slices (ivf 'indexed', pairs 'top'/'sd_drop') already round
    # by the oracle's own decimal-HALF_UP rule — scanning them would both
    # misattribute any straddle AND double-count ivf's row-identical twin
    if name == "embedding_top_pairs":
        for r in out:
            # sd_pair and hardneg both score through _round6 over the
            # ORIGINAL vectors (semdedup's Arrow task / cosine_topk)
            if r["kind"] in ("sd_pair", "hardneg"):
                raw.append(_raw_cos(_vec(r["id_a"]), _vec(r["id_b"])))
    elif name == "ann_ivf_topk":
        # int8 slice: _round6 cosines of the quantize->RECONSTRUCT
        # vectors, over requantize_point twins derived with the affine
        # params THE SLOT ACTUALLY SCORED WITH: the q() call above
        # populated _IVF_INDEX_CACHE, so read the cached (mins, scales)
        # rather than re-aggregating the corpus (ADVICE r11 — the
        # recompute is an extra full-corpus pass AND could silently
        # diverge if the fixture dir were regenerated within one
        # application, since the cache keys on app id + realpath).
        # Recompute only on a cache miss (a future slot refactor that
        # stops caching would land here, not on a KeyError).
        from ..caches import sf_key
        from ..operators.similarity import quantization_params, requantize_point
        from .queries_similarity import _IVF_INDEX_CACHE, Q_BITS, _emb

        cached = _IVF_INDEX_CACHE.get(
            (spark.sparkContext.applicationId, sf_key(sf_dir))
        )
        qp = cached[2] if cached else quantization_params(_emb(spark, sf_dir), Q_BITS)
        rvecs: dict = {}

        def _recon(vid):
            if vid not in rvecs:
                rvecs[vid] = requantize_point(_vec(vid), *qp, bits=Q_BITS)
            return rvecs[vid]

        for r in out:
            if r["kind"] == "direct":
                raw.append(_raw_cos(_vec(r["query_id"]), _vec(r["vec_id"])))
            elif r["kind"] == "int8":
                raw.append(_raw_cos(_recon(r["query_id"]), _recon(r["vec_id"])))
    else:
        for r in out:
            raw.append(_raw_cos(_vec(r["query_id"]), _vec(r["vec_id"])))
    return {
        "rows": len(raw),
        "disagreements": halfup_disagreements(raw),
        "near_boundary": boundary_hits(raw),
    }


def scan_all(
    spark: SparkSession, sf_dir: str, max_corpus_rows: int = 200_000
) -> dict:
    return {
        name: scan_slot(spark, sf_dir, name, max_corpus_rows)
        for name in SIMILARITY_SLOTS
    }
