"""Record linkage / entity resolution: blocking + edit-distance verify
(Fellegi & Sunter 1969 decision framework; blocking surveyed in
Christen, TKDE 2012).

The dedup stack matches DOCUMENTS by content overlap; this module matches
ENTITY RECORDS (names, titles, addresses) across two tables — the
fuzzy-join a curation pipeline needs to reconcile source catalogs,
author/site registries, or metadata feeds. The shape is the universal
scale pattern used everywhere in this repo: a cheap map-side BLOCKING key
bounds the candidate space (equi-join, never a cartesian), then an exact
verifier (Levenshtein) scores only the candidates.

Scale shape: one equi-join on the block key; block-size skew is the known
failure mode (a "SMITH" block at web scale is quadratic), so candidates
are bounded by ``max_block_size`` — oversized blocks are EXCLUDED from
matching (the standard blocking trade: bounded work, documented recall
loss) and surfaced by ``blocking_stats`` so the caller can see exactly
what a cap drops and re-block those records with a finer key (multi-pass
blocking = union of ``blocked_matches`` over different keys; the result
frames compose with ``distinct``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _norm_name(col: Column) -> Column:
    """Lowercase, strip non-alphanumerics to single spaces, trim — the
    verifier's comparison form (shared with the test oracles)."""
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def soundex_block(col: Column) -> Column:
    """Default blocking key: American Soundex of the first normalized
    token — survives vowel typos and doubled letters, the classic choice."""
    return F.soundex(F.split(_norm_name(col), " ")[0])


def prefix_block(col: Column, n: int = 3) -> Column:
    """Alternative blocking key: first ``n`` normalized chars (exactly
    mirrorable in SQL oracles; finer than soundex for dense name spaces)."""
    return F.substring(F.regexp_replace(_norm_name(col), " ", ""), 1, n)


def blocking_stats(
    records: DataFrame, block_key: Column, max_block_size: int = 1024
) -> DataFrame:
    """(block, n_records, over_cap): audit the block-size distribution —
    the first thing a linkage run should look at, because every record in
    an ``over_cap`` block is excluded from matching until re-blocked."""
    return (
        records.select(block_key.alias("block"))
        .groupBy("block")
        .agg(F.count(F.lit(1)).alias("n_records"))
        .withColumn("over_cap", F.col("n_records") > max_block_size)
    )


def blocked_matches(
    left: DataFrame,
    right: DataFrame | None = None,
    name_col: str = "name",
    id_col: str = "id",
    block_fn=soundex_block,
    max_dist: int = 2,
    max_block_size: int = 1024,
) -> DataFrame:
    """(id_a, id_b, name_a, name_b, dist): record pairs whose normalized
    names are within ``max_dist`` Levenshtein edits, candidate-bounded by
    equal blocking keys.

    ``right=None`` links a table against itself (id_a < id_b, no
    self-pairs); otherwise links left-to-right (ids taken as-is, so the
    caller can match a new feed against a master table). Blocks larger
    than ``max_block_size`` on either side are excluded before the join
    (see module docstring; audit with ``blocking_stats``). The verifier
    runs on normalized names — case/punctuation differences alone are
    distance 0. Records whose name normalizes to the empty string (pure
    punctuation; scripts outside the ASCII normalizer) are EXCLUDED —
    they carry no comparable signal and would otherwise all pair with
    each other at distance 0.
    """
    if max_dist < 0 or max_block_size < 1:
        raise ValueError(
            f"need max_dist >= 0 and max_block_size >= 1, got {max_dist}, {max_block_size}"
        )

    def prep(df: DataFrame, suffix: str) -> DataFrame:
        out = df.select(
            F.col(id_col).alias(f"id_{suffix}"),
            F.col(name_col).alias(f"name_{suffix}"),
            _norm_name(F.col(name_col)).alias(f"__norm_{suffix}"),
            block_fn(F.col(name_col)).alias("block"),
        )
        # names that normalize to nothing (pure punctuation, non-Latin
        # scripts this normalizer cannot see) would otherwise all share
        # one block and "match" each other at distance 0 — unmatchable
        # records are excluded, not fabricated into links
        out = out.where(F.col(f"__norm_{suffix}") != "")
        w = Window.partitionBy("block")
        return out.withColumn("__bs", F.count(F.lit(1)).over(w)).where(
            F.col("__bs") <= max_block_size
        ).drop("__bs")

    a = prep(left, "a")
    if right is None:
        # self-linkage: rename a's columns instead of re-running the
        # normalize + window-cap pass over the same rows
        b = a.select(
            F.col("id_a").alias("id_b"),
            F.col("name_a").alias("name_b"),
            F.col("__norm_a").alias("__norm_b"),
            "block",
        )
    else:
        b = prep(right, "b")
    pairs = a.join(b, "block")
    if right is None:
        pairs = pairs.where(F.col("id_a") < F.col("id_b"))
    # THRESHOLDED levenshtein (Spark 3.5+): the banded DP early-exits at
    # max_dist+1 — O(max_dist * len) per pair instead of O(len^2) — and
    # returns -1 past the threshold, so the filter form is identical to
    # `dist <= max_dist` on the unbounded distance (exact dist kept for
    # every surviving pair). On the blocked candidate stream the verifier
    # IS the hot loop, so the band is the scale lever here.
    return (
        pairs.withColumn(
            "dist",
            F.levenshtein(F.col("__norm_a"), F.col("__norm_b"), int(max_dist)),
        )
        .where(F.col("dist") >= 0)
        .select("id_a", "id_b", "name_a", "name_b", "dist")
    )
