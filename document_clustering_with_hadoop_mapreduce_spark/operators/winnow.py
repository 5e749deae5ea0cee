"""Winnowing document fingerprints (Schleimer, Wilkerson, Aho — "Winnowing:
Local Algorithms for Document Fingerprinting", SIGMOD 2003; the MOSS
algorithm).

Where ``doc_fingerprints`` hashes the WHOLE document (exact-dup only) and
``shingles``/MinHash sample globally (whole-doc resemblance), winnowing
selects a deterministic, position-robust SUBSET of k-gram hashes such that
any shared substring of length >= t = k + w - 1 characters between two
documents is GUARANTEED to surface at least one shared fingerprint — the
partial-overlap / plagiarism-detection primitive. Expected index density is
2/(w+1) of the full k-gram stream (SIGMOD'03 §5), so the posting list the
pair join sees is ~an order of magnitude smaller than full shingling at
w = 16.

Scale shape: fingerprint selection is one map-side projection — nested
higher-order array functions (transform + aggregate) over the normalized
text, zero shuffles, so it fuses into the consuming aggregation. The pair
generator is the standard posting-list equi-join with a document-frequency
cap (ubiquitous fingerprints are dropped BEFORE the join — same role as
the LSH hot-bucket guard in ``dedup.lsh_candidate_pairs``): no all-pairs
plan, quadratic blow-up bounded by ``max_df``.

Hashes are ``md5_int60`` (functions/hashing.py) so the pure-python test
oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

# 60-bit md5 of a k-gram starting at 1-based position {i} of __norm —
# SQL twin of functions.hashing.md5_int60, inlined because it runs inside
# lambda scope where python Column helpers cannot reach the lambda var.
_KGRAM_HASH = "cast(conv(substr(md5(substr(__norm, {i}, {k})), 1, 15), 16, 10) as bigint)"

# NOTE (measured, sf0.1, local[32]): an integer-only double-polynomial
# k-gram hash over a precomputed char-code array was tried as a "fast
# path" and came out ~45% SLOWER than md5 (1.14 s vs 0.78 s parallel) —
# higher-order-function evaluation (struct allocs per fold step), not the
# md5 intrinsic, dominates this operator. md5 is therefore the one hash
# path, keeping value-level parity with the rest of the dedup stack.


def winnow_fingerprints(
    documents: DataFrame,
    k: int = 16,
    w: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, pos, fingerprint): the winnowed k-gram hash set per doc.

    Text is normalized exactly like ``doc_fingerprints`` (clean -> split ->
    single-space join), then: hash every char k-gram; slide a window of
    ``w`` consecutive hashes; in each window keep the minimum, rightmost
    occurrence on ties (the SIGMOD'03 robust-winnowing tie rule, realized
    by a left-to-right fold with ``<=``); emit each selected (pos, hash)
    once. ``pos`` is the 1-based k-gram offset in the normalized text —
    kept because overlap REGIONS (not just scores) are what a span-level
    consumer aligns on.

    Guarantee (paper Thm. on t = k + w - 1): substrings of length >= t
    shared by two documents always share a fingerprint; substrings of
    length < k are never matched. Documents whose normalized length is
    < t produce no rows — compose with ``doc_fingerprints`` for whole-doc
    hashing of short texts.

    Parallelism is split-bound, like every map-side projection here: the
    operator adds no exchange, so its tasks mirror the input splits (at
    the 100 TB target that is thousands of parquet row groups; a tiny
    single-file local corpus should be repartitioned by the CALLER if it
    wants the cores busy).
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k}, w={w}")
    norm = F.concat_ws(" ", tokens(F.col(text_col)))
    staged = documents.select(F.col(id_col).alias("doc_id"), norm.alias("__norm")).where(
        F.length("__norm") >= k + w - 1
    )
    hashes = F.expr(
        f"transform(sequence(1, length(__norm) - {k} + 1), i -> {_KGRAM_HASH.format(i='i', k=k)})"
    )
    # per window j: fold over hash indices j..j+w-1, keeping the smallest
    # hash seen so far and REPLACING on ties (<=) so the rightmost minimal
    # element wins; null-seeded accumulator avoids a sentinel value
    select_min = (
        f"transform(sequence(1, size(__hs) - {w} + 1), j -> "
        f"  aggregate(sequence(j, j + {w} - 1), "
        f"    struct(cast(null as bigint) as h, cast(-1 as int) as p), "
        f"    (acc, i) -> if(acc.h is null or element_at(__hs, i) <= acc.h, "
        f"                   struct(element_at(__hs, i) as h, cast(i as int) as p), acc)))"
    )
    return (
        staged.select("doc_id", hashes.alias("__hs"))
        .select("doc_id", F.explode(F.array_distinct(F.expr(select_min))).alias("__f"))
        .select("doc_id", F.col("__f.p").alias("pos"), F.col("__f.h").alias("fingerprint"))
    )


def _capped_pair_join(
    fingerprints: DataFrame, min_shared: int, max_df: int, with_pos: bool
) -> DataFrame:
    """Shared scaffolding for the pair generators: df-capped postings
    self-joined on the fingerprint key, doc_a < doc_b. ONE definition so
    the cap semantics (documents per fingerprint, regardless of how many
    positions carry it) cannot drift between the count and span variants.
    ``with_pos`` carries the 1-based k-gram offsets through as
    ``__pa``/``__pb`` for span aggregation."""
    if min_shared < 1 or max_df < 2:
        raise ValueError(f"need min_shared >= 1 and max_df >= 2, got {min_shared}, {max_df}")
    cols = ["doc_id", "fingerprint"] + (["pos"] if with_pos else [])
    postings = fingerprints.select(*cols).distinct()
    if with_pos:
        # Position-level rows: the cap counts DOCS, not rows. A window
        # with collect_set(doc_id) would buffer the FULL posting list of a
        # fingerprint in window state BEFORE the <= max_df filter — and
        # the unbounded-df fingerprints are exactly the boilerplate keys
        # the cap exists to drop (a license-header k-gram in 10M docs
        # would buffer a 10M-element set). countDistinct aggregates with
        # constant per-key state instead, and the join-back lands on the
        # same fingerprint hash partitioning the self-join below reuses.
        df_counts = postings.groupBy("fingerprint").agg(
            F.count_distinct("doc_id").alias("__df")
        )
        capped = postings.join(df_counts.where(F.col("__df") <= max_df), "fingerprint")
    else:
        # doc-level rows are already (doc_id, fingerprint)-distinct, so a
        # plain count window (constant running state) is the doc count
        capped = postings.withColumn(
            "__df", F.count(F.lit(1)).over(Window.partitionBy("fingerprint"))
        ).where(F.col("__df") <= max_df)
    a_cols = [F.col("doc_id").alias("doc_a"), F.col("fingerprint")]
    b_cols = [F.col("doc_id").alias("doc_b"), F.col("fingerprint")]
    if with_pos:
        a_cols.append(F.col("pos").alias("__pa"))
        b_cols.append(F.col("pos").alias("__pb"))
    a = capped.select(*a_cols)
    b = capped.select(*b_cols)
    return a.join(b, "fingerprint").where(F.col("doc_a") < F.col("doc_b"))

def winnow_overlap_pairs(
    fingerprints: DataFrame,
    min_shared: int = 2,
    max_df: int = 256,
) -> DataFrame:
    """(doc_a, doc_b, shared): document pairs sharing >= ``min_shared``
    distinct winnow fingerprints, doc_a < doc_b.

    Posting lists longer than ``max_df`` documents (boilerplate k-grams —
    licenses, headers) are dropped before the self-join, bounding the
    per-fingerprint pair fan-out at max_df^2 and keeping the plan free of
    hot-key quadratic blow-ups; the df count rides a window over the
    already-hash-partitioned fingerprint key, and the self-join re-uses
    that partitioning (co-partitioned equi-join, no extra exchange on the
    big side). Raising ``min_shared`` trades recall on short overlaps for
    precision exactly as in MOSS.
    """
    pairs = _capped_pair_join(fingerprints, min_shared, max_df, with_pos=False)
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )


def winnow_overlap_spans(
    fingerprints: DataFrame,
    min_shared: int = 2,
    max_df: int = 256,
) -> DataFrame:
    """(doc_a, doc_b, shared, a_start, a_end, b_start, b_end): matched
    pairs WITH the aligned overlap region — the span-level output MOSS
    renders, and the reason ``winnow_fingerprints`` keeps ``pos``.

    For each pair passing the same df-cap + ``min_shared`` gate as
    ``winnow_overlap_pairs``, the bounds are the min/max k-gram offsets
    of the SHARED fingerprints on each side: the tightest window in each
    document that covers every matched gram (one contiguous overlap
    yields its exact extent to within w; disjoint repeats yield the
    covering hull — a consumer that needs per-region granularity clusters
    the matched positions itself). Same plan shape as the pair join plus
    four min/max aggregates riding the existing pair groupBy; the df cap's
    doc counts come from a bounded-state groupBy/countDistinct joined back
    on the fingerprint key (one fingerprint-cardinality exchange — never a
    collect_set window buffering a hot fingerprint's posting list).
    """
    pairs = _capped_pair_join(fingerprints, min_shared, max_df, with_pos=True)
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(
            F.count_distinct(F.col("fingerprint")).alias("shared"),
            F.min("__pa").alias("a_start"),
            F.max("__pa").alias("a_end"),
            F.min("__pb").alias("b_start"),
            F.max("__pb").alias("b_end"),
        )
        .where(F.col("shared") >= min_shared)
    )
