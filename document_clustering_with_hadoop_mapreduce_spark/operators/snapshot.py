"""Corpus snapshot diff: what changed between two versions of a corpus.

The bookkeeping primitive of an incremental 100 TB build: each nightly
snapshot is diffed against the previous one so downstream stages
(signatures, embeddings, indexes) recompute ONLY touched documents —
``lsh_incremental_pairs`` consumes exactly the ``added``/``changed`` slice
this operator emits.

Scale design:
- one content hash per side, computed map-side (md5 of the text — the
  same cryptographic-quality discipline as the shingle hashes, and cheap
  next to a parquet scan);
- ONE full-outer shuffle join on the document id — at scale both
  snapshots live bucketed on ``doc_id`` (``sources/bucketing.py``) and the
  join plans exchange-free sort-merge;
- only ``added`` / ``removed`` / ``changed`` rows are emitted: the
  unchanged class is corpus-sized and callers that want it have it by
  construction (it is the anti-join of the corpus with this result), so
  the result stays delta-sized.

Reference parity: the reference engine is a batch-only pipeline with no
snapshot surface; this extends the incremental-ingestion family
(``operators/dedup.py::lsh_incremental_pairs``,
``streaming/events_stream.py::run_stream_incremental_dedup``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, status, old_hash, new_hash) for every document that differs
    between the two snapshots; status is ``added`` (only in ``new``),
    ``removed`` (only in ``old``) or ``changed`` (both, different content
    hash). Unchanged documents are not emitted (delta-sized result).

    Ids must be unique within each snapshot (a corpus key, not an event
    log); the hash compares the raw ``text_col`` bytes — normalize first if
    two snapshots may differ only in encoding artifacts.
    """
    # presence comes from explicit side markers, NOT hash nullness: md5 of a
    # NULL text is NULL, so a hash-based presence test would misread a
    # null-text document that exists in both snapshots as added/removed and
    # could never flag null <-> non-null transitions as changed
    o = old.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("old_hash"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("new_hash"),
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, "doc_id", "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(
            # null-safe inequality: a null-text side differs from a non-null
            # one (and null == null is unchanged)
            ~F.col("old_hash").eqNullSafe(F.col("new_hash")),
            F.lit("changed"),
        )
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select("doc_id", "status", "old_hash", "new_hash")
    )
