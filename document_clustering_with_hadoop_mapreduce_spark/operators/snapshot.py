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


def term_distribution_drift(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    top_contributors: int = 20,
    text_col: str = "text",
) -> tuple[float, DataFrame]:
    """(jsd, contributors): Jensen-Shannon divergence between the two
    corpora's unigram distributions — the dataset-DRIFT monitor that
    tells a recurring ingest whether this snapshot still looks like the
    last one (JSD is symmetric, bounded [0, ln 2], and defined even when
    vocabularies differ — exactly why it beats raw KL for monitoring;
    Lin, IEEE-IT 1991).

        JSD = 0.5 * KL(P || M) + 0.5 * KL(Q || M),  M = (P + Q) / 2

    ``contributors`` is the top-``top_contributors`` terms by absolute
    JSD contribution with both probabilities attached — the "what
    changed" drill-down (new boilerplate, a vanished source, a language
    shift show up here before any aggregate metric moves).

    Scale shape: two vocab-sized frequency aggregates (each checkpointed
    once — the mass scalar and the probability join are two consumers of
    the same tokenize subtree Catalyst cannot unify, the
    ``unigram_cross_entropy`` rationale), ONE full-outer join on the term
    key, a map-side contribution expression, and a 1-row sum + a top-k.
    Nothing corpus-sized past the token-count aggregates.

    A side with ZERO tokens raises (same contract as ``embedding_drift``):
    the divergence is undefined there, and silently returning the
    ln(2)/2 a degenerate sum produces would read as "moderate drift" on
    a dead feed — the one state a monitor must never underreport.
    """
    from ..functions.text import tokens

    if top_contributors < 1:
        raise ValueError(f"top_contributors must be >= 1, got {top_contributors}")

    def probs(df: DataFrame, name: str) -> DataFrame:
        counts = (
            df.select(
                F.explode(F.filter(tokens(F.col(text_col)), lambda t: t != "")).alias("__t")
            )
            .groupBy("__t")
            .agg(F.count(F.lit(1)).alias("__c"))
            .localCheckpoint(eager=False)
        )
        if counts.limit(1).count() == 0:
            raise ValueError(
                f"term_distribution_drift: corpus side {name!r} has no tokens — "
                "the divergence is undefined for an empty distribution"
            )
        mass = counts.agg(F.sum("__c").cast("double").alias("__m"))
        return counts.crossJoin(F.broadcast(mass)).select(
            "__t", (F.col("__c") / F.col("__m")).alias(name)
        )
    joined = probs(corpus_a, "p").join(probs(corpus_b, "q"), "__t", "full_outer").select(
        "__t",
        F.coalesce(F.col("p"), F.lit(0.0)).alias("p"),
        F.coalesce(F.col("q"), F.lit(0.0)).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    # 0 * ln(0/x) terms are 0 by convention — the when() guards realize it
    contrib = (
        F.lit(0.5) * F.when(F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)).otherwise(0.0)
        + F.lit(0.5) * F.when(F.col("q") > 0, F.col("q") * F.log(F.col("q") / m)).otherwise(0.0)
    )
    scored = joined.select(
        F.col("__t").alias("term"),
        F.round("p", 9).alias("p"),
        F.round("q", 9).alias("q"),
        contrib.alias("__contrib"),
    ).localCheckpoint(eager=False)
    jsd = scored.agg(F.sum("__contrib").alias("j")).collect()[0]["j"] or 0.0
    contributors = (
        scored.orderBy(F.desc(F.abs(F.col("__contrib"))), F.asc("term"))
        .limit(top_contributors)
        .select("term", "p", "q", F.round("__contrib", 9).alias("jsd_contribution"))
    )
    return round(float(jsd), 9), contributors


def embedding_drift(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    vec_col: str = "embedding",
) -> dict[str, float]:
    """Embedding-space drift between two snapshots, as three scalars a
    monitor thresholds (the representation-level companion to
    ``term_distribution_drift`` — a paraphrased spam flood can keep the
    unigram distribution flat while moving the embedding mass):

    - ``mean_shift_l2``: L2 distance between the two mean vectors
    - ``mean_cosine``: cosine between the two mean vectors (scale-free)
    - ``dispersion_ratio``: total per-dim variance of B over A — > 1 the
      corpus spread out (new modes), < 1 it collapsed (mode drop)

    Undefined values (zero mean vector; zero variance on the A side) come
    back as NaN — loud on any threshold comparison — never as an
    in-range sentinel. Mismatched embedding dimensions raise.

    Scale shape: one (dim)-keyed aggregate per corpus over the
    posexploded vectors (d-row outputs, map-side partial sums), joined on
    dim and folded to the three scalars — nothing corpus-sized leaves the
    executors. First moments only by design: higher-order two-sample
    tests (MMD, energy distance) need pairwise kernels this summary
    deliberately avoids at 100 TB.
    """
    def moments(df: DataFrame, prefix: str) -> DataFrame:
        return (
            df.select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"))
            .groupBy("dim")
            .agg(
                F.avg("x").alias(f"{prefix}_mean"),
                F.var_pop("x").alias(f"{prefix}_var"),
            )
        )

    ma = moments(corpus_a, "a").localCheckpoint(eager=False)
    mb = moments(corpus_b, "b").localCheckpoint(eager=False)
    da, db = ma.count(), mb.count()
    if da == 0 or db == 0:
        raise ValueError("embedding_drift needs at least one vector on each side")
    if da != db:
        # the inner join below would silently truncate to the common dim
        # prefix — an embedding-model swap must be an ERROR, not a
        # plausible-looking number over half the dimensions
        raise ValueError(
            f"embedding_drift: dimension mismatch ({da} vs {db} dims) — "
            "the two corpora use different embedding spaces"
        )
    joined = ma.join(mb, "dim")
    row = joined.agg(
        F.sum(F.pow(F.col("a_mean") - F.col("b_mean"), 2)).alias("__d2"),
        F.sum(F.col("a_mean") * F.col("b_mean")).alias("__dot"),
        F.sqrt(F.sum(F.col("a_mean") * F.col("a_mean"))).alias("__na"),
        F.sqrt(F.sum(F.col("b_mean") * F.col("b_mean"))).alias("__nb"),
        F.sum("a_var").alias("__va"),
        F.sum("b_var").alias("__vb"),
    ).collect()[0]
    prod = (row["__na"] or 0.0) * (row["__nb"] or 0.0)
    # undefined metrics are NaN, never a valid-looking in-range sentinel:
    # 0.0 would read as "orthogonal means" / "collapsed dispersion" — for
    # a zero mean vector or a zero-variance side that is the INVERTED
    # alarm, not a safe default
    return {
        "mean_shift_l2": round(float(row["__d2"]) ** 0.5, 9),
        "mean_cosine": round(float(row["__dot"]) / prod, 9) if prod > 0 else float("nan"),
        "dispersion_ratio": (
            round(float(row["__vb"]) / float(row["__va"]), 9)
            if row["__va"] and row["__va"] > 0
            else float("nan")
        ),
    }
