"""Corpus data card: the per-slice statistics report a training-data build
publishes next to the data (datasheet/data-card practice — Gebru et al.
2021, "Datasheets for Datasets"; the Pile/Dolma/RefinedWeb papers all ship
per-source token-count and length-distribution tables of exactly this
shape).

Scale design:
- counts/sums/means are ONE rollup aggregate over a map-side token-count
  projection (partial aggregation, group-key exchange only);
- quantiles are EXACT but never group-buffered: Spark's ``percentile``
  aggregate holds every group value in executor memory (a genuine OOM at a
  100 TB group), so ``exact_quantiles`` instead rides a per-group
  distributed SORT (window row_number + count) and linearly interpolates
  the two straddling ranks — the same math as DuckDB/Postgres
  ``quantile_cont``/``percentile_cont``, which is what the oracle runs;
- vocabulary size is a distinct-aggregate over the exploded cleaned token
  stream (stopwords KEPT — the dedup/statistics stream, not the
  stopword-filtered modeling stream);
- all per-group frames are group-cardinality-sized, so the final
  assembly joins broadcast.

Reference parity: the reference engine has no reporting surface beyond the
per-category formatted report (sources/1.5, covered by
``category_report``); this generalizes it to the corpus-hygiene family.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count, tokens


def exact_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    qs: Sequence[float],
    out_names: Sequence[str] | None = None,
) -> DataFrame:
    """Exact linear-interpolation quantiles per group, computed on a
    distributed sort instead of a group-buffering aggregate.

    For quantile q over n sorted values v_1..v_n the continuous definition
    (DuckDB ``quantile_cont``, SQL ``percentile_cont``) is
    ``pos = 1 + q*(n-1); v = v_lo + (pos-lo)*(v_hi - v_lo)`` with
    lo = floor(pos), hi = ceil(pos). Each input row learns its rank and its
    group size from one window pass (a per-group SORT shuffle — scales as a
    sort, holds nothing per group), contributes weight (1-frac) if it sits
    at lo, frac if at hi (both when lo == hi, where frac = 0), and a plain
    rollup sums the weighted values. Output: one row per group,
    ``out_names`` (default ``q<percent>``) columns rounded to 6 decimals.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    if out_names is None:
        out_names = [f"q{int(round(q * 100))}" for q in qs]
    if len(out_names) != len(qs):
        raise ValueError(f"{len(qs)} quantiles but {len(out_names)} names")
    groups = [F.col(c) for c in group_cols]
    w = Window.partitionBy(*groups).orderBy(F.col(value_col).asc())
    wn = Window.partitionBy(*groups)
    ranked = df.select(
        *group_cols,
        F.col(value_col).cast("double").alias("__v"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    aggs = []
    for q, name in zip(qs, out_names):
        pos = F.lit(1.0) + F.lit(float(q)) * (F.col("__n") - 1)
        lo = F.floor(pos)
        hi = F.ceil(pos)
        frac = pos - lo
        weight = (
            F.when((F.col("__rn") == lo) & (lo == hi), F.lit(1.0))
            .when(F.col("__rn") == lo, F.lit(1.0) - frac)
            .when(F.col("__rn") == hi, frac)
            .otherwise(F.lit(0.0))
        )
        aggs.append(F.round(F.sum(weight * F.col("__v")), 6).alias(name))
    return ranked.groupBy(*group_cols).agg(*aggs)


def corpus_datacard(
    documents: DataFrame,
    group_cols: Sequence[str] = ("source", "lang"),
    text_col: str = "text",
    id_col: str = "doc_id",
    approx: bool = False,
) -> DataFrame:
    """One row per corpus slice:

    (group_cols..., n_docs, n_blank, total_tokens, total_chars, avg_tokens,
    median_tokens, p95_tokens, vocab_size)

    ``n_blank`` counts documents whose text is empty/whitespace;
    ``vocab_size`` is the slice's distinct cleaned-token count (lowercased,
    punctuation-stripped, stopwords kept). Three exchanges total — the
    rollup, the quantile sort, the vocab distinct — all keyed on the group;
    the final joins are group-cardinality broadcasts.

    ``approx=True`` is the 100 TB reporting path: vocab_size switches to
    HyperLogLog++ (``approx_count_distinct``, default 5% rsd — the exact
    distinct shuffles every (group, token) pair; HLL ships one fixed-size
    sketch per group per partition) and the quantiles to t-digest
    ``approx_percentile``, which rides INSIDE the base rollup (no second
    scan, no per-group sort, no quantile join — one exchange fewer than
    the exact path). Same schema; one semantic difference beyond sketch
    error: ``approx_percentile`` returns an actual data ELEMENT where the
    exact path interpolates between straddling ranks, so on tiny groups
    the two modes legitimately differ (corpus-level relative error is
    pinned by ``tests/test_datacard.py::test_approx_mode_error_bounds``).
    """
    gc = list(group_cols)
    counted = documents.select(
        *gc, token_count(F.col(text_col)).alias("__nt"), F.length(text_col).alias("__nc")
    )
    base_aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("__nt") == 0).cast("int")).cast("long").alias("n_blank"),
        F.sum("__nt").cast("long").alias("total_tokens"),
        F.sum("__nc").cast("long").alias("total_chars"),
        F.round(F.avg("__nt"), 6).alias("avg_tokens"),
    ]
    if approx:
        base_aggs += [
            F.round(F.expr("approx_percentile(__nt, 0.5)").cast("double"), 6).alias(
                "median_tokens"
            ),
            F.round(F.expr("approx_percentile(__nt, 0.95)").cast("double"), 6).alias(
                "p95_tokens"
            ),
        ]
    base = counted.groupBy(*gc).agg(*base_aggs)
    if not approx:
        quants = exact_quantiles(
            counted, gc, "__nt", (0.5, 0.95), ("median_tokens", "p95_tokens")
        )
        base = base.join(F.broadcast(quants), gc)
    token_stream = documents.select(
        *gc,
        F.explode(F.filter(tokens(F.col(text_col)), lambda t: t != "")).alias("__t"),
    )
    vocab = token_stream.groupBy(*gc).agg(
        (
            F.approx_count_distinct("__t") if approx else F.countDistinct("__t")
        ).alias("vocab_size")
    )
    return base.join(F.broadcast(vocab), gc, "left").select(
        *gc,
        "n_docs",
        "n_blank",
        "total_tokens",
        "total_chars",
        "avg_tokens",
        "median_tokens",
        "p95_tokens",
        F.coalesce("vocab_size", F.lit(0)).cast("long").alias("vocab_size"),
    )


def vocab_growth(
    documents: DataFrame,
    n_points: int = 20,
    salt: str = "growth-v1",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(point, n_docs, n_tokens, vocab_size): the vocabulary-growth
    (Heaps' law) curve — how many DISTINCT terms the corpus has after its
    first k docs, sampled at ``n_points`` evenly-spaced prefixes of a
    deterministic salted-hash document order (so "first k docs" is a
    stable random sample, not ingestion order). Sub-linear growth is the
    healthy-corpus signature; a curve bending back toward linear flags
    unbounded junk vocabulary (OCR noise, serial numbers) that a vocab
    cap or quality gate should see.

    Computed WITHOUT any sequential pass OR global sort: the bucket is
    the doc's salted hash mod n_points — a pure map-side assignment, so
    each bucket is an independent ~1/n_points random sample and the
    cumulative buckets are exactly the random prefixes the curve needs
    (bucket sizes are multinomial rather than exactly equal; the n_docs
    column reports the actual counts). Each term's FIRST bucket is one
    min-aggregate and the curve is a running sum over the n_points-row
    histogram. Two scans of the cheap projection (doc stats + the token
    stream) — nothing corpus-sized is sorted, pinned, or single-tasked.
    """
    if n_points < 1:
        raise ValueError(f"n_points must be >= 1, got {n_points}")
    from ..functions.hashing import md5_int60

    positioned = documents.select(
        F.col(text_col).alias("__text"),
        (
            F.pmod(
                md5_int60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
                F.lit(n_points),
            )
            + 1
        ).cast("int").alias("bucket"),
    )
    doc_stats = positioned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("__docs"),
        F.sum(F.coalesce(token_count(F.col("__text")), F.lit(0))).alias("__toks"),
    )
    first_seen = (
        positioned.select(
            "bucket",
            F.explode(F.filter(tokens(F.col("__text")), lambda t: t != "")).alias("__t"),
        )
        .groupBy("__t")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("__new_terms"))
    )
    run = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        doc_stats.join(first_seen, "bucket", "left")
        .select(
            F.col("bucket").alias("point"),
            F.sum("__docs").over(run).cast("long").alias("n_docs"),
            F.sum("__toks").over(run).cast("long").alias("n_tokens"),
            F.sum(F.coalesce(F.col("__new_terms"), F.lit(0)))
            .over(run)
            .cast("long")
            .alias("vocab_size"),
        )
        .orderBy("point")
    )


def zipf_fit(
    documents: DataFrame,
    min_count: int = 2,
    text_col: str = "text",
) -> tuple[float, float]:
    """(alpha, r2): least-squares slope of the log-log rank-frequency
    curve — the Zipf exponent (natural corpora sit near alpha ~ 1;
    Zipf 1949, Piantadosi 2014 review). A corpus whose alpha drifts far
    below 1 is dominated by a flat junk vocabulary; far above, by
    boilerplate repetition of a tiny vocabulary — both are datacard red
    flags this scalar makes monitorable.

    Frequencies aggregate from the token stream (one exchange); ranks
    come from a vocab-sized window sort; the regression is a single
    closed-form aggregate over (ln rank, ln freq) pairs — nothing leaves
    the executors but the 1-row moment vector. ``min_count`` drops the
    hapax tail where discretization flattens the curve.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    freqs = (
        documents.select(
            F.explode(F.filter(tokens(F.col(text_col)), lambda t: t != "")).alias("__t")
        )
        .groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__f"))
        .where(F.col("__f") >= min_count)
    )
    ranked = freqs.select(
        F.log(F.row_number().over(Window.orderBy(F.desc("__f"), F.asc("__t"))).cast("double")).alias("x"),
        F.log(F.col("__f").cast("double")).alias("y"),
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).collect()[0]
    if m["n"] is None or m["n"] < 2:
        # an empty filtered vocabulary yields NULL sums — no curve to fit
        return 0.0, 0.0
    n, sx, sy, sxy, sxx, syy = (float(m[c]) for c in ("n", "sx", "sy", "sxy", "sxx", "syy"))
    cov = sxy - sx * sy / n
    var_x = sxx - sx * sx / n
    var_y = syy - sy * sy / n
    if var_x <= 0 or var_y <= 0:
        return 0.0, 0.0
    slope = cov / var_x
    r2 = (cov * cov) / (var_x * var_y)
    return round(-slope, 6), round(r2, 6)
