"""Exact distributed heavy hitters (frequent n-grams) in two bounded passes.

Boilerplate detection at corpus scale: which word n-grams occur at least
``min_count`` times corpus-wide? (Repeated site headers, licence blurbs,
navigation strings — the spans a curation pipeline wants to surface before
deciding what ``cut_duplicate_spans`` should remove.) The naive plan —
``groupBy`` every n-gram string — shuffles the ENTIRE n-gram stream: at
100 TB the n-gram stream is corpus-sized with long string keys, and almost
all of those keys are singletons that could never survive the HAVING
filter. The classic fix is the count-min / candidate two-pass scheme:

pass 1  hash every n-gram into ``n_buckets`` and count BUCKETS. The
        shuffle key space is bounded by ``n_buckets`` (a parameter, not a
        data size), map-side partial aggregation collapses each partition
        to at most ``n_buckets`` rows before the exchange, and the result
        is a model-sized table. Since every gram in a bucket contributes
        to that bucket's count, ``bucket_cnt >= true count`` of each of
        its grams — so {buckets with count >= min_count} covers every
        heavy gram's bucket. No false negatives, by construction.

pass 2  re-stream the n-grams, keep only those hashing into a candidate
        bucket (broadcast-semi-join — the candidate set has at most
        ``total_grams / min_count`` rows, bounded further by
        ``n_buckets``), and exact-count the survivors. The exact string
        groupBy now shuffles only the candidate slice — the grams that
        share a bucket with something heavy.

The final result is EXACT (pass 2's HAVING removes every false positive
the bucket collisions admitted), so the operator is DuckDB-oracle-checked
bit-for-bit (tests/test_heavyhitters.py) even though the machinery is
sketch-shaped. Two corpus scans is the price of exactness with bounded
memory — the same trade ExactSubstr (operators/dedup.py::duplicate_spans)
makes, and strictly better than one scan + an unbounded hash table.

Sizing: collisions only cost pass-2 shuffle volume, never correctness.
With n_buckets >> distinct_grams / min_count the candidate slice
approaches the truly-heavy grams alone; the default 2**20 buckets is
16 MB of partial-agg state per task. A degenerate min_count (e.g. 1)
makes every bucket a candidate and pass 2 an ordinary exact count —
semantically fine, scale guarantee gone (documented, not guarded).

No reference parity row: the reference has no frequency-mining surface;
this extends its token pipeline (tokenization per
sources/1.1/source/task1_1.java semantics, re-expressed in
``functions.text``) into the curation family, next to ``duplicate_spans``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int60
from ..functions.text import tokens


def _gram_strings(toks: Column, n: int) -> Column:
    """Array of space-joined n-token windows, counts preserved (NOT
    distinct — frequency is the point). Short docs (size < n) yield an
    empty array: sequence() would otherwise generate a DESCENDING [1, 0]
    for the degenerate bound (same guard as ``dedup.shingle_hashes``)."""
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def _gram_stream(docs: DataFrame, n: int, text_col: str) -> DataFrame:
    """One-column (ngram) stream, one map-side explode. The token array is
    materialized in its OWN projection before the gram lambda touches it —
    referencing ``tokens(text)`` inside the transform makes Catalyst
    re-split the full text once per gram (O(len^2) per doc, the measured
    trap documented at ``dedup._tokenized``)."""
    tokenized = docs.select(
        F.filter(tokens(F.col(text_col)), lambda t: t != "").alias("__toks")
    )
    return tokenized.select(
        F.explode(_gram_strings(F.col("__toks"), n)).alias("ngram")
    )


def heavy_buckets(
    grams: DataFrame, min_count: int, n_buckets: int
) -> DataFrame:
    """Pass 1: (bucket, bucket_cnt) for buckets whose total >= min_count —
    a superset of every gram with true count >= min_count."""
    return (
        grams.select(F.pmod(md5_int60(F.col("ngram")), F.lit(n_buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("bucket_cnt"))
        .filter(F.col("bucket_cnt") >= min_count)
    )


def frequent_ngrams(
    docs: DataFrame,
    n: int = 3,
    min_count: int = 5,
    n_buckets: int = 1 << 20,
    text_col: str = "text",
) -> DataFrame:
    """(ngram, cnt): every word n-gram with exact corpus count >= min_count.

    Two corpus scans (pass 1 bucket counts, pass 2 exact recount of the
    candidate slice); the only shuffles are the n_buckets-bounded bucket
    aggregate and the candidate-slice string aggregate; the only broadcast
    is the candidate bucket list (<= total_grams/min_count rows). The
    candidate filter is a broadcast LEFT SEMI join, so the heavy gram
    stream never carries the bucket-count payload.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    grams = _gram_stream(docs, n, text_col)
    cand = heavy_buckets(grams, min_count, n_buckets).select("bucket")
    return exact_recount(grams, cand, min_count, n_buckets)


def exact_recount(
    grams: DataFrame, cand_buckets: DataFrame, min_count: int, n_buckets: int
) -> DataFrame:
    """Pass 2 as its own operator, so candidate buckets can come from
    elsewhere — e.g. the streaming bucket-count store
    (``streaming.events_stream.stream_gram_bucket_counts``), whose
    accumulated totals a closed stream finalizes through this same exact
    pass."""
    return (
        grams.withColumn("bucket", F.pmod(md5_int60(F.col("ngram")), F.lit(n_buckets)))
        .join(F.broadcast(cand_buckets.select("bucket")), "bucket", "left_semi")
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def frequent_ngrams_oracle_sql(
    n: int = 3, min_count: int = 5, source: str = "documents"
) -> str:
    """DuckDB mirror: the straight exact n-gram count with HAVING — the
    two-pass plan must equal it bit-for-bit (that is the exactness claim).
    Tokenization mirrors ``functions.text.tokens`` via the same constants
    as ``plans/oracles.py``."""
    from ..functions.text import CLEAN_RE_DUCKDB, SPLIT_RE

    return f"""
WITH docs_t AS (
  SELECT list_filter(
           string_split_regex(regexp_replace(lower(text), '{CLEAN_RE_DUCKDB}', '', 'g'), '{SPLIT_RE}'),
           t -> t <> '') AS toks
  FROM {source}
),
grams AS (
  SELECT array_to_string(toks[i:i+{n - 1}], ' ') AS ngram
  FROM docs_t, UNNEST(generate_series(1, len(toks) - {n - 1})) AS t(i)
  WHERE len(toks) >= {n}
)
SELECT ngram, count(*)::BIGINT AS cnt
FROM grams GROUP BY ngram HAVING count(*) >= {min_count}"""
