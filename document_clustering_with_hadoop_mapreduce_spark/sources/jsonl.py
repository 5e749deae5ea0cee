"""JSONL corpus I/O — the interchange format LLM training corpora actually
arrive in (one JSON object per line, typically gzip-compressed shards).

Scale notes: the reader takes an EXPLICIT schema, so there is no
schema-inference pre-pass over 100 TB; Spark splits uncompressed JSONL by
byte range and parallelizes gzip shards per file (compress to many shards,
not one).

Malformed-line policy (reference P7, skip bad rows, but made STABLE):
Spark's own DROPMALFORMED drops a projection-dependent row set (corruption
is only detected in columns a query actually parses — two consumers of the
same frame can see different row counts), so the reader scans with
``spark.read.text`` and parses each line via a single full-schema
``from_json`` projection (PERMISSIVE, explicit ``_corrupt_record``
column). The drop is then an ordinary predicate over that projection —
one deterministic row set regardless of downstream projection, because
the filter expression always parses the whole line against the full
schema no matter which columns a consumer keeps. Crucially this needs NO
materialization: unlike filtering a just-parsed JSON relation's corrupt
column (SPARK-21610), a ``from_json`` expression carries no such
restriction, so the 100 TB ingest stays a streaming scan→project→filter
pipeline with full lineage (recompute-on-executor-loss intact). With
``drop_malformed=False`` the raw offending line is preserved in
``_corrupt_record`` (NULL for good rows), which is what a
quarantine/audit job needs to route bad input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tables import SCHEMAS

DOCUMENTS_SCHEMA = SCHEMAS["documents"]
CORRUPT_COL = "_corrupt_record"

_READ_SCHEMA = T.StructType(
    list(DOCUMENTS_SCHEMA.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    drop_malformed: bool = True,
) -> DataFrame:
    """Documents from JSONL (plain or .gz), fixed schema, no inference job.

    ``drop_malformed=True`` filters corrupt lines out (stable,
    projection-independent — see module docstring) and returns exactly the
    documents schema; ``False`` keeps them, with the raw line in
    ``_corrupt_record`` for quarantine routing."""
    df = (
        spark.read.text(path)
        # the native JSON reader silently skips blank lines; mirror that
        .where(F.length(F.trim(F.col("value"))) > 0)
        .select(
            F.from_json(
                F.col("value"),
                _READ_SCHEMA,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("__parsed")
        )
        .select("__parsed.*")
    )
    if drop_malformed:
        return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return df


def write_documents_jsonl(
    df: DataFrame, path: str, compression: str | None = "gzip", shards: int | None = None
) -> None:
    """Documents to JSONL shards (gzip by default — one file per task, so
    ``shards`` controls shard count via repartition; None keeps the input
    partitioning, which is the right call for large writes)."""
    out = df.repartition(shards) if shards else df
    writer = out.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
