"""JSONL corpus I/O — the interchange format LLM training corpora actually
arrive in (one JSON object per line, typically gzip-compressed shards).

Scale notes: the reader takes an EXPLICIT schema, so there is no
schema-inference pre-pass over 100 TB; Spark splits uncompressed JSONL by
byte range and parallelizes gzip shards per file (compress to many shards,
not one). Malformed lines follow Spark's PERMISSIVE/DROPMALFORMED modes —
the same malformed-row policy as the reference's CSV ingestion (P7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .tables import SCHEMAS

DOCUMENTS_SCHEMA = SCHEMAS["documents"]


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    drop_malformed: bool = True,
) -> DataFrame:
    """Documents from JSONL (plain or .gz), fixed schema, no inference job.

    ``drop_malformed`` mirrors reference P7 (skip bad rows); set False to
    keep them as null-filled rows for quarantine-style auditing."""
    reader = spark.read.schema(DOCUMENTS_SCHEMA)
    mode = "DROPMALFORMED" if drop_malformed else "PERMISSIVE"
    return reader.option("mode", mode).json(path)


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
