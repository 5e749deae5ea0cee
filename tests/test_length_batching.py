"""length_bucket_batches: DuckDB oracle parity, padding-waste reduction vs
naive batching, batch-shape invariants, determinism."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
    length_bucket_batches,
)

B, STREAMS = 8, 4


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_matches_duckdb_oracle(spark, sf_dir, docs):
    got = sorted(
        (r.doc_id, r.stream, r.batch, r.pos_in_batch, r.batch_max_tokens)
        for r in length_bucket_batches(
            docs, batch_size=B, num_streams=STREAMS, salt="t"
        ).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
WITH staged AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' OR text IS NULL THEN 0
              ELSE len(string_split_regex(trim(text), '[ \t\n\r]+')) END AS n_tokens,
         CAST(CAST(('0x' || substr(md5('t:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % {STREAMS} AS INT) AS stream
  FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY stream ORDER BY n_tokens, doc_id) - 1 AS rn
  FROM staged
),
batched AS (
  SELECT doc_id, n_tokens, stream,
         CAST(rn // {B} AS INT) AS batch, rn % {B} AS pos_in_batch
  FROM ranked
)
SELECT doc_id, stream, batch, pos_in_batch,
       max(n_tokens) OVER (PARTITION BY stream, batch) AS batch_max_tokens
FROM batched
"""
        ).fetchall()
    )
    assert got == want


def test_padding_waste_beats_unsorted_batching(spark, docs):
    out = length_bucket_batches(docs, batch_size=B, num_streams=STREAMS).collect()
    total = sum(r.n_tokens for r in out)
    bucketed_padded = sum(r.batch_max_tokens for r in out)
    # naive comparison: same streams/batch size but batches formed in
    # doc_id order (what you get without the length sort)
    by_stream: dict = {}
    for r in sorted(out, key=lambda r: (r.stream, r.doc_id)):
        by_stream.setdefault(r.stream, []).append(r.n_tokens)
    naive_padded = 0
    for lens in by_stream.values():
        for i in range(0, len(lens), B):
            chunk = lens[i : i + B]
            naive_padded += max(chunk) * len(chunk)
    assert total <= bucketed_padded < naive_padded
    # on real length-diverse docs, bucketing should cut the padding
    # OVERHEAD (padded minus real tokens) by a wide margin
    assert (bucketed_padded - total) < 0.5 * (naive_padded - total)


def test_batch_shapes_and_determinism(spark, docs):
    a = length_bucket_batches(docs, batch_size=B, num_streams=STREAMS)
    sizes = a.groupBy("stream", "batch").agg(
        F.count(F.lit(1)).alias("n"), F.max("batch").alias("mb")
    )
    # every batch except possibly the LAST of each stream is exactly B
    bad = (
        sizes.join(
            sizes.groupBy("stream").agg(F.max("batch").alias("last_b")), "stream"
        )
        .where((F.col("batch") != F.col("last_b")) & (F.col("n") != B))
        .count()
    )
    assert bad == 0
    # deterministic re-run
    b = length_bucket_batches(docs, batch_size=B, num_streams=STREAMS)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # batch_id globally unique per (stream, batch)
    n_ids = a.select("batch_id").distinct().count()
    n_sb = a.select("stream", "batch").distinct().count()
    assert n_ids == n_sb


def test_single_exchange_plan(spark, docs):
    plan = (
        length_bucket_batches(docs, batch_size=B, num_streams=STREAMS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "rangepartitioning" not in plan  # never a global sort


def test_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError):
        length_bucket_batches(df, batch_size=0)
    with pytest.raises(ValueError):
        length_bucket_batches(df, num_streams=0)


def test_null_text_counts_zero_tokens(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "three token doc")], "doc_id int, text string"
    )
    out = {r.doc_id: (r.n_tokens, r.batch_max_tokens) for r in
           length_bucket_batches(df, batch_size=2, num_streams=1).collect()}
    assert out[1][0] == 0 and out[2][0] == 0 and out[3][0] == 3
    # the padding accounting stays consistent: no NULLs anywhere
    assert all(v is not None for pair in out.values() for v in pair)
