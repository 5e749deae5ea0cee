"""Sequence packing (concat-and-chunk): DuckDB oracle parity on the fixture
corpus, closed-form semantics on a hand-built frame, determinism under
reordering/repartitioning, and the one-exchange plan shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import sequence_pack
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table

from conftest import assert_matches_oracle

MAX_TOKENS = 64
STREAMS = 8

# Mirrors sequence_pack exactly: same salted md5-60bit stream hash
# (functions/hashing.py::md5_int60), same whitespace token count, same
# per-stream cumulative-sum chunking.
_ORACLE = f"""
WITH c AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('pack-v1:' || doc_id), 1, 15)) AS BIGINT) % {STREAMS} AS stream,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(string_split_regex(trim(text), '[ \t\n\r]+')) END)::BIGINT AS n_tokens
  FROM documents
),
s AS (
  SELECT doc_id, stream, n_tokens,
         -- sum(BIGINT) is HUGEINT in DuckDB; pin back to BIGINT like Spark
         (sum(n_tokens) OVER (PARTITION BY stream ORDER BY doc_id) - n_tokens)::BIGINT AS global_start
  FROM c
)
SELECT doc_id, stream,
       CAST(floor(global_start / {MAX_TOKENS}) AS BIGINT) AS seq,
       stream * 4294967296 + CAST(floor(global_start / {MAX_TOKENS}) AS BIGINT) AS seq_id,
       (global_start % {MAX_TOKENS})::BIGINT AS "offset",
       global_start, n_tokens
FROM s"""


def test_sequence_pack_matches_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    df = sequence_pack(docs, max_tokens=MAX_TOKENS, num_streams=STREAMS)
    assert_matches_oracle(df, duck, _ORACLE)


def test_sequence_pack_closed_form(spark):
    # one stream so the packing order is just doc_id order: docs of 10, 60,
    # 10, 50 tokens into capacity-64 sequences
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in [(1, 10), (2, 60), (3, 10), (4, 50)]],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in sequence_pack(docs, max_tokens=64, num_streams=1).collect()
    }
    # cumulative starts: 0, 10, 70, 80
    assert [out[i]["global_start"] for i in (1, 2, 3, 4)] == [0, 10, 70, 80]
    # doc 2 STARTS in seq 0 (offset 10) and straddles into seq 1
    assert (out[2]["seq"], out[2]["offset"]) == (0, 10)
    assert (out[3]["seq"], out[3]["offset"]) == (1, 6)
    assert (out[4]["seq"], out[4]["offset"]) == (1, 16)
    assert all(r["stream"] == 0 for r in out.values())
    assert all(r["seq_id"] == r["seq"] for r in out.values())  # stream 0


def test_sequence_pack_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    df = sequence_pack(docs, max_tokens=MAX_TOKENS, num_streams=STREAMS)
    bad = df.filter(
        (F.col("offset") < 0)
        | (F.col("offset") >= MAX_TOKENS)
        | (F.col("seq") != F.floor(F.col("global_start") / MAX_TOKENS))
        | (F.col("seq_id") != F.col("stream") * (1 << 32) + F.col("seq"))
    )
    assert bad.count() == 0
    # per stream the starts tile the concatenated token stream exactly:
    # sum of member token counts == max(global_start + n_tokens)
    agg = df.groupBy("stream").agg(
        F.sum("n_tokens").alias("mass"),
        F.max(F.col("global_start") + F.col("n_tokens")).alias("end"),
    )
    assert agg.filter(F.col("mass") != F.col("end")).count() == 0
    # every doc appears exactly once
    assert df.count() == docs.count()


def test_sequence_pack_deterministic_under_reordering(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sequence_pack(docs, max_tokens=MAX_TOKENS, num_streams=STREAMS)
    shuffled = docs.orderBy(F.reverse(F.col("text"))).repartition(13)
    b = sequence_pack(shuffled, max_tokens=MAX_TOKENS, num_streams=STREAMS)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_sequence_pack_plan_one_exchange_no_python(spark, sf_dir):
    """100 TB shape: one hash exchange on the stream key feeding the window
    sort — never a global single-partition sort, never a Python stage."""
    docs = load_table(spark, sf_dir, "documents", fan_out=False)
    plan = (
        sequence_pack(docs, max_tokens=MAX_TOKENS, num_streams=STREAMS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan and "rangepartitioning" not in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_sequence_pack_validation(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_tokens"):
        sequence_pack(docs, max_tokens=0)
    with pytest.raises(ValueError, match="num_streams"):
        sequence_pack(docs, num_streams=0)


def test_seq_id_overflow_guard_raises_loudly(spark):
    """ADVICE r10: a stream past 2^32 sequences must FAIL, not silently
    collide seq_ids into the next stream's id space. The guard is an
    in-plan raise — exercised here on a synthetic (stream, seq) frame
    (a real overflow needs 2^32 * max_tokens tokens in one stream)."""
    from py4j.protocol import Py4JJavaError
    from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
        _seq_overflow_guard,
    )

    ok = spark.createDataFrame([(0, (1 << 32) - 1)], "stream long, seq long")
    assert ok.select(
        (F.col("stream") * F.lit(1 << 32) + _seq_overflow_guard(256)).alias("seq_id")
    ).collect()[0]["seq_id"] == (1 << 32) - 1

    bad = spark.createDataFrame([(0, 1 << 32)], "stream long, seq long")
    with pytest.raises(Exception, match="exceeded 2\\^32 sequences"):
        bad.select(
            (F.col("stream") * F.lit(1 << 32) + _seq_overflow_guard(256)).alias("x")
        ).collect()
