"""Batch/stream equivalence: the streaming twins must produce exactly the
batch results when run over the same closed set of files."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.events import events_hourly
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table
from document_clustering_with_hadoop_mapreduce_spark.streaming.events_stream import (
    read_events_stream,
    run_stream_to_memory,
    stream_hourly_counts,
    stream_user_sessions,
)


def _events_dir(sf_dir: str) -> str:
    return f"{sf_dir}/events.parquet"


def test_stream_hourly_equals_batch(spark, sf_dir):
    stream = stream_hourly_counts(read_events_stream(spark, _events_dir(sf_dir)))
    got = run_stream_to_memory(stream, "hourly_t1")
    want = events_hourly(load_table(spark, sf_dir, "events"))
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w, f"stream != batch: {len(g ^ w)} rows differ"


def test_stream_sessions_sane(spark, sf_dir):
    stream = stream_user_sessions(read_events_stream(spark, _events_dir(sf_dir)))
    got = run_stream_to_memory(stream, "sessions_t1")
    rows = got.collect()
    assert len(rows) > 0
    # session windows must be per-user disjoint and ordered
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["session_start"], r["session_end"]))
    for _, wins in by_user.items():
        wins.sort()
        for (s1, e1), (s2, _) in zip(wins, wins[1:]):
            assert e1 <= s2, "overlapping session windows"
    # event conservation
    total = sum(r["n_events"] for r in rows)
    assert total == load_table(spark, sf_dir, "events").count()
