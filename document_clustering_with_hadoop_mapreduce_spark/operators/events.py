"""Event-stream analytics (batch forms; streaming twins in ``streaming/``).

The reference has zero streaming/event operators (SURVEY.md §2.5) — this is
north-star surface. Batch forms are oracle-checkable; the structured-
streaming twins in ``streaming.events_stream`` share the same aggregation
logic and are equivalence-tested against these (tests/test_streaming.py).

Scale notes: hourly rollup is one exchange on (hour, type); sessionization
is one exchange on user_id + an in-partition sort — the standard
gaps-and-islands plan, no driver state, watermark-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .relational import dsum

SESSION_GAP_MINUTES = 30


def events_hourly(events: DataFrame) -> DataFrame:
    """Tumbling 1h window x event_type: count + exact value sum."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), 4).alias("sum_value"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Gaps-and-islands sessionization: a session breaks after a
    ``gap_minutes`` silence. Per-session stats, exact micros arithmetic."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col("ts"))
    with_breaks = events.withColumn(
        "is_new",
        F.when(us - F.lag(us, 1).over(w) > gap_us, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int"),
    ).withColumn("session_idx", F.sum("is_new").over(wrun))
    return (
        with_breaks.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round((F.max(us) - F.min(us)) / 1_000_000.0, 6).alias("duration_sec"),
            dsum(F.col("value"), 4).alias("sum_value"),
        )
    )


def user_activity(events: DataFrame) -> DataFrame:
    """Per-user activity profile: events, distinct active days, value sum."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(F.date_trunc("day", F.col("ts"))).alias("active_days"),
        dsum(F.col("value"), 4).alias("sum_value"),
    )


def events_rollup(events: DataFrame) -> DataFrame:
    """Multi-granularity rollup in ONE pass via grouping sets — the
    hypertable-style pre-aggregation a 100 TB event store materializes:
    (day, event_type), (day), (event_type), and grand total, each row
    tagged with its grouping level. One shuffle; Spark expands the sets
    map-side (Expand operator), so the fact table is still read once.
    """
    day = F.date_trunc("day", F.col("ts")).alias("day")
    return events.cube(day, F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 4
        ).alias("sum_value"),
        F.grouping_id().cast("int").alias("lvl"),
    )
