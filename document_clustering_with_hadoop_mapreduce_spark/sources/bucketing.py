"""Bucketed-table layout: co-located joins and aggregations.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides.
Writing tables bucketed (and sorted) by the join key moves that shuffle
to WRITE time, once, amortized over every later query: two tables with
the same bucketing on the join key sort-merge-join with ZERO exchanges,
and a groupBy on the bucket key skips its exchange too.

This engine treats bucketing as the storage contract for its fact tables
(orders/lineitem by orderkey or custkey, events by user_id, documents by
doc_id for the text pipelines). The demo + plan assertions live in
tests/test_bucketing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external bucketed parquet table.

    ``sortBy`` on the bucket key makes later merge-joins sort-free as
    well (each bucket file is pre-sorted). Bucket count is a layout
    decision: aim for bucket_size x n_buckets ~ table size with buckets
    in the 100 MB - 1 GB range at target scale."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def table_df(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table — bucketing metadata comes from the
    catalog, so joins/aggs on the bucket key skip their exchange."""
    return spark.table(table)


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str, granularity: str = "day"
) -> None:
    """Write partitioned by event date (`dt=YYYY-MM-DD/` dirs) — the other
    half of the 100 TB layout story: time-filtered scans read only the
    matching partitions (plan shows PartitionFilters, not a full scan).
    Combine with bucketing inside each partition for join co-location."""
    from pyspark.sql import functions as F

    (
        df.withColumn("dt", F.date_format(F.date_trunc(granularity, ts_col), "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(path)
    )
