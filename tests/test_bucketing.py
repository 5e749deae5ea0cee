"""Bucketed layout removes the join/agg shuffle — plan-level proof."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.sources.bucketing import (
    table_df,
    write_bucketed,
)
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, sf_dir, "orders", fan_out=False)
    customer = load_table(spark, sf_dir, "customer", fan_out=False)
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "orders_b", str(base / "orders"), ["custkey"], n_buckets=8,
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"),
        "customer_b", str(base / "customer"), ["custkey"], n_buckets=8,
    )
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """Same-bucketing fact-fact join: zero exchanges (shuffle paid once at
    write time). Broadcast disabled to expose the merge-join path."""
    o, c = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = table_df(spark, o).join(table_df(spark, c), "custkey")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    # every order row with a matching customer row survives
    assert n > 0


def test_bucketed_agg_skips_exchange(spark, bucketed_tables):
    o, _ = bucketed_tables
    agg = table_df(spark, o).groupBy("custkey").agg(F.count(F.lit(1)).alias("n"))
    assert "Exchange" not in _plan(agg)


def test_bucketed_results_equal_plain(spark, sf_dir, bucketed_tables):
    """Layout never changes results."""
    o, c = bucketed_tables
    plain = (
        load_table(spark, sf_dir, "orders", fan_out=False)
        .join(
            load_table(spark, sf_dir, "customer", fan_out=False),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bucketed = (
        table_df(spark, o).join(table_df(spark, c), "custkey")
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    p = {r[0]: r["n"] for r in plain.collect()}
    b = {r[0]: r["n"] for r in bucketed.collect()}
    assert p == b


def test_date_partitioned_scan_prunes(spark, sf_dir, tmp_path_factory):
    from document_clustering_with_hadoop_mapreduce_spark.sources.bucketing import (
        write_date_partitioned,
    )

    path = str(tmp_path_factory.mktemp("part") / "events")
    events = load_table(spark, sf_dir, "events", fan_out=False)
    write_date_partitioned(events, path, "ts")
    back = spark.read.parquet(path)
    one_day = back.select("dt").distinct().orderBy("dt").limit(1).collect()[0]["dt"]
    filtered = back.filter(F.col("dt") == one_day)
    plan = _plan(filtered)
    assert "PartitionFilters" in plan and "dt" in plan.split("PartitionFilters")[1][:120]
    # pruned scan reads exactly that day's rows
    want = events.filter(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd") == one_day).count()
    assert filtered.count() == want


def test_compact_to_target_bytes(spark, sf_dir, tmp_path_factory):
    """A heavily-filtered frame compacts into the computed file count, the
    data round-trips exactly, and a bigger target yields fewer files."""
    import glob

    from document_clustering_with_hadoop_mapreduce_spark.sources.bucketing import (
        compact_to_target_bytes,
    )

    docs = load_table(spark, sf_dir, "documents", fan_out=False).repartition(32)
    filtered = docs.filter(F.col("doc_id") % 10 == 0)  # 90% cut on 32 parts
    out = str(tmp_path_factory.mktemp("compact") / "out")
    n_files = compact_to_target_bytes(filtered, out, target_mb=1)
    parts = glob.glob(f"{out}/part-*.parquet")
    assert len(parts) == n_files
    back = spark.read.parquet(out)
    assert back.count() == filtered.count()
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in filtered.select("doc_id").collect()
    )
    # a 256 MB target on a tiny frame must collapse to one file
    out2 = str(tmp_path_factory.mktemp("compact") / "out2")
    assert compact_to_target_bytes(filtered, out2, target_mb=256) == 1
    assert len(glob.glob(f"{out2}/part-*.parquet")) == 1


def test_compact_empty_frame(spark, sf_dir, tmp_path_factory):
    from document_clustering_with_hadoop_mapreduce_spark.sources.bucketing import (
        compact_to_target_bytes,
    )

    docs = load_table(spark, sf_dir, "documents", fan_out=False).filter(F.lit(False))
    out = str(tmp_path_factory.mktemp("compact") / "empty")
    assert compact_to_target_bytes(docs, out, target_mb=64) == 1
    assert spark.read.parquet(out).count() == 0
