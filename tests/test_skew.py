"""Salting never changes results — equality with the direct plans, on a
deliberately skewed input (90% of rows share one key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.skew import (
    salted_broadcast_join,
    salted_count,
    salted_sum,
)


def _skewed(spark):
    # key 0 holds 9000 rows; keys 1..99 hold ~10 each
    return spark.range(10000).select(
        F.when(F.col("id") < 9000, F.lit(0)).otherwise((F.col("id") % 99) + 1).alias("k"),
        (F.col("id") * 3 % 7).cast("double").alias("v"),
    )


def test_salted_sum_equals_direct(spark):
    df = _skewed(spark)
    direct = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r["k"]: r["total"] for r in salted_sum(df, ["k"], "v", "total").collect()}
    assert salted == direct


def test_salted_count_equals_direct(spark):
    df = _skewed(spark)
    direct = {r["k"]: r["n"] for r in df.groupBy("k").count().withColumnRenamed("count", "n").collect()}
    salted = {r["k"]: r["n"] for r in salted_count(df, ["k"]).collect()}
    assert salted == direct


def test_salted_join_equals_direct(spark):
    big = _skewed(spark)
    small = spark.range(100).select(
        F.col("id").cast("int").alias("k"), (F.col("id") * 2).alias("w")
    )
    direct = big.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    salted = salted_broadcast_join(big, small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    d = {r["k"]: (r["n"], r["sw"]) for r in direct.collect()}
    s = {r["k"]: (r["n"], r["sw"]) for r in salted.collect()}
    assert d == s


def test_identical_rows_spread_via_stable_id(spark):
    """The hot keys salting exists for (the empty document, a default
    category) are frequently BYTE-IDENTICAL rows — the content-hash
    fallback sends all of them to ONE salt (deterministic but zero
    spread). The supported escape is ``with_stable_row_id`` + id_cols:
    the pinned id is data (checkpointed), so the salt is deterministic
    AND identical rows fan over many salts, while results stay equal."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.skew import (
        _row_salt,
        with_stable_row_id,
    )

    # 5,000 byte-identical rows (one hot key, one constant value)
    df = spark.range(5000).select(F.lit(0).alias("k"), F.lit(1.0).alias("v"))

    # Content-hash fallback: deterministic, documented zero spread here.
    n_fallback = (
        df.withColumn(
            "s", _row_salt(16, id_cols=None, fallback_cols=df.columns)
        )
        .select("s")
        .distinct()
        .count()
    )
    assert n_fallback == 1

    # with_stable_row_id + id_cols: spread restored, results unchanged.
    pinned = with_stable_row_id(df)
    n_distinct = (
        pinned.withColumn(
            "s", _row_salt(16, id_cols=["__row_id"], fallback_cols=pinned.columns)
        )
        .select("s")
        .distinct()
        .count()
    )
    assert n_distinct > 8, f"identical rows landed on {n_distinct} salt(s)"
    got = {
        r["k"]: r["total"]
        for r in salted_sum(
            pinned, ["k"], "v", "total", id_cols=["__row_id"]
        ).collect()
    }
    assert got == {0: 5000.0}
    cnt = {
        r["k"]: r["n"]
        for r in salted_count(pinned, ["k"], id_cols=["__row_id"]).collect()
    }
    assert cnt == {0: 5000}


def test_salt_is_deterministic_across_evaluations(spark):
    """The salt is a shuffle key, so it must be a pure function of row
    data: evaluating the salt expression twice over the same rows must
    give identical values (a position-derived salt fails this whenever
    partitioning shifts — the stage-retry hazard)."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.skew import (
        _row_salt,
    )

    df = _skewed(spark).withColumn("rid", F.col("v") + F.col("k") * 100)
    salt = _row_salt(16, id_cols=["rid"], fallback_cols=df.columns)
    a = df.withColumn("s", salt).groupBy("s").count()
    b = df.repartition(7).withColumn("s", salt).groupBy("s").count()
    da = {r["s"]: r["count"] for r in a.collect()}
    db = {r["s"]: r["count"] for r in b.collect()}
    assert da == db


def test_salted_join_with_id_cols(spark):
    big = _skewed(spark).withColumn("rid", F.monotonically_increasing_id())
    big = big.localCheckpoint(eager=True)
    small = spark.range(100).select(
        F.col("id").cast("int").alias("k"), (F.col("id") * 2).alias("w")
    )
    direct = big.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    salted = salted_broadcast_join(big, small, "k", id_cols=["rid"]).groupBy(
        "k"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
    d = {r["k"]: (r["n"], r["sw"]) for r in direct.collect()}
    s = {r["k"]: (r["n"], r["sw"]) for r in salted.collect()}
    assert d == s
