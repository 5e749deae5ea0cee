"""retention_cohorts: DuckDB-oracle parity + closed-form on a planted log."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.events import (
    retention_cohorts,
    retention_oracle_sql,
)

from conftest import assert_matches_oracle


def test_matches_oracle_on_fixture(spark, sf_dir, duck):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = retention_cohorts(events)
    assert_matches_oracle(got, duck, retention_oracle_sql())
    assert got.limit(1).count() == 1


def test_closed_form_planted_cohorts(spark, duck):
    """Two cohorts, known churn: cohort A (users 1-4) fully active week 0,
    half active week 1, one user week 2; cohort B (users 5-6) week 1 only.
    Mondays chosen explicitly so week truncation is unambiguous."""
    w0, w1, w2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 8), dt.datetime(2024, 1, 15)
    rows = []
    for u in (1, 2, 3, 4):
        rows.append((u, w0))
    for u in (1, 2):
        rows.append((u, w1 + dt.timedelta(days=2)))
    rows.append((1, w2))
    rows.append((1, w2 + dt.timedelta(hours=5)))  # dup within week: counted once
    for u in (5, 6):
        rows.append((u, w1))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    duck.register("rc_mini", pdf)
    got = retention_cohorts(spark.createDataFrame(pdf))
    assert_matches_oracle(got, duck, retention_oracle_sql(source="rc_mini"))
    table = {
        (r["cohort_week"].date(), r["weeks_since"]): (r["n_users"], r["retention"])
        for r in got.collect()
    }
    a, b = w0.date(), w1.date()
    assert table == {
        (a, 0): (4, 1.0),
        (a, 1): (2, 0.5),
        (a, 2): (1, 0.25),
        (b, 0): (2, 1.0),
    }


def test_week0_retention_is_always_one(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    bad = (
        retention_cohorts(events)
        .filter((F.col("weeks_since") == 0) & (F.col("retention") != 1.0))
        .count()
    )
    assert bad == 0
