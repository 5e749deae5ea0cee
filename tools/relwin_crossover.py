"""Crossover sweep for the per-customer window escapes (round 14,
VERDICT r13 #5): plant ONE hot customer at H rows inside a uniform orders
frame and time the one-pass window form vs its chunked escape at each H.

Usage: python tools/relwin_crossover.py [H ...]   (default 750k 1e6 3e6 1e7)

The timed action is the full-row hash aggregate (bench's relwin `_force`):
count() lets Catalyst prune the cumsum/RANGE columns — the operators under
test. Data is built once per H (deterministic from spark.range), written to
a temp parquet so every timed run scans the same files. Prints one JSON
line {"crossover": {H: {op: {"onepass": s, "chunked": s}}}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_clustering_with_hadoop_mapreduce_spark.operators.relational import (  # noqa: E402
    customer_recent_orders,
    customer_recent_orders_chunked,
    rolling_30d_spend,
    rolling_30d_spend_chunked,
)
from document_clustering_with_hadoop_mapreduce_spark.session import get_spark  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
UNIFORM_ROWS = 1_500_000  # the bench relwin fixture's 10x-orders scale
N_CUST = 15_000


def build(spark, out: str, hot_rows: int) -> None:
    # uniform body + one hot customer (custkey 1) carrying hot_rows extra
    # orders; dates spread over the TPC-H-ish 1992-1998 window so month
    # chunks see realistic calendar widths
    base = spark.range(UNIFORM_ROWS).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % N_CUST + 10).alias("o_custkey"),
        F.date_add(F.lit("1992-01-01").cast("date"), (F.col("id") % 2400).cast("int")).alias(
            "o_orderdate"
        ),
        (F.pmod(F.col("id") * 7919, F.lit(100000)) / 100.0 + 1.0).alias("o_totalprice"),
    )
    hot = spark.range(hot_rows).select(
        (F.col("id") + UNIFORM_ROWS).alias("o_orderkey"),
        F.lit(1).cast("long").alias("o_custkey"),
        F.date_add(F.lit("1992-01-01").cast("date"), (F.col("id") % 2400).cast("int")).alias(
            "o_orderdate"
        ),
        (F.pmod(F.col("id") * 104729, F.lit(100000)) / 100.0 + 1.0).alias("o_totalprice"),
    )
    base.unionByName(hot).write.mode("overwrite").parquet(out)


def force(df) -> None:
    df.agg(F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000)))).collect()


def min_of(fn, n: int = 2) -> float:
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [750_000, 1_000_000, 3_000_000, 10_000_000]
    spark = get_spark("relwin-crossover", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    cust = spark.range(N_CUST + 10).select(
        F.col("id").alias("c_custkey"), F.concat(F.lit("c"), F.col("id")).alias("c_name")
    )
    res: dict = {}
    for h in sizes:
        out = tempfile.mkdtemp(prefix="relwin_xover_")
        try:
            build(spark, f"{out}/orders.parquet", h)
            o = spark.read.parquet(f"{out}/orders.parquet")
            builders = {
                "customer_recent_orders": {
                    "onepass": lambda: customer_recent_orders(cust, o, mode="onepass"),
                    "chunked": lambda: customer_recent_orders_chunked(cust, o),
                },
                "rolling_30d_spend": {
                    "onepass": lambda: rolling_30d_spend(o, mode="onepass"),
                    "chunked": lambda: rolling_30d_spend_chunked(o),
                },
            }
            res[h] = {}
            for op, forms in builders.items():
                spark.sparkContext.setJobDescription(f"xover {op} H={h}")
                for form, b in forms.items():
                    force(b())  # warm-up / compile
                    res[h].setdefault(op, {})[form] = min_of(lambda b=b: force(b()))
        finally:
            shutil.rmtree(out, ignore_errors=True)
        print(json.dumps({"partial": {str(h): res[h]}}), flush=True)
    print(json.dumps({"crossover": {str(h): v for h, v in res.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
