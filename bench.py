"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import time

from document_clustering_with_hadoop_mapreduce_spark.plans.registry import all_queries
from document_clustering_with_hadoop_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline set: one per capability area (text matrix, tf-idf, per-group topk,
# relational join/agg, window, plus whatever later milestones register).
HEADLINE = [
    "term_doc_matrix",
    "tfidf_standard",
    "category_top_terms",
    "top_terms_global",
    "pricing_summary",
    "revenue_by_nation",
    "top_revenue_orders",
    "customer_recent_orders",
]


def main() -> None:
    spark = get_spark("bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]
    # extend with any registered queries tagged as bench-worthy extensions
    for n, q in sorted(registry.items()):
        if "bench" in q.tags and n not in names:
            names.append(n)

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    # warm the JVM + parquet footers once with a trivial action
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    for name in names:
        q = registry[name]
        # run 1 (cold: includes plan + codegen compile), run 2 (steady state)
        t0 = time.perf_counter()
        assert q.spark(spark, SF_DIR).count() >= 0
        cold[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        assert q.spark(spark, SF_DIR).count() >= 0
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "cold_total": round(sum(cold.values()), 3),
        "cold_queries": cold,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
