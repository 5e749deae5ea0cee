"""Full-registry timing sweep: min-of-2 warm wall-time for EVERY registered
query at $SPARK_GRAFT_SF_DIR (default sf0.1), slowest first.

The headline bench (bench.py) keeps a stable comparable subset; this sweep
is the breadth net — round 7 ran it ad hoc and caught three real scale
defects (a degenerate quadratic cosine plan, a one-task SemDeDup hot
cluster, an under-split k-means|| scan) that both the plan-shape tests and
the sf0.01 oracle gate had missed. What isn't measured regresses silently,
so keep this runnable:

    python tools/registry_sweep.py            # all slots
    python tools/registry_sweep.py lsh tfidf  # substring-filtered subset

Prints one JSON line: {"slots": {name: sec}, "total": sec, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import parse_sf
from document_clustering_with_hadoop_mapreduce_spark.plans.registry import all_queries
from document_clustering_with_hadoop_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    filters = [a for a in sys.argv[1:] if not a.startswith("-")]
    spark = get_spark("registry-sweep", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    names = [
        n for n in sorted(registry)
        if not filters or any(f in n for f in filters)
    ]
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    timings: dict[str, float] = {}
    for name in names:
        q = registry[name]
        q.spark(spark, SF_DIR).count()  # compile run
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            q.spark(spark, SF_DIR).count()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
        print(f"  {name}: {timings[name]}", file=sys.stderr, flush=True)
    ordered = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    print(json.dumps({
        "slots": ordered,
        "total": round(sum(timings.values()), 3),
        "sf": parse_sf(SF_DIR),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
