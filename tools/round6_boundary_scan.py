"""Round-6 HALF_UP boundary tripwire (VERDICT r9 #2): for every similarity
slot, recompute its output scores UNROUNDED and count values within 1e-9
of a 0.5e-6 rounding boundary — the only place ``_round6`` (binary-double
floor) can disagree with the JVM/DuckDB BigDecimal HALF_UP on the
shortest decimal representation. Expected count: 0 per slot; a nonzero
count is the diagnosis for a future one-row hash mismatch on a
similarity slot (see operators/similarity.py::_round6).

    python tools/round6_boundary_scan.py          # $SPARK_GRAFT_SF_DIR

Prints one JSON line: {"slots": {name: {rows, hits}}, "sf": ...}.
The same scan gates every round in tests/test_round6_boundary.py.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_clustering_with_hadoop_mapreduce_spark.plans.round6_monitor import scan_all
from document_clustering_with_hadoop_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    spark = get_spark("round6-scan", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    slots = scan_all(spark, SF_DIR)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "slots": slots,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
