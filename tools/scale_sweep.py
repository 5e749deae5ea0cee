"""N-x scale sweep: replicate the bench tables into independent copies and
re-time registered queries against them, printing t(Nx)/t(1x) ratios.

The bench's ``sf1_ratio`` pins 8 plan families at 10x every round; this
tool is the on-demand breadth/depth net behind it — round 9 ran it twice
and both runs earned their keep:

- FULL sweep at 10x (all 50 slots): surfaced ``doc_fingerprints`` at
  15.2x, traced to a replication artifact (the per-copy token prefix that
  makes copy vocabularies disjoint also inserts identical glue chars that
  collapse within-copy distinct char k-grams ~5x, so winnow overlap output
  genuinely grows ~85x while the df-cap guard holds) — documented in
  COVERAGE.md rather than "fixed", because the engine behavior is correct;
- family sweep at 100x: measured every ``sf1_ratio`` family sub-linear
  across a SECOND decade (text families ~9.5x per decade = core-saturated
  linear; scan-parallel families flat).

Interpretation notes (also in COVERAGE.md):
- quadratic-by-contract slots (``tfidf_cosine_pairs``,
  ``embedding_top_pairs``, ``ann_lsh_topk``) keep their slot-PINNED
  block/cluster/plane parameters here, so Nx data means ~N^2 designed pair
  work — their scaled-parameter contract is measured by
  ``bench.bench_quadratic_family`` instead;
- relational slots over the UNSCALED dimension tables stay ~1x by design;
- char-k-gram slots see the replication artifact above; token-level slots
  do not (the prefix preserves token distinctness).

Usage:
    python tools/scale_sweep.py                 # 10x, sf1_ratio families
    python tools/scale_sweep.py --reps 100      # 100x, same families
    python tools/scale_sweep.py --all           # every registered slot
    python tools/scale_sweep.py lsh winnow      # substring-filtered slots

Prints one JSON line:
    {"reps": N, "build_sec": s, "base": {...}, "scaled": {...},
     "ratio": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_clustering_with_hadoop_mapreduce_spark.plans.registry import all_queries
from document_clustering_with_hadoop_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# one slot per plan family whose work is Nx-independent by construction —
# the same set bench.py's sf1_ratio pins per round
FAMILIES = [
    "term_doc_matrix", "tfidf_standard", "minhash_signatures",
    "dedup_components", "events_hourly", "pricing_summary",
    "knn_bruteforce", "kmeans_assign_seeded",
]


def build_scaled(spark, out: str, reps_n: int) -> float:
    """The bench's independent-copies replication (disjoint token
    vocabularies, offset keys, unscaled dims), parameterized by rep count.
    Fact tables are re-split so map-side ops parallelize like the
    thousands-of-row-groups layout the target scale has anyway."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    reps = spark.range(reps_n).select(F.col("id").alias("rep"))
    splits = max(int(CPUS), reps_n // 2)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.regexp_replace(
                F.col("text"), F.lit(r"(^|\s+)"),
                F.concat(F.lit("$1r"), F.col("rep").cast("string")),
            ).alias("text"),
            "lang", "source", "n_chars",
        )
        .repartition(splits)
        .write.mode("overwrite").parquet(f"{out}/documents.parquet")
    )
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep") * 100_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * 10_000_000).alias("user_id"),
            "event_type", "value", "props",
        )
        .repartition(splits)
        .write.mode("overwrite").parquet(f"{out}/events.parquet")
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (
        li.crossJoin(reps)
        .select(
            (F.col("l_orderkey") + F.col("rep") * 100_000_000).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .repartition(splits)
        .write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * 10_000_000).alias("vec_id"),
            *[c for c in emb.columns if c != "vec_id"],
        )
        .repartition(max(16, reps_n // 4))
        .write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    )
    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{out}/{t}.parquet")
    return round(time.perf_counter() - t0, 3)


def min_of_runs(fn, n: int = 2) -> float:
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 3)


def main() -> None:
    args = sys.argv[1:]
    reps_n = int(args[args.index("--reps") + 1]) if "--reps" in args else 10
    run_all = "--all" in args
    filters = [
        a for i, a in enumerate(args)
        if not a.startswith("-") and (i == 0 or args[i - 1] != "--reps")
    ]
    spark = get_spark("scale-sweep", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    if filters:
        names = [n for n in sorted(registry) if any(f in n for f in filters)]
    elif run_all:
        names = sorted(registry)
    else:
        names = [n for n in FAMILIES if n in registry]
    if not names:
        raise SystemExit(f"no registered slots match {filters!r}")

    out = tempfile.mkdtemp(prefix=f"sparkgraft_scale{reps_n}_")
    try:
        build_sec = build_scaled(spark, out, reps_n)
        base: dict[str, float] = {}
        scaled: dict[str, float] = {}
        for name in names:
            q = registry[name]
            q.spark(spark, SF_DIR).count()  # compile
            base[name] = min_of_runs(lambda: q.spark(spark, SF_DIR).count())
            scaled[name] = min_of_runs(lambda: q.spark(spark, out).count())
        sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
        print(json.dumps({
            "reps": reps_n,
            "build_sec": build_sec,
            "base": base,
            "scaled": scaled,
            "ratio": {n: round(scaled[n] / base[n], 2) for n in names if base[n]},
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
