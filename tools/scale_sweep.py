"""N-x scale sweep: replicate the bench tables into independent copies and
re-time registered queries against them, printing t(Nx)/t(1x) ratios.

The bench's ``sf1_ratio`` pins 8 plan families at 10x every round; this
tool is the on-demand breadth/depth net behind it — round 9 ran it twice
and both runs earned their keep:

- FULL sweep at 10x (all 50 slots): surfaced ``doc_fingerprints`` at
  15.2x, traced to a replication artifact (the then-current per-copy token
  prefix inserted identical glue chars at every token boundary, collapsing
  within-copy distinct char k-grams ~5x, so winnow overlap output genuinely
  grew ~85x while the df-cap guard held). Round 10 replaced the prefix with
  per-copy bijective alphabet permutations (``bench.permuted_copy_text``)
  — within-copy k-gram diversity now equals the base corpus exactly, so
  char-gram families measure the engine, not the generator;
- family sweep at 100x: measured every ``sf1_ratio`` family sub-linear
  across a SECOND decade (text families ~9.5x per decade = core-saturated
  linear; scan-parallel families flat).

The family list, the replication recipe, and the timing discipline are
IMPORTED from bench.py (``SF1_QUERIES``, ``replicate_tables``,
``min_of_runs``) so this sweep always measures exactly the workload the
bench pins — the two cannot drift.

Interpretation notes (also in COVERAGE.md):
- quadratic-by-contract slots (``tfidf_cosine_pairs``,
  ``embedding_top_pairs``, ``ann_lsh_topk``) keep their slot-PINNED
  block/cluster/plane parameters here, so Nx data means ~N^2 designed pair
  work — their scaled-parameter contract is measured by
  ``bench.bench_quadratic_family`` instead;
- relational slots over the UNSCALED dimension tables stay ~1x by design.

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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CPUS, SF_DIR, SF1_QUERIES, min_of_runs, parse_sf, replicate_tables
from document_clustering_with_hadoop_mapreduce_spark.plans.registry import all_queries
from document_clustering_with_hadoop_mapreduce_spark.session import get_spark


USAGE = (
    "usage: python tools/scale_sweep.py [--reps N] [--all] [name-substring ...]"
)


def main() -> None:
    args = sys.argv[1:]
    reps_n = 10
    if "--reps" in args:
        i = args.index("--reps")
        if i + 1 >= len(args):
            raise SystemExit(f"--reps requires a value\n{USAGE}")
        try:
            reps_n = int(args[i + 1])
        except ValueError:
            raise SystemExit(f"--reps must be an integer, got {args[i+1]!r}\n{USAGE}")
        if reps_n < 1:
            raise SystemExit(f"--reps must be >= 1, got {reps_n}\n{USAGE}")
    unknown = [
        a for a in args
        if a.startswith("-") and a not in ("--reps", "--all")
    ]
    if unknown:
        raise SystemExit(f"unknown flag(s) {unknown}\n{USAGE}")
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
        names = [n for n in SF1_QUERIES if n in registry]
    if not names:
        raise SystemExit(f"no registered slots match {filters!r}")

    out = tempfile.mkdtemp(prefix=f"sparkgraft_scale{reps_n}_")
    try:
        # unlike the bench (whose 10x layout must stay comparable across
        # rounds), the sweep re-splits the fact tables so map-side ops
        # parallelize the way thousands-of-row-groups inputs do anyway
        build_sec = replicate_tables(
            spark, out, reps_n,
            splits=max(int(CPUS), reps_n // 2),
            emb_splits=max(16, reps_n // 4),
        )
        base: dict[str, float] = {}
        scaled: dict[str, float] = {}
        for name in names:
            q = registry[name]
            q.spark(spark, SF_DIR).count()  # compile
            base[name] = min_of_runs(lambda: q.spark(spark, SF_DIR).count())
            scaled[name] = min_of_runs(lambda: q.spark(spark, out).count())

        print(json.dumps({
            "reps": reps_n,
            "build_sec": build_sec,
            "base": base,
            "scaled": scaled,
            "ratio": {n: round(scaled[n] / base[n], 2) for n in names if base[n]},
            "sf": parse_sf(SF_DIR),
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
