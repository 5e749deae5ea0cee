"""Curation funnel report: how many documents each pipeline stage drops.

Every serious corpus build publishes this table (the Llama/RefinedWeb/
Dolma papers all report per-stage retention) and engineers watch it drift
between snapshots — a gate that suddenly drops 40 % of a source is a bug
or an upstream change, and the funnel is where it shows first.

``funnel_report`` is generic: ordered named stage predicates, applied
CUMULATIVELY (a doc must survive every earlier stage to be at risk at
stage k — the sequential semantics of a real pipeline), counted in ONE
aggregate pass. The stage flags are plain boolean columns over the input
frame, so gates that need joins (decontamination hits, duplicate-cluster
representatives) are expressed as null-checks on pre-joined columns —
the caller composes the joins, the funnel only counts.

Scale: one rollup aggregate (map-side partial sums of k+1 conditional
counters), output is k+1 rows. Nothing per-doc leaves the executors.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_report(df: DataFrame, stages: Mapping[str, Column]) -> DataFrame:
    """(stage, n_in, n_kept, n_dropped) — one row per stage in mapping
    order, plus a leading ``input`` row; ``n_in`` of stage k is ``n_kept``
    of stage k-1 (cumulative application).

    ``stages`` maps stage name -> keep-predicate Column; iteration order
    is the pipeline order (dicts preserve insertion order).
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    names = list(stages)
    counters = [F.count(F.lit(1)).alias("__n0")]
    kept: Column | None = None
    for i, name in enumerate(names):
        kept = stages[name] if kept is None else (kept & stages[name])
        # coalesce: sum() over ZERO rows is NULL, so an empty snapshot
        # (a realistic monitoring input) would report n_kept/n_dropped
        # NULL instead of 0
        counters.append(
            F.coalesce(F.sum(kept.cast("long")), F.lit(0).cast("long")).alias(
                f"__n{i + 1}"
            )
        )
    row = df.agg(*counters)
    out_rows = F.array(
        F.struct(
            F.lit("input").alias("stage"),
            F.col("__n0").alias("n_in"),
            F.col("__n0").alias("n_kept"),
            F.lit(0).cast("long").alias("n_dropped"),
        ),
        *[
            F.struct(
                F.lit(name).alias("stage"),
                F.col(f"__n{i}").alias("n_in"),
                F.col(f"__n{i + 1}").alias("n_kept"),
                (F.col(f"__n{i}") - F.col(f"__n{i + 1}")).alias("n_dropped"),
            )
            for i, name in enumerate(names)
        ],
    )
    return row.select(F.explode(out_rows).alias("r")).select(
        "r.stage", "r.n_in", "r.n_kept", "r.n_dropped"
    )
