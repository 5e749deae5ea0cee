"""Top-K operators — global and per-group.

Reference parity (SURVEY.md §2.3 A4, A9):
- A4 global top-N terms  (ref sources/1.3/source/Task1_3.java:34-63 — a
  single reducer buffering every term in a HashMap; here Spark plans
  ``TakeOrderedAndProject``: per-partition partial top-k + driver merge,
  O(k) memory per partition, no single-reducer bottleneck).
- A9 per-group top-K     (ref sources/1.5/source/task_1_5.java:109-140).

All orderings carry a deterministic tie-break column so results are stable
across partitionings and engines (the reference's HashMap iteration order is
not).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_global(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """A4: ORDER BY ... LIMIT k — Spark executes partial top-k per partition."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """A9: row_number window per group, keep <= k rows.

    One exchange on the group key; the window's sort is per-partition. Skewed
    groups are handled by AQE; for pathological skew pre-aggregate first.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
