"""Skew-resistant aggregation and join helpers.

At 100 TB a handful of hot keys (the empty document, a viral user, a
default category) can pin an entire stage on one reducer. AQE's skew-join
splitting covers sort-merge joins; aggregations over hot keys still
funnel every row of a key through one task at the FINAL aggregate. These
helpers pre-spread hot keys explicitly:

- ``salted_agg``: two-phase aggregation — phase 1 groups on
  (keys, salt % N) so a hot key fans over N tasks, phase 2 merges the N
  partials. Works for any algebraic aggregate (sum/count/min/max);
  map-side partial aggregation already handles most skew, so reach for
  this when the DISTINCT group count is small AND keys are hot (partial
  agg degenerates when every map task sees every key).
- ``salted_broadcast_join``: replicate the small side N times with an
  explicit salt column so a skewed probe side spreads — the classic
  broadcast variant needs no salt at all (broadcast joins don't shuffle
  the probe side); provided for the sort-merge fallback case where the
  "small" side exceeds the broadcast threshold.

Salting changes WHERE rows meet, never results: tests assert equality
with the direct plan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def _row_salt(n_salts: int) -> Column:
    """Uniform per-row salt in [0, n_salts): hash of
    ``monotonically_increasing_id`` — a row-POSITION term, not row
    content. A content hash (the first-cut form) sends every copy of an
    identical row to ONE salt, i.e. zero spread exactly for the
    motivating hot keys (the empty document, a default category), whose
    rows are frequently byte-identical. Position-derived salts vary with
    partitioning/retries, which is safe BY CONSTRUCTION here: the salt
    only routes rows between phase-1 tasks, every (keys, salt) partial is
    merged in phase 2, and a retried map task regenerates its whole
    shuffle output atomically — results never see the salt (the equality
    + property tests pin this)."""
    return F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Callable[[Column], Column], Callable[[Column], Column]]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-resistant aggregation.

    ``aggs`` maps output column -> (phase1_agg, phase2_merge) over the
    same column name, e.g. ``{"total": (lambda c: F.sum(c), lambda c:
    F.sum(c))}`` for sums, ``(F.count, F.sum)`` for counts. The salt is
    position-derived (``_row_salt``) so even byte-identical hot rows
    spread; the RESULT is independent of the salt by construction.
    """
    salted = df.withColumn(SALT, _row_salt(n_salts))
    phase1 = salted.groupBy(*keys, SALT).agg(
        *[fn1(F.col(out)).alias(out) for out, (fn1, _) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[fn2(F.col(out)).alias(out) for out, (_, fn2) in aggs.items()]
    )


def salted_sum(df: DataFrame, keys: list[str], value_col: str, out_col: str,
               n_salts: int = 16) -> DataFrame:
    out = salted_agg(
        df.select(*keys, F.col(value_col).alias(out_col)),
        keys,
        {out_col: (F.sum, F.sum)},
        n_salts,
    )
    return out


def salted_count(df: DataFrame, keys: list[str], out_col: str = "n",
                 n_salts: int = 16) -> DataFrame:
    return salted_agg(
        df.select(*keys, F.lit(1).alias(out_col)),
        keys,
        {out_col: (F.count, F.sum)},
        n_salts,
    )


def salted_broadcast_join(
    big: DataFrame, small: DataFrame, on: str, n_salts: int = 8
) -> DataFrame:
    """Skew-spread equi-join for when the small side is past the broadcast
    threshold: the small side is replicated ``n_salts`` times (explode over
    the salt range), the big side salts by row hash, and the join key
    becomes (on, salt) — a hot key's rows land on n_salts reducers."""
    small_rep = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    big_salted = big.withColumn(SALT, _row_salt(n_salts))
    return big_salted.join(small_rep, [on, SALT]).drop(SALT)
