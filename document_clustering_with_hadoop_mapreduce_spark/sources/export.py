"""Training-set export: deterministic global shuffle + sharded layout.

The last mile of a curation pipeline: the kept corpus must reach the
trainer (a) in RANDOMIZED order — curated data arrives grouped by source /
crawl / dedup cluster, and feeding correlated batches biases SGD — and
(b) split into shards a data loader can consume independently.

A true global random sort is the anti-pattern at 100 TB: one total-order
sort of the corpus through a range partitioner, with an RNG column that
changes every run. Instead both properties come from one salted hash
(same determinism discipline as ``textstats.hash_split`` — a pure
function of (salt, doc id), no RNG state):

    key   = md5(salt:id)            -- pseudo-random, reproducible
    shard = key mod n_shards        -- which shard
    pos   = row_number by key       -- order WITHIN the shard

so the exchange is an ordinary ``n_shards``-way hash partition + per-shard
sort (each task sorts only its shard), never a global sort. Reading the
shards in (shard, pos) order replays one fixed permutation of the corpus;
re-running the export — at any input partitioning or row order — rebuilds
it byte-for-byte. A different ``salt`` is a fresh, equally deterministic
permutation (the per-epoch reshuffle knob).

Contract: (shard, pos) fully determine the training order; ``pos`` is
dense 0..shard_size-1. The writer also lays files out so file order
matches ``pos`` (one sorted file per shard directory), but consumers
should trust the COLUMNS, not parquet row order — split-size knobs can
re-chunk a scan.

Oracle: every derived column is md5 arithmetic, so a DuckDB mirror
reproduces (shard, pos) bit-for-bit (tests/test_export.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_int60


def _shuffle_key(id_col: str, salt: str) -> F.Column:
    return md5_int60(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))


def global_shuffle(
    df: DataFrame,
    n_shards: int = 1024,
    salt: str = "shuffle-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Input columns + (shard, pos): one deterministic corpus permutation.

    One hash exchange on ``shard`` + a per-shard sort window — parallelism
    is ``n_shards``; size it so a shard fits a task sort (the same knob
    discipline as ``sequence_pack.num_streams``). Hash ties (md5 is 60-bit
    here) break on the id itself, so the order is total and reproducible
    even across colliding keys.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = _shuffle_key(id_col, salt)
    w = Window.partitionBy("shard").orderBy("__key", id_col)
    return (
        df.withColumn("__key", key)
        .withColumn("shard", F.pmod(F.col("__key"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w) - F.lit(1))
        .drop("__key")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 1024,
    salt: str = "shuffle-v1",
    id_col: str = "doc_id",
) -> None:
    """Materialize the shuffled corpus as ``path/shard=<i>/`` parquet dirs.

    ``repartition(n_shards, shard)`` routes each shard to exactly one task
    (several shards may share a task; ``partitionBy`` still splits them
    into their own directories), and the within-task sort on (shard, pos)
    makes each shard's single file arrive in training order. No global
    sort, no RNG, no driver-side work.
    """
    out = global_shuffle(df, n_shards, salt, id_col)
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def _oracle_key_sql(salt: str, id_col: str) -> str:
    """DuckDB twin of ``_shuffle_key`` — ONE definition shared by every
    oracle generator in this module (drift here is a false test failure)."""
    return (
        f"CAST(('0x' || substr(md5('{salt}:' || CAST({id_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
    )

def global_shuffle_oracle_sql(
    n_shards: int, salt: str, source: str = "documents", id_col: str = "doc_id"
) -> str:
    """DuckDB mirror of ``global_shuffle`` (doc_id, shard, pos)."""
    key = _oracle_key_sql(salt, id_col)
    return f"""
WITH keyed AS (
  SELECT {id_col} AS doc_id, {key} AS k, {key} % {n_shards} AS shard
  FROM {source}
)
SELECT doc_id, CAST(shard AS INT) AS shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) - 1 AS BIGINT) AS pos
FROM keyed"""


def curriculum_order(
    df: DataFrame,
    score_col: str,
    n_shards: int = 1024,
    ascending: bool = True,
    salt: str = "curriculum-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Input columns + (shard, pos): the curriculum variant of
    ``global_shuffle`` — training order follows a difficulty/quality score
    (Bengio et al., ICML 2009 curriculum learning: easy-first ==
    ``ascending=True`` on a difficulty score) instead of a pure random
    permutation, while KEEPING the shard-level randomization that batch
    diversity needs: shard assignment stays the salted-hash permutation
    (every shard sees the full score distribution), and only the order
    WITHIN each shard follows (score, salted hash, id).

    A consumer reading shards round-robin at equal ``pos`` advances
    through the curriculum in lock-step across shards; the salted-hash
    tie-break keeps equal-score runs shuffled rather than id-ordered.
    Same scale shape as ``global_shuffle``: one hash exchange + per-shard
    task sorts, never a global sort, no RNG state.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = _shuffle_key(id_col, salt)
    order = F.asc(score_col) if ascending else F.desc(score_col)
    w = Window.partitionBy("shard").orderBy(order, F.asc("__key"), F.asc(id_col))
    return (
        df.withColumn("__key", key)
        .withColumn("shard", F.pmod(F.col("__key"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w) - F.lit(1))
        .drop("__key")
    )


def curriculum_order_oracle_sql(
    score_expr: str,
    n_shards: int,
    salt: str,
    ascending: bool = True,
    source: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of ``curriculum_order`` (doc_id, shard, pos);
    ``score_expr`` is the SQL twin of the Spark score column."""
    key = _oracle_key_sql(salt, id_col)
    direction = "ASC" if ascending else "DESC"
    return f"""
WITH keyed AS (
  SELECT {id_col} AS doc_id, {score_expr} AS score, {key} AS k, {key} % {n_shards} AS shard
  FROM {source}
)
SELECT doc_id, CAST(shard AS INT) AS shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY score {direction}, k, doc_id) - 1 AS BIGINT) AS pos
FROM keyed"""
