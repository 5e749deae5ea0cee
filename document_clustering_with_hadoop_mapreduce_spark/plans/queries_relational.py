"""Relational query surface (joins/aggs/windows/semi-anti) + DuckDB oracles.

SQL mirrors the Spark builders in ``operators.relational`` 1:1, including
the decimal-cast-then-double float-determinism discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import relational as R
from ..sources.tables import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# exact-sum SQL helpers (mirror R.dsum / R.davg)
def _dsum(expr: str, scale: int = 2) -> str:
    return f"round(CAST(sum(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE), {scale})"


def _davg(expr: str, scale: int = 6) -> str:
    return f"round(CAST(sum(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE) / count(*), {scale})"


@register(
    "pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum('l_quantity')} AS sum_qty,
           {_dsum('l_extendedprice')} AS sum_base_price,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_davg('l_quantity')} AS avg_qty,
           {_davg('l_discount')} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus""",
    "TPC-H Q1 shape: scan-filter-aggregate (pushdown + partial agg)",
    tags=("relational",),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.pricing_summary(_t(spark, sf_dir, "lineitem"))


@register(
    "revenue_by_nation",
    f"""
    SELECT r_name, n_name,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name""",
    "TPC-H Q5 shape: 5-way join, dims broadcast, one shuffle join",
    tags=("relational",),
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.revenue_by_nation(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


@register(
    "top_revenue_orders",
    f"""
    SELECT l_orderkey,
           {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10""",
    "TPC-H Q3 shape: selective join + agg + deterministic global top-k",
    tags=("relational",),
)
def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.top_revenue_orders(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)""",
    "anti join (left_anti): customers with no order above 400k",
    tags=("relational",),
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.customers_without_orders(_t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders"))


@register(
    "repeat_customers",
    """
    WITH big AS (
      SELECT o_custkey, count(*) AS n_orders FROM orders
      GROUP BY o_custkey HAVING count(*) >= 5
    )
    SELECT c_custkey, c_name, n_orders FROM customer JOIN big ON c_custkey = o_custkey""",
    "semi-join shape: customers with >= 5 orders",
    tags=("relational",),
)
def q_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.repeat_customers(_t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders"))


@register(
    "customer_recent_orders",
    """
    WITH w AS (
      SELECT o_custkey, o_orderkey,
             round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC)::INT AS rn
      FROM orders
    )
    SELECT c_custkey, c_name, o_orderkey, rn, running_spend
    FROM w JOIN customer ON o_custkey = c_custkey
    WHERE rn <= 3""",
    "window functions: row_number + ordered cumulative sum",
    tags=("relational", "window"),
)
def q_customer_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.customer_recent_orders(_t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders"))
