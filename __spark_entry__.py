"""Driver contract for the spark-graft builder (PySpark target).

Thin facade over ``document_clustering_with_hadoop_mapreduce_spark.plans.registry`` — every
implemented operator from SURVEY.md §2 is declared there with its Spark
callable and (where SQL-expressible) its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from document_clustering_with_hadoop_mapreduce_spark.plans.registry import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: top-5 terms per category by average TF-IDF — the
    reference's task 1.5, exercising scan -> tokenize -> clean -> stopword
    -> count -> tf-idf -> broadcast join -> window top-k in one plan."""
    return all_queries()["category_top_terms"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
