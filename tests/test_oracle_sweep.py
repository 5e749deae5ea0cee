"""Sweep every registered query against its DuckDB oracle at the local SF.

This is a local mirror of the driver's t2 correctness gate: same tables,
same comparison discipline (column-name-sorted, order-insensitive,
float-normalized).
"""

from __future__ import annotations

import pytest

from document_clustering_with_hadoop_mapreduce_spark.plans.registry import all_queries

from conftest import assert_matches_oracle

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_against_oracle(name, spark, sf_dir, duck):
    q = QUERIES[name]
    df = q.spark(spark, sf_dir)
    if q.oracle is None:
        # rows-only check for non-SQL-expressible ops
        assert df.count() >= 0
        return
    assert_matches_oracle(df, duck, q.oracle)
