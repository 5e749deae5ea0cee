"""Exact-substring duplicate spans: DuckDB oracle parity on the fixture,
closed-form semantics on a hand-built corpus, and the bounded-collect /
two-exchange plan shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
    duplicate_spans,
    span_hashes,
)
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table

from conftest import assert_matches_oracle

W, STRIDE, MAXEX = 3, 1, 8

_ORACLE = f"""
WITH docs_t AS (
  SELECT doc_id,
         list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 \\t\\n\\r]', '', 'g'), '[ \\t\\n\\r]+'),
                     t -> t <> '') AS toks
  FROM documents
),
sp AS (
  SELECT doc_id, i AS pos,
         CAST(('0x' || substr(md5(array_to_string(toks[i:i+{W - 1}], ' ')), 1, 15)) AS BIGINT) AS h
  FROM docs_t, UNNEST(generate_series(1, len(toks) - {W - 1}, {STRIDE})) AS t(i)
  WHERE len(toks) >= {W}
),
per_doc AS (SELECT h, doc_id, count(*) AS occ, min(pos) AS first_pos FROM sp GROUP BY h, doc_id),
stats AS (SELECT h, count(*)::BIGINT AS n_docs, sum(occ)::BIGINT AS n_occurrences FROM per_doc GROUP BY h),
ranked AS (SELECT h, doc_id, first_pos, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM per_doc)
SELECT s.h AS span_hash, s.n_docs, s.n_occurrences,
       array_to_string(list_sort(list(doc_id || ':' || first_pos)), ',') AS example_docs
FROM ranked r JOIN stats s USING (h)
WHERE s.n_docs >= 2 AND r.rn <= {MAXEX}
GROUP BY s.h, s.n_docs, s.n_occurrences"""


def test_duplicate_spans_matches_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    df = duplicate_spans(docs, window=W, stride=STRIDE, max_examples=MAXEX)
    assert df.count() > 0, "fixture has no repeated 3-token spans; test is vacuous"
    assert_matches_oracle(df, duck, _ORACLE)


def test_duplicate_spans_closed_form(spark):
    header = "permission is hereby granted free"  # 5-token licence block
    docs = spark.createDataFrame(
        [
            (1, header + " alpha beta gamma"),
            (2, "delta " + header + " epsilon"),
            (3, "zeta eta theta iota kappa unrelated"),
            # doc 4 repeats the header twice internally
            (4, header + " and again " + header),
        ],
        "doc_id long, text string",
    )
    out = duplicate_spans(docs, window=5, stride=1).collect()
    # exactly one span recurs across docs: the header (other 5-grams are unique)
    rows = [r for r in out if r["n_docs"] >= 2]
    assert len(rows) == 1
    r = rows[0]
    assert r["n_docs"] == 3 and r["n_occurrences"] == 4
    # first positions: doc1@1, doc2@2, doc4@1
    assert r["example_docs"] == "1:1,2:2,4:1"


def test_duplicate_spans_example_cap(spark):
    text = "one two three four five"
    docs = spark.range(100).select(F.col("id").alias("doc_id"), F.lit(text).alias("text"))
    out = duplicate_spans(docs, window=5, stride=1, max_examples=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 100 and r["n_occurrences"] == 100
    assert len(r["example_docs"].split(",")) == 4  # bounded sample, full counts


def test_span_hashes_stride_and_validation(spark):
    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    assert span_hashes(docs, window=3, stride=2).count() == 2  # pos 1, 3
    assert span_hashes(docs, window=7).count() == 0  # shorter than window
    with pytest.raises(ValueError, match="window"):
        span_hashes(docs, window=0)


def test_duplicate_spans_plan_shape(spark, sf_dir):
    """Map-side explode, agg on (h, doc), window+agg on h: two hash
    exchanges, no cartesian, no Python stage, no unbounded collect path."""
    docs = load_table(spark, sf_dir, "documents", fan_out=False)
    plan = (
        duplicate_spans(docs, window=W)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "Python" not in plan
