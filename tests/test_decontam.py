"""Benchmark decontamination: value parity vs a DuckDB oracle on the
fixture corpus + semantic unit tests on a hand-built frame + the plan
properties that make it 100 TB-safe (eval set broadcast, corpus map-side).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.decontam import (
    contamination_stats,
    decontaminate,
    eval_ngram_set,
)
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table

from conftest import assert_matches_oracle

N = 5  # fixture text is short word-soup; 5-grams give non-trivial overlap
EVAL_PRED = "doc_id % 7 = 3"

# DuckDB mirror: same token pipeline + md5-60bit shingle hash as the
# minhash oracles (operators/dedup.py::minhash_oracle_sql), n-gram width N,
# eval suite = the EVAL_PRED slice of the same corpus.
_HASHED_CTE = f"""
WITH docs_t AS (
  SELECT doc_id,
         list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 \\t\\n\\r]', '', 'g'), '[ \\t\\n\\r]+'),
                     t -> t <> '') AS toks
  FROM documents
),
hashed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(array_to_string(toks[i:i+{N - 1}], ' ')), 1, 15)) AS BIGINT) AS h
  FROM docs_t, UNNEST(generate_series(1, len(toks) - {N - 1})) AS t(i)
  WHERE len(toks) >= {N}
),
eval_set AS (SELECT DISTINCT h FROM hashed WHERE {EVAL_PRED}),
stats AS (
  SELECT doc_id, count(DISTINCT h)::BIGINT AS n_overlap
  FROM hashed JOIN eval_set USING (h)
  GROUP BY doc_id
)"""


def _corpus_and_eval(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs, docs.filter(F.col("doc_id") % 7 == 3)


def test_contamination_stats_matches_oracle(spark, sf_dir, duck):
    docs, eval_docs = _corpus_and_eval(spark, sf_dir)
    df = contamination_stats(docs, eval_docs, n=N)
    assert_matches_oracle(df, duck, f"{_HASHED_CTE} SELECT doc_id, n_overlap FROM stats")
    # sanity: every eval doc long enough to have an N-gram is self-contaminated
    n_eval = duck.execute(
        f"SELECT count(DISTINCT doc_id) FROM ({_HASHED_CTE} SELECT doc_id FROM hashed WHERE {EVAL_PRED})"
    ).fetchone()[0]
    flagged = {r["doc_id"] for r in df.collect()}
    eval_ids = {r["doc_id"] for r in eval_docs.select("doc_id").collect()}
    assert len(eval_ids & flagged) == n_eval


def test_decontaminate_matches_oracle(spark, sf_dir, duck):
    docs, eval_docs = _corpus_and_eval(spark, sf_dir)
    df = decontaminate(docs, eval_docs, n=N).select("doc_id", "lang")
    assert_matches_oracle(
        df,
        duck,
        f"""{_HASHED_CTE}
        SELECT d.doc_id, d.lang FROM documents d
        LEFT JOIN (SELECT doc_id FROM stats WHERE n_overlap >= 1) f USING (doc_id)
        WHERE f.doc_id IS NULL""",
    )


def test_decontaminate_semantics_hand_built(spark):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    corpus = mk(
        [
            # shares the eval 3-gram "alpha beta gamma" THREE times -> still 1 distinct overlap
            (1, "alpha beta gamma x alpha beta gamma y alpha beta gamma"),
            # two DISTINCT eval 3-grams
            (2, "alpha beta gamma z delta epsilon zeta"),
            (3, "totally unrelated words here nothing shared"),
            (4, "too short"),  # shorter than n -> no shingles, never flagged
        ]
    )
    eval_docs = mk([(100, "alpha beta gamma q delta epsilon zeta")])
    stats = {
        r["doc_id"]: r["n_overlap"]
        for r in contamination_stats(corpus, eval_docs, n=3).collect()
    }
    assert stats == {1: 1, 2: 2}
    kept = {r["doc_id"] for r in decontaminate(corpus, eval_docs, n=3).collect()}
    assert kept == {3, 4}
    # tolerance knob: min_overlap=2 forgives single-n-gram boilerplate hits
    kept2 = {r["doc_id"] for r in decontaminate(corpus, eval_docs, n=3, min_overlap=2).collect()}
    assert kept2 == {1, 3, 4}
    with pytest.raises(ValueError, match="min_overlap"):
        decontaminate(corpus, eval_docs, min_overlap=0)


def test_decontaminate_plan_broadcasts_eval_only(spark, sf_dir):
    """100 TB shape: the eval n-gram set is the broadcast side; the corpus
    shingle stream is map-side narrow (its only exchange is the per-doc
    overlap aggregate over MATCHED rows); removal is an anti-join."""
    docs, eval_docs = _corpus_and_eval(spark, sf_dir)
    stats_plan = contamination_stats(docs, eval_docs, n=N)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in stats_plan
    assert "CartesianProduct" not in stats_plan and "BroadcastNestedLoop" not in stats_plan
    # corpus side: explode feeds the broadcast join directly — the only
    # hash exchanges are the eval distinct (small side) and the two
    # countDistinct phases ((doc_id,h) dedup + per-doc count), all of which
    # carry matched/eval rows only, never the corpus shingle stream
    assert stats_plan.count("Exchange hashpartitioning") <= 3
    anti_plan = decontaminate(docs, eval_docs, n=N)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in anti_plan


def test_eval_ngram_set_is_distinct_hashes(spark, sf_dir):
    _, eval_docs = _corpus_and_eval(spark, sf_dir)
    s = eval_ngram_set(eval_docs, n=N)
    assert s.columns == ["h"]
    total = s.count()
    assert total == s.distinct().count() and total > 0
