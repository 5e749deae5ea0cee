"""Exact phrase search: DuckDB-oracle parity + normalization/overlap
semantics on constructed corpora."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.phrase import (
    normalize_phrase,
    phrase_match_counts,
    phrase_oracle_sql,
    phrase_topk,
)

from conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def corpus_phrases(spark, sf_dir):
    """One corpus-derived unigram + one bigram (most frequent each), so the
    oracle test runs mixed gram lengths on real data deterministically."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.heavyhitters import (
        _gram_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = []
    for m in (1, 2):
        out.append(
            _gram_stream(docs, m, "text")
            .groupBy("ngram").count()
            .orderBy(F.desc("count"), F.asc("ngram"))
            .limit(1)
            .collect()[0]["ngram"]
        )
    return out


def test_matches_oracle_on_fixture(spark, sf_dir, duck, corpus_phrases):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = phrase_match_counts(docs, corpus_phrases)
    assert_matches_oracle(got, duck, phrase_oracle_sql(corpus_phrases))
    assert got.limit(1).count() == 1


def test_topk_matches_oracle(spark, sf_dir, duck, corpus_phrases):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = phrase_topk(docs, corpus_phrases, k=7)
    assert_matches_oracle(got, duck, phrase_oracle_sql(corpus_phrases, k=7))


@pytest.fixture(scope="module")
def mini(spark, duck):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "The QUICK brown fox! jumps over the quick brown dog.",
                "quick brown things: a quick brown fox, a quick brown hen",
                "nothing relevant here at all",
                "a a a a",
            ],
        }
    )
    duck.register("ph_mini", pdf)
    return spark.createDataFrame(pdf)


def test_normalization_and_counts(spark, duck, mini):
    got = phrase_match_counts(mini, ["Quick, Brown!"])
    assert_matches_oracle(
        got, duck, phrase_oracle_sql(["Quick, Brown!"], source="ph_mini")
    )
    rows = {r["doc_id"]: r["n_matches"] for r in got.collect()}
    assert rows == {1: 2, 2: 3}


def test_overlapping_matches(spark, mini):
    rows = phrase_match_counts(mini, ["a a a"]).collect()
    assert {(r["doc_id"], r["n_matches"]) for r in rows} == {(4, 2)}


def test_normalize_phrase():
    assert normalize_phrase("  The QUICK,   brown-fox! ") == "the quick brownfox"
    assert normalize_phrase("...") == ""


def test_validation(mini):
    with pytest.raises(ValueError, match="phrases"):
        phrase_match_counts(mini, [])
    with pytest.raises(ValueError, match="phrases"):
        phrase_match_counts(mini, ["!!!"])
    with pytest.raises(ValueError, match="k must"):
        phrase_topk(mini, ["a"], k=0)


def test_plan_broadcast_no_cartesian(spark, sf_dir, corpus_phrases):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        phrase_match_counts(docs, corpus_phrases)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_normalize_phrase_matches_spark_tokenizer_property(spark):
    """The python twin must agree with the Spark tokenizer on arbitrary
    strings — one Spark job over the whole hypothesis batch (drift between
    Java regex and `re` semantics is the failure mode this hunts)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from document_clustering_with_hadoop_mapreduce_spark.functions.text import tokens

    cases: list[str] = []

    @settings(
        max_examples=200,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        s=st.text(
            alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
            max_size=60,
        )
    )
    def collect(s):
        cases.append(s)

    collect()
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "i long, s string")
    got = {
        r["i"]: " ".join(t for t in r["t"] if t)
        for r in df.select("i", tokens(F.col("s")).alias("t")).collect()
    }
    for i, s in enumerate(cases):
        assert got[i] == normalize_phrase(s), repr(s)
