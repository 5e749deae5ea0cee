"""fim_split: reconstruction invariant on real docs, pure-python draw
parity, determinism/re-salt independence, edge shapes."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
    fim_split,
)


def _md5_int60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_reconstruction_and_bounds_on_real_docs(spark, docs):
    out = fim_split(docs, middle_frac=0.25, salt="f").collect()
    assert out
    for r in out:
        parts = [p for p in (r.prefix, r.middle, r.suffix)]
        # every part non-empty; re-joining reproduces the token stream
        assert all(p != "" for p in parts)
        assert r.mid_len >= 1 and 2 <= r.mid_start <= r.n_tokens - r.mid_len
        n_joined = sum(len(p.split(" ")) for p in parts)
        assert n_joined == r.n_tokens


def test_matches_pure_python_draw(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(5 + i))) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r.doc_id: (r.mid_start, r.mid_len, r.middle)
        for r in fim_split(df, middle_frac=0.3, salt="py").collect()
    }
    for doc_id, text in rows:
        toks = text.split(" ")
        n = len(toks)
        # Spark F.round is HALF_UP; python round() is banker's — mirror HALF_UP
        m = min(n - 2, max(1, int(n * 0.3 + 0.5)))
        span = n - m - 1
        start = 2 + _md5_int60(f"py:{doc_id}") % span
        middle = " ".join(toks[start - 1 : start - 1 + m])
        assert got[doc_id] == (start, m, middle), doc_id


def test_deterministic_and_resalt_moves_spans(spark, docs):
    a = fim_split(docs, salt="s1")
    b = fim_split(docs, salt="s1")
    assert a.exceptAll(b).count() == 0
    c = fim_split(docs, salt="s2")
    moved = (
        a.select("doc_id", "mid_start")
        .join(c.select("doc_id", F.col("mid_start").alias("ms2")), "doc_id")
        .where(F.col("mid_start") != F.col("ms2"))
        .count()
    )
    assert moved > 0  # a fresh salt is a fresh epoch's cut


def test_short_docs_excluded(spark):
    df = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, None), (4, "a b c")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in fim_split(df).collect()}
    assert set(out) == {4}
    r = out[4]
    assert (r.prefix, r.middle, r.suffix) == ("a", "b", "c")


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "a b c d e f")], "doc_id int, text string")
    plan = fim_split(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with pytest.raises(ValueError):
        fim_split(df, middle_frac=0.0)
    with pytest.raises(ValueError):
        fim_split(df, middle_frac=1.0)
