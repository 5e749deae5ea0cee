"""term_distribution_drift: pure-python JSD parity, identity/disjoint
bounds, contributor semantics."""

from __future__ import annotations

import math
import re

import pytest

from document_clustering_with_hadoop_mapreduce_spark.operators.snapshot import (
    term_distribution_drift,
)


def _clean_tokens(text: str) -> list[str]:
    cleaned = re.sub(r"[^a-z0-9 \t\n\r]", "", (text or "").lower())
    return [t for t in cleaned.split() if t != ""]


def _jsd_py(texts_a, texts_b):
    def dist(texts):
        c: dict[str, int] = {}
        for t in texts:
            for w in _clean_tokens(t):
                c[w] = c.get(w, 0) + 1
        m = sum(c.values())
        return {w: n / m for w, n in c.items()}

    p, q = dist(texts_a), dist(texts_b)
    jsd = 0.0
    for w in set(p) | set(q):
        pw, qw = p.get(w, 0.0), q.get(w, 0.0)
        mw = (pw + qw) / 2
        if pw > 0:
            jsd += 0.5 * pw * math.log(pw / mw)
        if qw > 0:
            jsd += 0.5 * qw * math.log(qw / mw)
    return jsd


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_matches_pure_python(spark, docs):
    a = docs.where("doc_id % 2 = 0")
    b = docs.where("doc_id % 2 = 1")
    jsd, contributors = term_distribution_drift(a, b, top_contributors=10)
    want = _jsd_py(
        [r.text for r in a.select("text").collect()],
        [r.text for r in b.select("text").collect()],
    )
    assert jsd == pytest.approx(want, abs=1e-7)
    rows = contributors.collect()
    assert len(rows) == 10
    assert all(r.p >= 0 and r.q >= 0 for r in rows)


def test_identical_corpora_zero_drift(spark, docs):
    jsd, _ = term_distribution_drift(docs, docs)
    assert jsd == pytest.approx(0.0, abs=1e-9)


def test_disjoint_vocabularies_hit_ln2_bound(spark):
    a = spark.createDataFrame([(1, "alpha beta gamma " * 5)], "doc_id int, text string")
    b = spark.createDataFrame([(2, "uno dos tres " * 5)], "doc_id int, text string")
    jsd, contributors = term_distribution_drift(a, b, top_contributors=6)
    assert jsd == pytest.approx(math.log(2), abs=1e-9)
    # every contributor is one-sided: either p or q is exactly 0
    for r in contributors.collect():
        assert (r.p == 0.0) != (r.q == 0.0)


def test_planted_shift_surfaces_in_contributors(spark):
    base = "common words shared across both snapshots " * 3
    a = spark.createDataFrame([(i, base) for i in range(10)], "doc_id int, text string")
    b = spark.createDataFrame(
        [(i, base) for i in range(10)] + [(99, "spamtoken " * 50)],
        "doc_id int, text string",
    )
    jsd, contributors = term_distribution_drift(a, b, top_contributors=1)
    top = contributors.collect()[0]
    assert top.term == "spamtoken" and top.p == 0.0 and top.q > 0
    assert jsd > 0


def test_validation(spark, docs):
    with pytest.raises(ValueError):
        term_distribution_drift(docs, docs, top_contributors=0)
