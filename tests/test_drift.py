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


def test_empty_side_raises_not_half_ln2(spark, docs):
    # a dead feed must ERROR, not read as "moderate drift" ln(2)/2
    empty = spark.createDataFrame([(1, "")], "doc_id int, text string")
    with pytest.raises(ValueError, match="has no tokens"):
        term_distribution_drift(docs, empty)
    with pytest.raises(ValueError, match="has no tokens"):
        term_distribution_drift(empty, docs)


def test_stream_monitor_matches_batch_jsd(spark, sf_dir, tmp_path):
    """Streaming the corpus as ONE availableNow batch must score exactly
    the batch JSD; a second invocation over the same checkpoint resumes
    past the ingested files and scores nothing new."""
    from document_clustering_with_hadoop_mapreduce_spark.streaming.events_stream import (
        read_documents_stream,
        run_stream_drift_monitor,
    )

    import os

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reference = docs.where("doc_id % 2 = 0").localCheckpoint()
    ckpt = str(tmp_path / "drift_ckpt")
    # stage the source dir ONCE so the checkpoint's recorded basePath is
    # valid for the resume invocation too
    src = str(tmp_path / "src")
    os.makedirs(src)
    os.symlink(
        os.path.abspath(f"{sf_dir}/documents.parquet"),
        os.path.join(src, "documents.parquet"),
    )
    got = run_stream_drift_monitor(
        read_documents_stream(spark, src),
        reference,
        checkpoint_dir=ckpt,
    )
    assert len(got) >= 1
    total_docs = sum(n for _, _, n in got)
    assert total_docs == docs.count()
    from document_clustering_with_hadoop_mapreduce_spark.operators.snapshot import (
        term_distribution_drift,
    )

    # ONE staged file -> availableNow processes exactly one batch, so the
    # parity assertion is unconditional (no silent skip path)
    assert len(got) == 1
    want, _ = term_distribution_drift(docs, reference)
    assert got[0][1] == pytest.approx(want, abs=1e-9)
    # resume: nothing new to score
    again = run_stream_drift_monitor(
        read_documents_stream(spark, src),
        reference,
        checkpoint_dir=ckpt,
    )
    assert again == []


class TestEmbeddingDrift:
    def test_identical_corpora(self, spark, sf_dir):
        from document_clustering_with_hadoop_mapreduce_spark.operators.snapshot import (
            embedding_drift,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        d = embedding_drift(emb, emb)
        assert d["mean_shift_l2"] == pytest.approx(0.0, abs=1e-9)
        assert d["mean_cosine"] == pytest.approx(1.0, abs=1e-9)
        assert d["dispersion_ratio"] == pytest.approx(1.0, abs=1e-9)

    def test_planted_shift_and_spread(self, spark):
        from pyspark.sql import functions as F

        from document_clustering_with_hadoop_mapreduce_spark.operators.snapshot import (
            embedding_drift,
        )

        a = spark.createDataFrame(
            [(i, [float(i % 3), float((i + 1) % 3)]) for i in range(30)],
            "vec_id int, embedding array<double>",
        )
        # b = a shifted by (3, 4) -> mean shift exactly 5; same dispersion
        b = a.select(
            "vec_id",
            F.expr("transform(embedding, (x, i) -> x + CASE WHEN i = 0 THEN 3.0 ELSE 4.0 END)").alias(
                "embedding"
            ),
        )
        d = embedding_drift(a, b)
        assert d["mean_shift_l2"] == pytest.approx(5.0, abs=1e-9)
        assert d["dispersion_ratio"] == pytest.approx(1.0, abs=1e-9)
        # b2 = a scaled 2x around zero -> variance ratio 4
        b2 = a.select(
            "vec_id", F.expr("transform(embedding, x -> x * 2.0)").alias("embedding")
        )
        d2 = embedding_drift(a, b2)
        assert d2["dispersion_ratio"] == pytest.approx(4.0, abs=1e-9)

    def test_matches_numpy(self, spark, sf_dir):
        import numpy as np

        from document_clustering_with_hadoop_mapreduce_spark.operators.snapshot import (
            embedding_drift,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        a = emb.where("vec_id % 2 = 0")
        b = emb.where("vec_id % 2 = 1")
        d = embedding_drift(a, b)
        ma = np.array([r.embedding for r in a.collect()], dtype=float)
        mb = np.array([r.embedding for r in b.collect()], dtype=float)
        mean_a, mean_b = ma.mean(axis=0), mb.mean(axis=0)
        assert d["mean_shift_l2"] == pytest.approx(
            float(np.linalg.norm(mean_a - mean_b)), abs=1e-6
        )
        assert d["mean_cosine"] == pytest.approx(
            float(mean_a @ mean_b / (np.linalg.norm(mean_a) * np.linalg.norm(mean_b))),
            abs=1e-6,
        )
        assert d["dispersion_ratio"] == pytest.approx(
            float(mb.var(axis=0).sum() / ma.var(axis=0).sum()), abs=1e-6
        )

    def test_empty_side_raises(self, spark, sf_dir):
        from document_clustering_with_hadoop_mapreduce_spark.operators.snapshot import (
            embedding_drift,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        empty = emb.where("vec_id < 0")
        with pytest.raises(ValueError, match="at least one vector"):
            embedding_drift(emb, empty)

    def test_dimension_mismatch_raises(self, spark):
        from document_clustering_with_hadoop_mapreduce_spark.operators.snapshot import (
            embedding_drift,
        )

        a = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id int, embedding array<double>")
        b = spark.createDataFrame(
            [(2, [1.0, 2.0, 3.0])], "vec_id int, embedding array<double>"
        )
        with pytest.raises(ValueError, match="dimension mismatch"):
            embedding_drift(a, b)

    def test_undefined_metrics_are_nan(self, spark):
        import math

        from document_clustering_with_hadoop_mapreduce_spark.operators.snapshot import (
            embedding_drift,
        )

        # A: identical vectors (zero variance); B: spread — ratio undefined
        a = spark.createDataFrame(
            [(i, [1.0, 1.0]) for i in range(5)], "vec_id int, embedding array<double>"
        )
        b = spark.createDataFrame(
            [(i, [float(i - 2), float(2 - i)]) for i in range(5)],  # mean = (0, 0)
            "vec_id int, embedding array<double>",
        )
        d = embedding_drift(a, b)
        assert math.isnan(d["dispersion_ratio"])
        # B's mean is the zero vector -> cosine undefined
        assert math.isnan(d["mean_cosine"])
