"""vocab_growth (Heaps) and zipf_fit: pure-python parity, monotonicity,
planted-distribution semantics."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.datacard import (
    vocab_growth,
    zipf_fit,
)


def _md5_int60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _clean_tokens(text: str) -> list[str]:
    cleaned = re.sub(r"[^a-z0-9 \t\n\r]", "", (text or "").lower())
    return [t for t in cleaned.split() if t != ""]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


class TestVocabGrowth:
    def test_matches_pure_python(self, spark, docs):
        n_points = 8
        got = [
            (r.point, r.n_docs, r.n_tokens, r.vocab_size)
            for r in vocab_growth(docs, n_points=n_points, salt="g").collect()
        ]
        rows = docs.select("doc_id", "text").collect()
        # bucket = 1 + salted-hash mod n_points (pure map-side assignment)
        by_bucket: dict[int, list] = {}
        for r in rows:
            b = 1 + _md5_int60(f"g:{r.doc_id}") % n_points
            by_bucket.setdefault(b, []).append(r)
        want, seen = [], set()
        docs_cum, toks_cum = 0, 0
        for p in range(1, n_points + 1):
            for r in by_bucket.get(p, []):
                toks = (r.text or "").strip()
                toks_cum += len(toks.split()) if toks else 0
                seen.update(_clean_tokens(r.text))
            docs_cum += len(by_bucket.get(p, []))
            want.append((p, docs_cum, toks_cum, len(seen)))
        assert got == want

    def test_monotone_and_sublinear_on_real_corpus(self, spark, docs):
        curve = vocab_growth(docs, n_points=10).collect()
        vs = [r.vocab_size for r in curve]
        ts = [r.n_tokens for r in curve]
        assert vs == sorted(vs) and ts == sorted(ts)
        # Heaps: vocab grows sub-linearly in tokens — the second half of
        # the corpus adds fewer new types per token than the first half
        first_rate = vs[4] / ts[4]
        second_rate = (vs[9] - vs[4]) / (ts[9] - ts[4])
        assert second_rate < first_rate

    def test_validation(self, spark, docs):
        with pytest.raises(ValueError):
            vocab_growth(docs, n_points=0)


class TestZipf:
    def test_matches_pure_python_regression(self, spark, docs):
        alpha, r2 = zipf_fit(docs, min_count=2)
        counts: dict[str, int] = {}
        for r in docs.select("text").collect():
            for t in _clean_tokens(r.text):
                counts[t] = counts.get(t, 0) + 1
        freqs = sorted(
            ((f, t) for t, f in counts.items() if f >= 2),
            key=lambda x: (-x[0], x[1]),
        )
        xs = [math.log(i + 1) for i in range(len(freqs))]
        ys = [math.log(f) for f, _ in freqs]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        cov, vx, vy = sxy - sx * sy / n, sxx - sx * sx / n, syy - sy * sy / n
        assert alpha == pytest.approx(round(-(cov / vx), 6), abs=2e-6)
        assert r2 == pytest.approx(round(cov * cov / (vx * vy), 6), abs=2e-6)
        # the SYNTHETIC fixture vocabulary is near-uniform (alpha ~ 0.18),
        # itself the "flat junk vocabulary" red flag the scalar exists to
        # surface; natural-range recovery is pinned by the planted test
        assert alpha > 0 and 0.0 < r2 <= 1.0

    def test_planted_zipf_recovers_exponent(self, spark):
        # frequencies ~ 1000 / rank (alpha = 1): the fit must land near 1
        rows = []
        did = 0
        for rank in range(1, 200):
            f = max(2, round(1000 / rank))
            for _ in range(f):
                rows.append((did, f"term{rank:04d}"))
                did += 1
        df = spark.createDataFrame(rows, "doc_id long, text string")
        alpha, r2 = zipf_fit(df, min_count=2)
        assert alpha == pytest.approx(1.0, abs=0.15)
        assert r2 > 0.97

    def test_empty_vocabulary_returns_zeros(self, spark):
        df = spark.createDataFrame(
            [(1, "every token once here"), (2, "")], "doc_id int, text string"
        )
        assert zipf_fit(df, min_count=5) == (0.0, 0.0)

    def test_validation(self, spark, docs):
        with pytest.raises(ValueError):
            zipf_fit(docs, min_count=0)
