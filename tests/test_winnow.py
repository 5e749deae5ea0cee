"""Winnowing fingerprints: pure-python oracle parity, the t = k + w - 1
shared-substring guarantee, density vs the full k-gram stream, plan shape."""

from __future__ import annotations

import hashlib
import random
import re

import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_overlap_pairs,
)

K, W = 8, 4


def _normalize(text: str) -> str:
    # mirror functions.text.tokens: lowercase, strip non-alnum, single-space
    cleaned = re.sub(r"[^a-z0-9 \t\n\r]", "", text.lower())
    return " ".join(cleaned.split())


def _md5_int60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _winnow_py(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    norm = _normalize(text)
    if len(norm) < k + w - 1:
        return set()
    hs = [_md5_int60(norm[i : i + k]) for i in range(len(norm) - k + 1)]
    out: set[tuple[int, int]] = set()
    for j in range(len(hs) - w + 1):
        best_h, best_p = None, -1
        for i in range(j, j + w):
            if best_h is None or hs[i] <= best_h:
                best_h, best_p = hs[i], i
        out.add((best_p + 1, best_h))  # 1-based pos, as in the operator
    return out


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)


class TestOracleParity:
    def test_matches_pure_python(self, spark, docs):
        got: dict[int, set[tuple[int, int]]] = {}
        for r in winnow_fingerprints(docs, k=K, w=W).collect():
            got.setdefault(r.doc_id, set()).add((r.pos, r.fingerprint))
        rows = docs.select("doc_id", "text").collect()
        assert rows
        for r in rows:
            want = _winnow_py(r.text or "")
            assert got.get(r.doc_id, set()) == want, r.doc_id

    def test_short_docs_absent(self, spark):
        df = spark.createDataFrame(
            [(1, "tiny"), (2, "x " * 50)], "doc_id int, text string"
        )
        ids = {r.doc_id for r in winnow_fingerprints(df, k=K, w=W).collect()}
        assert ids == {2}


class TestGuarantee:
    def test_shared_substring_always_detected(self, spark):
        # any shared run of >= k + w - 1 normalized chars must yield a
        # shared fingerprint (SIGMOD'03 guarantee threshold t)
        rng = random.Random(7)
        alpha = "abcdefghijklmnopqrstuvwxyz"
        shared = "".join(rng.choice(alpha + " ") for _ in range(K + W - 1))
        rows = []
        for d in range(20):
            pre = "".join(rng.choice(alpha + " ") for _ in range(rng.randrange(30, 80)))
            post = "".join(rng.choice(alpha + " ") for _ in range(rng.randrange(30, 80)))
            rows.append((d, f"{pre} {shared} {post}"))
        df = spark.createDataFrame(rows, "doc_id int, text string")
        fps = winnow_fingerprints(df, k=K, w=W)
        pairs = winnow_overlap_pairs(fps, min_shared=1, max_df=64)
        found = {(r.doc_a, r.doc_b) for r in pairs.collect()}
        want = {(a, b) for a in range(20) for b in range(a + 1, 20)}
        assert want <= found

    def test_disjoint_texts_share_nothing(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha bravo charlie delta echo foxtrot golf hotel india"),
             (2, "one two three four five six seven eight nine ten eleven")],
            "doc_id int, text string",
        )
        fps = winnow_fingerprints(df, k=K, w=W)
        assert winnow_overlap_pairs(fps, min_shared=1).count() == 0


class TestDensity:
    def test_expected_density_two_over_w_plus_one(self, spark):
        rng = random.Random(11)
        text = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(4000))
        df = spark.createDataFrame([(1, text)], "doc_id int, text string")
        n_sel = winnow_fingerprints(df, k=K, w=W).count()
        norm = _normalize(text)
        n_grams = len(norm) - K + 1
        density = n_sel / n_grams
        # expectation 2/(w+1) = 0.4 for w=4; generous band for one sample
        assert 0.25 < density < 0.55


class TestPlanShape:
    def test_fingerprints_zero_shuffle(self, spark):
        df = spark.createDataFrame([(1, "a" * 100)], "doc_id int, text string")
        plan = winnow_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_df_cap_drops_boilerplate(self, spark):
        # one fingerprint common to many docs, over the cap -> contributes
        # no pairs; pair plan must not explode on the hot key
        base = "the quick brown fox jumps over the lazy dog again and again"
        df = spark.createDataFrame(
            [(d, base) for d in range(12)], "doc_id int, text string"
        )
        fps = winnow_fingerprints(df, k=K, w=W)
        assert winnow_overlap_pairs(fps, min_shared=1, max_df=8).count() == 0
        assert winnow_overlap_pairs(fps, min_shared=1, max_df=12).count() == 66

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
        with pytest.raises(ValueError):
            winnow_fingerprints(df, k=0)
        with pytest.raises(ValueError):
            winnow_overlap_pairs(winnow_fingerprints(df), min_shared=0)


class TestOverlapSpans:
    def test_span_bounds_localize_the_planted_passage(self, spark):
        # doc 1: [filler ~100 chars][SHARED ~60 chars][filler ~80 chars]
        # doc 2: [SHARED][filler] — the span must sit inside the shared
        # region on both sides (within w of its true edges)
        import hashlib

        from document_clustering_with_hadoop_mapreduce_spark.operators.winnow import (
            winnow_overlap_spans,
        )

        f1 = "left filler " * 8            # 96 chars
        f2 = "tail padding " * 6           # 78 chars
        sh = hashlib.md5(b"passage").hexdigest() + " " + hashlib.md5(b"two").hexdigest()
        d1 = f1 + sh + " " + f2
        d2 = sh + " completely different trailing content here"
        df = spark.createDataFrame([(1, d1), (2, d2)], "doc_id int, text string")
        fps = winnow_fingerprints(df, k=K, w=W)
        spans = winnow_overlap_spans(fps, min_shared=1, max_df=8).collect()
        assert len(spans) == 1
        r = spans[0]
        assert (r.doc_a, r.doc_b) == (1, 2)
        sh_norm = _normalize(sh)
        d1_norm = _normalize(d1)
        sh_at = d1_norm.index(sh_norm) + 1  # 1-based
        assert sh_at - W <= r.a_start and r.a_end <= sh_at + len(sh_norm)
        assert r.b_start <= 1 + W and r.b_end <= len(sh_norm) + W
        assert r.shared > 5

    def test_consistent_with_overlap_pairs(self, spark):
        import random

        from document_clustering_with_hadoop_mapreduce_spark.operators.winnow import (
            winnow_overlap_spans,
        )

        rng = random.Random(3)
        alpha = "abcdefghij "
        shared = "".join(rng.choice(alpha) for _ in range(40))
        rows = [
            (d, "".join(rng.choice(alpha) for _ in range(60)) + shared)
            for d in range(8)
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        fps = winnow_fingerprints(df, k=K, w=W)
        pairs = {
            (r.doc_a, r.doc_b): r.shared
            for r in winnow_overlap_pairs(fps, min_shared=2, max_df=16).collect()
        }
        spans = {
            (r.doc_a, r.doc_b): r.shared
            for r in winnow_overlap_spans(fps, min_shared=2, max_df=16).collect()
        }
        assert pairs == spans

    def test_precap_df_count_is_aggregate_not_collect_set_window(self, spark):
        # The df cap must never buffer a fingerprint's full posting list
        # in window state before the <= max_df filter: the hot keys the
        # cap drops are exactly the ones whose collect_set would blow up
        # at scale. The spans path therefore counts docs with a bounded-
        # state groupBy/countDistinct, not a collect_set window.
        from document_clustering_with_hadoop_mapreduce_spark.operators.winnow import (
            winnow_overlap_spans,
        )

        df = spark.createDataFrame([(1, "a b c " * 30)], "doc_id int, text string")
        fps = winnow_fingerprints(df, k=K, w=W)
        plan = (
            winnow_overlap_spans(fps, min_shared=1, max_df=8)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "collect_set" not in plan
        assert "Window" not in plan
