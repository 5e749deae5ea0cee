"""Structural invariants for duplicate-cluster resolution and tf-idf
cosine pairs (value-level parity is covered by the oracle sweep)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
    duplicate_components,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_hashes,
    tfidf_cosine_pairs,
)
from document_clustering_with_hadoop_mapreduce_spark.operators.term_matrix import term_doc_counts
from document_clustering_with_hadoop_mapreduce_spark.operators.tfidf import tfidf
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table


def _components(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(shingle_hashes(docs, n=3), num_hashes=16, seed=42)
    pairs = lsh_candidate_pairs(sigs, num_hashes=16, rows_per_band=2).cache()
    comp = duplicate_components(pairs, documents=docs).cache()
    return docs, pairs, comp


def test_components_are_consistent(spark, sf_dir):
    docs, pairs, comp = _components(spark, sf_dir)
    # total function: one label per document
    assert comp.count() == docs.count()
    # both endpoints of every candidate pair share a component
    ca = comp.select(F.col("doc_id").alias("doc_a"), F.col("component").alias("ca"))
    cb = comp.select(F.col("doc_id").alias("doc_b"), F.col("component").alias("cb"))
    split = pairs.join(ca, "doc_a").join(cb, "doc_b").filter("ca <> cb")
    assert split.count() == 0
    # representative is the component MIN, and is itself a member
    assert comp.filter(F.col("component") > F.col("doc_id")).count() == 0
    reps = comp.select(F.col("component").alias("doc_id")).distinct()
    not_self = reps.join(
        comp.filter(F.col("doc_id") == F.col("component")), "doc_id", "left_anti"
    )
    assert not_self.count() == 0


def _python_cc(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize: component = min reachable
    return {n: find(n) for n in parent}


@pytest.mark.slow
def test_star_components_matches_flood_on_lsh_graph(spark, sf_dir):
    """Kiveris star contraction and the min-label flood resolve the SAME
    components on the real LSH candidate graph."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import star_components

    docs, pairs, comp = _components(spark, sf_dir)
    star = star_components(pairs, documents=docs)
    flood = {r["doc_id"]: r["component"] for r in comp.collect()}
    got = {r["doc_id"]: r["component"] for r in star.collect()}
    assert got == flood


@pytest.mark.slow
def test_star_components_random_graphs_vs_union_find(spark):
    """Randomized cross-check: star contraction equals a python union-find
    on arbitrary (non-LSH-shaped) graphs."""
    import random

    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import star_components

    rng = random.Random(1234)
    for trial in range(3):
        n = 120
        edges = set()
        for _ in range(130):
            a, b = rng.sample(range(n), 2)
            edges.add((min(a, b), max(a, b)))
        pairs = spark.createDataFrame(
            sorted(edges), "doc_a LONG, doc_b LONG"
        )
        got = {
            r["doc_id"]: r["component"]
            for r in star_components(pairs).collect()
        }
        want = _python_cc(sorted(edges))
        assert got == want, f"trial {trial}"


@pytest.mark.slow
def test_star_components_survives_adversarial_chain(spark):
    """An 80-hop path graph: the flood needs diameter rounds (raises loudly
    at max_rounds=10 — the documented failure mode), while star contraction
    converges in O(log n) alternations."""
    import pytest as _pytest

    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import star_components

    chain = [(i, i + 1) for i in range(80)]
    pairs = spark.createDataFrame(chain, "doc_a LONG, doc_b LONG")
    with _pytest.raises(RuntimeError, match="did not converge"):
        duplicate_components(pairs, max_rounds=10)
    got = {
        r["doc_id"]: r["component"]
        for r in star_components(pairs, max_rounds=15).collect()
    }
    assert set(got) == set(range(81))
    assert set(got.values()) == {0}


def test_lsh_hot_bucket_guard_bounds_output(spark):
    """Adversarial skew: 500 identical (boilerplate) docs collapse into ONE
    (band_idx, band_key) bucket per band. Unguarded, the band self-join
    emits |bucket|^2/2 = 124,750 pairs — quadratic output volume that AQE
    cannot shrink. The guard degrades the hot bucket to a star on the
    bucket-min doc: 499 pairs, and the duplicate components are unchanged
    (the star spans exactly the component the clique would)."""
    docs = spark.createDataFrame(
        [(i, "common boilerplate header repeated on every page of the site") for i in range(500)],
        "doc_id LONG, text STRING",
    )
    sigs = minhash_signatures(shingle_hashes(docs, n=3), num_hashes=16, seed=42).cache()
    guarded = lsh_candidate_pairs(sigs, num_hashes=16, rows_per_band=2).cache()
    assert guarded.count() == 499  # linear in bucket size, not 124,750
    assert guarded.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0
    comp = duplicate_components(guarded, documents=docs).collect()
    assert len(comp) == 500
    assert {r["component"] for r in comp} == {0}
    sigs.unpersist()
    guarded.unpersist()


@pytest.mark.slow
def test_lsh_guard_inactive_below_cap_and_preserves_components(spark, sf_dir):
    """On the real corpus (max bucket 4 at sf0.001) the default cap never
    triggers — guarded output is pair-for-pair identical to unguarded. And
    even with an aggressively small cap that forces star-degrade, the
    downstream duplicate components are IDENTICAL (the guard's documented
    lossless-for-components contract)."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(shingle_hashes(docs, n=3), num_hashes=16, seed=42).cache()
    full = lsh_candidate_pairs(sigs, max_bucket_size=None).cache()
    default = lsh_candidate_pairs(sigs)  # default cap
    key = lambda r: (r["doc_a"], r["doc_b"])  # noqa: E731
    assert sorted(map(key, default.collect())) == sorted(map(key, full.collect()))
    capped = lsh_candidate_pairs(sigs, max_bucket_size=2)
    comp_full = {
        r["doc_id"]: r["component"]
        for r in duplicate_components(full, documents=docs).collect()
    }
    comp_capped = {
        r["doc_id"]: r["component"]
        for r in duplicate_components(capped, documents=docs).collect()
    }
    assert comp_capped == comp_full
    sigs.unpersist()
    full.unpersist()


def test_cosine_pairs_bounds_and_canonical_order(spark, sf_dir):
    m = tfidf(term_doc_counts(load_table(spark, sf_dir, "documents")))
    got = tfidf_cosine_pairs(m, top_t=20, min_cosine=0.5).cache()
    n = got.count()
    # normalized vectors: cosine in [threshold, 1] (+6dp rounding slack)
    assert got.filter((F.col("cosine") < 0.5) | (F.col("cosine") > 1.000001)).count() == 0
    # canonical a<b pair space, no self-pairs, no duplicates
    assert got.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0
    assert got.select("doc_a", "doc_b").distinct().count() == n


@pytest.mark.slow
def test_cosine_pairs_engines_identical(spark, sf_dir):
    """The block-matmul engine must produce the EXACT frame of the
    inverted-index triples engine — same pairs, same 6dp HALF_UP cosines —
    across thresholds, block counts, and a row_chunk small enough to
    force the chunked-matmul path (incl. blocks larger than the chunk)."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
        tfidf_cosine_pairs_blocked,
    )

    m = tfidf(term_doc_counts(load_table(spark, sf_dir, "documents"))).cache()
    for thresh in (0.5, 0.9):
        want = sorted(
            tuple(r) for r in tfidf_cosine_pairs(m, top_t=20, min_cosine=thresh).collect()
        )
        assert want  # non-vacuous at both thresholds on the fixture
        for n_blocks, row_chunk in ((1, 7), (3, 2048), (8, 2048)):
            got = sorted(
                tuple(r)
                for r in tfidf_cosine_pairs_blocked(
                    m, top_t=20, min_cosine=thresh, n_blocks=n_blocks, row_chunk=row_chunk
                ).collect()
            )
            assert got == want, (thresh, n_blocks, row_chunk)
    m.unpersist()


def test_cosine_pairs_blocked_validation(spark, sf_dir):
    import pytest

    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
        tfidf_cosine_pairs_blocked,
    )

    m = tfidf(term_doc_counts(load_table(spark, sf_dir, "documents")))
    with pytest.raises(ValueError):
        tfidf_cosine_pairs_blocked(m, n_blocks=0)
    with pytest.raises(ValueError):
        tfidf_cosine_pairs_blocked(m, row_chunk=0)


def test_lsh_guard_oracle_parity_when_cap_triggers(spark, sf_dir, duck):
    """Cross-engine value gate for the star-degrade path itself: with a cap
    small enough to trigger on the real corpus, the Spark guard and the
    generated guarded DuckDB SQL emit identical pair sets (the registered
    query's default-cap parity is the oracle sweep; this pins the
    above-cap branch)."""
    from conftest import assert_matches_oracle

    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import minhash_oracle_sql
    from document_clustering_with_hadoop_mapreduce_spark.plans.oracles import TOKENS_CTE

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(shingle_hashes(docs, n=3), num_hashes=16, seed=42)
    got = lsh_candidate_pairs(sigs, max_bucket_size=2)
    sql = minhash_oracle_sql(TOKENS_CTE, max_bucket_size=2)["lsh_candidate_pairs"]
    assert_matches_oracle(got, duck, sql)


def test_simhash_pairs_recall_one_vs_bruteforce(spark, sf_dir):
    """Pigeonhole recall: with bands=4, max_hamming=3 and NO bucket cap,
    the banded join must find EXACTLY the brute-force hamming<=3 pair set
    (computed in python over the collected fingerprints). Uncapped on
    purpose — with the cap the guarantee is conditional (see the operator
    docstring) and the equality would silently depend on fixture bucket
    sizes."""
    from itertools import combinations

    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs,
    )
    from document_clustering_with_hadoop_mapreduce_spark.operators.term_matrix import (
        term_doc_counts,
    )

    fp = simhash_fingerprints(term_doc_counts(load_table(spark, sf_dir, "documents")))
    fp = fp.cache()
    rows = {r["doc_id"]: r["simhash"] for r in fp.collect()}
    want = {
        (a, b, bin(rows[a] ^ rows[b]).count("1"))
        for a, b in combinations(sorted(rows), 2)
        if bin(rows[a] ^ rows[b]).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_pairs(fp, bands=4, max_hamming=3, max_bucket_size=None).collect()
    }
    assert got == want
    fp.unpersist()


def test_simhash_pairs_hot_bucket_guard(spark):
    """500 identical docs -> one bucket per band; the guard emits the
    499-edge star (hamming 0) instead of 124,750 pairs."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs,
    )
    from document_clustering_with_hadoop_mapreduce_spark.operators.term_matrix import (
        term_doc_counts,
    )

    docs = spark.createDataFrame(
        [(i, "common boilerplate header repeated on every page") for i in range(500)],
        "doc_id LONG, text STRING",
    )
    fp = simhash_fingerprints(term_doc_counts(docs))
    got = simhash_pairs(fp, bands=4, max_hamming=3).cache()
    assert got.count() == 499
    assert got.filter("hamming <> 0").count() == 0
    assert got.filter("doc_a <> 0").count() == 0  # star on the min doc
    got.unpersist()


def test_jaccard_verify_pairs_matches_full_baseline(spark, sf_dir):
    """Candidate verification must agree value-for-value with the full
    jaccard_pairs baseline on every pair both produce, and never emit a
    pair the baseline would reject at the same threshold (string and hash
    shingle inputs both; hash stream is distinct-ed internally)."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_verify_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_hashes,
        shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    hashes = shingle_hashes(docs, n=3)
    cand = lsh_candidate_pairs(minhash_signatures(hashes), max_bucket_size=None)
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(shingles(docs, n=3), min_jaccard=0.2).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_verify_pairs(cand, hashes, min_jaccard=0.2).collect()
    }
    # verified-candidate results are a subset of the full baseline (LSH
    # recall < 1 at 0.2 is fine) with identical values where both appear
    for pair, j in got.items():
        assert pair in full and full[pair] == j, pair


def test_simhash_pairs_rejects_mismatched_bits(spark):
    """Fingerprints carry their width in column metadata; banding with a
    different `bits` would silently cover only the low chunks and lose the
    pigeonhole guarantee — it must fail loudly at plan time instead."""
    import pytest

    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs,
    )
    from document_clustering_with_hadoop_mapreduce_spark.operators.term_matrix import (
        term_doc_counts,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta delta")], "doc_id LONG, text STRING"
    )
    fp48 = simhash_fingerprints(term_doc_counts(docs), bits=48)
    with pytest.raises(ValueError, match="bits=48"):
        simhash_pairs(fp48, bits=32)
    # matching width still works
    assert simhash_pairs(fp48, bits=48, bands=4, max_hamming=3).count() >= 0
    # widths beyond the 60-bit term hash are degenerate and refused
    with pytest.raises(ValueError, match=r"\[1, 60\]"):
        simhash_fingerprints(term_doc_counts(docs), bits=64)
