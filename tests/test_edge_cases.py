"""Degenerate-input semantics: empty corpora, sub-shingle docs, singleton
graphs. At 100 TB these are not exotic — empty partitions, all-stopword
documents and dup-free shards are routine, and an operator that throws or
mislabels on them poisons a whole job.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
    duplicate_components,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_hashes,
    shingles,
    simhash_fingerprints,
    simhash_pairs,
    star_components,
)
from document_clustering_with_hadoop_mapreduce_spark.operators.term_matrix import (
    term_doc_counts,
)
from document_clustering_with_hadoop_mapreduce_spark.operators.tfidf import tfidf

_DOCS_SCHEMA = "doc_id LONG, text STRING"


def _docs(spark, rows):
    return spark.createDataFrame(rows, _DOCS_SCHEMA)


def test_empty_corpus_flows_through_text_pipeline(spark):
    """Zero documents -> zero rows everywhere, no exceptions, schemas
    intact (the shape an empty input split produces)."""
    empty = _docs(spark, [])
    m = term_doc_counts(empty)
    assert m.count() == 0
    assert [f.name for f in m.schema.fields] == ["doc_id", "term", "cnt"]
    t = tfidf(m, n_docs=0)
    assert t.count() == 0
    assert simhash_fingerprints(m).count() == 0
    assert minhash_signatures(shingle_hashes(empty)).count() == 0
    assert lsh_candidate_pairs(minhash_signatures(shingle_hashes(empty))).count() == 0
    assert jaccard_pairs(shingles(empty)).count() == 0


def test_all_stopword_and_subshingle_docs(spark):
    """Docs whose text dies in cleaning (all stopwords / empty) vanish from
    the matrix; docs shorter than the shingle width produce no shingles but
    must not break the pipeline or other docs' signatures."""
    docs = _docs(
        spark,
        [
            (1, "the and of to in"),          # all stopwords -> no matrix rows
            (2, ""),                           # empty text
            (3, "alpha beta"),                 # < 3 tokens -> no 3-shingles
            (4, "alpha beta gamma delta"),     # normal
        ],
    )
    m = term_doc_counts(docs)
    assert {r["doc_id"] for r in m.select("doc_id").distinct().collect()} == {3, 4}
    sigs = minhash_signatures(shingle_hashes(docs, n=3))
    # only doc 4 has >= 3 tokens (stopwords are KEPT for dedup, so doc 1
    # still shingles: 5 tokens -> 3 shingles)
    assert {r["doc_id"] for r in sigs.select("doc_id").collect()} == {1, 4}
    # sub-shingle docs are absent from the candidate graph; components
    # still label every doc (singletons map to themselves)
    comp = duplicate_components(
        lsh_candidate_pairs(sigs), documents=docs, max_rounds=5
    )
    got = {r["doc_id"]: r["component"] for r in comp.collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[2] == 2 and got[3] == 3


@pytest.mark.slow
def test_single_doc_corpus_tfidf_and_pairs(spark):
    """One document: idf = ln(1/1) = 0 -> all tfidf 0; no pair operator
    may emit anything."""
    docs = _docs(spark, [(7, "alpha beta gamma alpha")])
    t = tfidf(term_doc_counts(docs), n_docs=1)
    vals = {r["tfidf"] for r in t.collect()}
    assert vals == {0.0}
    sigs = minhash_signatures(shingle_hashes(docs, n=3))
    assert lsh_candidate_pairs(sigs).count() == 0
    fp = simhash_fingerprints(term_doc_counts(docs))
    assert simhash_pairs(fp).count() == 0


def test_components_on_empty_and_singleton_graphs(spark):
    """Empty pair set: every doc is its own component, both CC algorithms."""
    docs = _docs(spark, [(1, "a"), (2, "b"), (3, "c")])
    empty_pairs = spark.createDataFrame([], "doc_a LONG, doc_b LONG")
    for algo in (duplicate_components, star_components):
        got = {
            r["doc_id"]: r["component"]
            for r in algo(empty_pairs, documents=docs, max_rounds=3).collect()
        }
        assert got == {1: 1, 2: 2, 3: 3}, algo.__name__


@pytest.mark.slow
def test_similarity_empty_and_overlong_k(spark):
    """Degenerate similarity inputs flow through (round 9): an EMPTY query
    frame yields an empty result (not an error) on both closure-probe
    scorers, and k larger than the corpus returns every candidate ranked
    rather than failing."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        lsh_bucketed_topk,
        random_hyperplanes,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    none = emb.filter("vec_id < 0")
    assert cosine_topk(emb, none, k=3).count() == 0
    assert ivf_topk(emb, none, n_cells=2, nprobe=1, k=3).count() == 0
    # k > corpus: every non-self candidate comes back, ranks contiguous
    got = cosine_topk(emb, emb.limit(1), k=100).collect()
    assert len(got) == 7
    assert sorted(r["rank"] for r in got) == list(range(1, 8))
    planes = random_hyperplanes(4, 3, seed=7)
    # one-row corpus: no same-bucket neighbor, empty but well-formed
    assert lsh_bucketed_topk(emb.limit(1), planes, k=3).count() == 0
