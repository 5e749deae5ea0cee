"""containment_pairs: asymmetric embedded-document detection."""

from __future__ import annotations

import pandas as pd
import pytest

from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
    containment_oracle_sql,
    containment_pairs,
    shingles,
)

from conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def planted(spark, duck):
    """Doc 1 is verbatim embedded in doc 2 (with a long unique tail);
    docs 3/4 overlap partially; doc 5 is unrelated."""
    core = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    tail = " ".join(f"tail{i} filler{i} pad{i}" for i in range(30))
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                core,
                core + " " + tail,
                "one two three four five six seven eight",
                "three four five six seven eight nine ten",
                "totally unrelated content words here only",
            ],
        }
    )
    duck.register("ct_mini", pdf)
    return spark.createDataFrame(pdf)


def test_matches_oracle(planted, duck):
    got = containment_pairs(shingles(planted, n=3), min_containment=0.5)
    assert_matches_oracle(
        got, duck, containment_oracle_sql(n=3, min_containment=0.5, source="ct_mini")
    )


def test_embedded_doc_fully_contained_but_low_jaccard(planted):
    rows = {(r["doc_a"], r["doc_b"]): r for r in
            containment_pairs(shingles(planted, n=3), min_containment=0.8).collect()}
    r = rows[(1, 2)]
    assert r["c_a_in_b"] == 1.0          # every shingle of 1 is in 2
    assert r["c_b_in_a"] < 0.15          # 2 is much bigger
    assert r["jaccard"] < 0.15           # symmetric measure misses it
    assert (3, 4) not in rows            # partial overlap below 0.8


def test_partial_overlap_passes_lower_threshold(planted):
    rows = {(r["doc_a"], r["doc_b"])
            for r in containment_pairs(shingles(planted, n=3), min_containment=0.5).collect()}
    assert (1, 2) in rows and (3, 4) in rows
    assert not any(5 in p for p in rows)


def test_no_per_doc_broadcast(planted):
    plan = (
        containment_pairs(shingles(planted, n=3))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_prefix_candidates_cover_all_true_pairs(planted):
    """No-false-negative guarantee of the prefix filter: candidates must be
    a superset of the exhaustive miner's pairs, at several thresholds."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
        containment_candidate_pairs,
    )

    sh = shingles(planted, n=3)
    for t in (0.5, 0.8, 1.0):
        cand = {(r["doc_a"], r["doc_b"])
                for r in containment_candidate_pairs(sh, t).collect()}
        true = {(r["doc_a"], r["doc_b"])
                for r in containment_pairs(sh, t).collect()}
        assert true <= cand, f"t={t}: missing {true - cand}"


def test_candidate_verify_equals_exhaustive(spark, sf_dir):
    """generate -> verify == exhaustive containment on the real fixture."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
        containment_candidate_pairs,
        containment_verify_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = shingles(docs, n=3).localCheckpoint()
    t = 0.5
    cand = containment_candidate_pairs(sh, t)
    via_prefix = {tuple(r) for r in containment_verify_pairs(cand, sh, t).collect()}
    exhaustive = {tuple(r) for r in containment_pairs(sh, t).collect()}
    assert via_prefix == exhaustive


def test_prefix_prunes_join_volume(spark):
    """2,000 docs sharing one ubiquitous boilerplate shingle: the full
    self-join materializes every pair through that hot key (~2M rows);
    rarity-ordered prefixes exclude the hot shingle at t=0.8 for all but
    the shortest docs, so the candidate set must stay far below the
    all-sharing-pairs count."""
    import pandas as pd
    from pyspark.sql import functions as F2
    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
        containment_candidate_pairs,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": range(2000),
            "text": [
                f"shared boilerplate header line unique{i} token{i} word{i} tail{i} end{i}"
                for i in range(2000)
            ],
        }
    )
    sh = shingles(spark.createDataFrame(pdf), n=3).localCheckpoint()
    n_cand = containment_candidate_pairs(sh, 0.8).count()
    all_sharing = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F2.col("a.doc_id") < F2.col("b.doc_id"))
        .select("a.doc_id", "b.doc_id").distinct().count()
    )
    assert all_sharing > 1_000_000
    assert n_cand < all_sharing / 100, (n_cand, all_sharing)


def test_threshold_validation(planted):
    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
        containment_candidate_pairs,
    )
    import pytest as pt

    with pt.raises(ValueError, match="min_containment"):
        containment_candidate_pairs(shingles(planted, n=3), 0.0)


def test_prefix_superset_property_random_corpora(spark):
    """Hypothesis: on random small corpora and thresholds, prefix-filtered
    candidates are ALWAYS a superset of the exhaustive miner's pairs (the
    no-false-negative guarantee, adversarial word overlap included)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    import pandas as pd
    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
        containment_candidate_pairs,
    )

    words = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
    docs_strat = st.lists(
        st.lists(words, min_size=3, max_size=12).map(" ".join),
        min_size=2,
        max_size=8,
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=docs_strat, t=st.sampled_from([0.4, 0.7, 1.0]))
    def check(texts, t):
        pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        sh = shingles(spark.createDataFrame(pdf), n=2)
        cand = {(r["doc_a"], r["doc_b"])
                for r in containment_candidate_pairs(sh, t).collect()}
        true = {(r["doc_a"], r["doc_b"])
                for r in containment_pairs(sh, t).collect()}
        assert true <= cand, (texts, t, true - cand)

    check()
