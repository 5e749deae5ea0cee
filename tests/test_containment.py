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
