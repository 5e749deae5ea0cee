"""Task-facade pipelines over the reference's own fixtures.

The operator cores are golden-verified in test_golden_parity.py; these
check the end-to-end shells (file in -> file out, reference formats).
"""

from __future__ import annotations

import os
import zipfile

import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark import pipelines as P

REF = "/root/reference/sources"


def _ref(path: str) -> str:
    p = os.path.join(REF, path)
    if not os.path.exists(p):
        pytest.skip(f"reference fixture missing: {p}")
    return p


@pytest.mark.slow
def test_task_chain_1_2_to_1_4(spark, tmp_path):
    """1.2 over the golden 1.1 matrix writes a valid sorted MTX; 1.4 reads
    1.2's committed input and reproduces the golden row count; 1.3 returns
    the top-10."""
    out12 = str(tmp_path / "t12.mtx")
    f = P.task_1_2_min_freq_filter(spark, _ref("1.2/input/OutputTask1_1.mtx"),
                                   out_mtx=out12)
    assert os.path.exists(out12)
    with open(out12, encoding="utf-8") as fh:
        lines = fh.read().splitlines()
    assert lines[0].startswith("%%MatrixMarket")
    assert lines[2:] == sorted(lines[2:])  # O1 string order
    assert len(lines) - 2 == f.count()

    top = P.task_1_3_top_terms(spark, _ref("1.3/input/output_1_2.mtx")).collect()
    assert len(top) == 10
    assert top[0]["total_freq"] >= top[-1]["total_freq"]

    out14 = str(tmp_path / "t14.mtx")
    t = P.task_1_4_tfidf(spark, _ref("1.4/input/output_1_2.mtx"),
                         out_mtx=out14, compat_n1=True)
    n_golden = 141455
    assert t.count() == n_golden
    with open(out14, encoding="utf-8") as fh:
        first = fh.readline().split()
    assert len(first) == 3 and "." in first[2]  # headerless %.6f triples


def test_task_1_5_categories_from_docnames(spark):
    top = P.task_1_5_category_top_terms(
        spark, _ref("1.5/input/task_1_4.mtx"), _ref("1.1/input/bbc.docs"), k=5
    )
    rows = top.collect()
    cats = {r["category"] for r in rows}
    assert cats == {"business", "entertainment", "politics", "sport", "tech"}
    assert all(1 <= r["rank"] <= 5 for r in rows)
    assert len(rows) == 25


def test_task_2_1_converges(spark):
    assigned, centroids = P.task_2_1_kmeans_2d(spark, _ref("2.1/input/2DPoints.csv"), k=3)
    assert len(centroids) == 3
    rows = assigned.collect()
    assert len(rows) == 500
    assert {r["cluster"] for r in rows} == {0, 1, 2}


@pytest.mark.slow
def test_task_2_2_and_2_3_doc_kmeans(spark):
    model, assigned = P.task_2_2_doc_kmeans(
        spark, _ref("2.2/input/task_1_4.mtx"), k=5, max_iter=3
    )
    n = assigned.count()
    assert n > 2000  # 2,225 docs
    assert assigned.select("cluster").distinct().count() <= 5
    m3, a3 = P.task_2_3_doc_kmeans_scalable(
        spark, _ref("2.3/input/task_1_4.mtx"), k=5, max_iter=3
    )
    assert a3.count() == n


def test_task_2_1_recovers_true_classes(spark):
    """The 2-D points carry ground-truth labels (cls 1..3); converged
    Lloyd must recover them up to label permutation — the capability the
    reference's unseeded runs could never assert (SURVEY.md §5 item 4)."""
    from itertools import permutations

    from document_clustering_with_hadoop_mapreduce_spark.sources.corpus import read_points_csv

    pts = read_points_csv(spark, _ref("2.1/input/2DPoints.csv")).collect()
    assigned, _ = P.task_2_1_kmeans_2d(spark, _ref("2.1/input/2DPoints.csv"), k=3)
    got = {(round(r["x1"], 9), round(r["x2"], 9)): r["cluster"] for r in assigned.collect()}
    truth = [((round(r["x1"], 9), round(r["x2"], 9)), r["cls"]) for r in pts]
    best = 0.0
    for perm in permutations(range(3)):
        agree = sum(1 for key, cls in truth if perm[got[key]] + 1 == cls)
        best = max(best, agree / len(truth))
    assert best > 0.9, f"best label agreement only {best:.3f}"
