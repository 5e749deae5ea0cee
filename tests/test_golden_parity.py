"""Golden-diff parity against the reference's committed outputs.

SURVEY.md §5 verified which goldens are trustworthy; each trusted chain gets
an exact (or 1e-6) comparison here:

- task 1.1: BBC corpus zip -> tokenize/clean(P2 exact)/stopword/vocab-join
            -> counts == OutputTask1_1.mtx (142,278 triples, exact)
- task 1.2: golden 1.1 matrix (WITH the N6 leaked dims row) -> corpus-freq
            >= 3 filter == Output_Task1_2.mtx (exact, incl. the leak)
- task 1.4: committed input -> N1-compat tf-idf == task_1_4.mtx (<=1e-5 abs,
            golden is %.6f-rounded)
- task 2.1: golden final centroids -> nearest-assignment reproduces
            task_2_1.classes exactly AND per-cluster means reproduce
            task_2_1.clusters to 1e-9 (the goldens' own fixed point).

The BBC corpus test extracts the committed zip to a tmp dir (the repo never
writes outside tmp). Reference fixtures are read-only inputs here — no
reference *code* is involved.
"""

from __future__ import annotations

import os
import zipfile

import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.compat import clean_text_ref
from document_clustering_with_hadoop_mapreduce_spark.operators.kmeans import assign_nearest
from document_clustering_with_hadoop_mapreduce_spark.operators.term_matrix import (
    filter_min_corpus_freq,
)
from document_clustering_with_hadoop_mapreduce_spark.operators.tfidf import tfidf
from document_clustering_with_hadoop_mapreduce_spark.sources.corpus import (
    load_line_dict,
    load_stopwords,
    read_corpus,
    read_points_csv,
)
from document_clustering_with_hadoop_mapreduce_spark.sources.mtx import (
    mtx_dims,
    read_mtx,
)

REF = "/root/reference/sources"


def _ref(path: str) -> str:
    p = os.path.join(REF, path)
    if not os.path.exists(p):
        pytest.skip(f"reference fixture missing: {p}")
    return p


def test_mtx_reader_dims_and_counts(spark):
    path = _ref("1.2/input/OutputTask1_1.mtx")
    d = mtx_dims(path)
    assert (d.n_rows, d.n_cols, d.nnz) == (9635, 2225, 142278)
    m = read_mtx(spark, path)
    assert m.count() == 142278
    agg = m.agg(
        F.max("term_id").alias("mt"), F.max("doc_id").alias("md")
    ).collect()[0]
    assert (agg["mt"], agg["md"]) == (9635, 2225)


@pytest.mark.slow
def test_task1_1_bbc_corpus_exact(spark, tmp_path):
    """Full task 1.1 parity: 142,278 (termId, docId, count) triples, exact."""
    zpath = _ref("1.1/input/bbc-fulltext.zip")
    corpus_dir = tmp_path / "bbc"
    with zipfile.ZipFile(zpath) as z:
        z.extractall(corpus_dir)

    docs = read_corpus(spark, str(corpus_dir), wholetext=True)
    stop = load_stopwords(spark, _ref("1.1/input/stopwords.txt"))
    terms_dict = load_line_dict(
        spark, _ref("1.1/input/bbc.terms"), token_col="term", id_col="term_id"
    )
    docs_dict = load_line_dict(
        spark, _ref("1.1/input/bbc.docs"), token_col="doc_name", id_col="did"
    )

    # reference order: whitespace-tokenize RAW text, clean each token with
    # the exact P2 charset, drop stopwords/empties, then vocab-join (OOV drop)
    toks = docs.select(
        F.col("doc_id").alias("doc_name"),
        F.explode(F.split(F.trim("text"), r"\s+")).alias("raw"),
    ).select("doc_name", clean_text_ref(F.col("raw")).alias("term"))
    toks = toks.filter((F.col("term") != "") & ~F.col("term").isin(*stop))
    counted = (
        toks.join(F.broadcast(terms_dict), "term")
        .groupBy("term_id", "doc_name")
        .agg(F.count(F.lit(1)).alias("value"))
        .join(F.broadcast(docs_dict), "doc_name")
        .select("term_id", F.col("did").alias("doc_id"), "value")
    )
    got = {
        (r["term_id"], r["doc_id"]): int(r["value"]) for r in counted.collect()
    }
    golden = read_mtx(spark, _ref("1.1/output/OutputTask1_1.mtx")).collect()
    want = {(r["term_id"], r["doc_id"]): int(r["value"]) for r in golden}
    assert len(want) == 142278
    missing = {k: v for k, v in want.items() if got.get(k) != v}
    extra = {k: v for k, v in got.items() if k not in want}
    assert not missing and not extra, (
        f"{len(missing)} missing/wrong, {len(extra)} extra; "
        f"sample missing={list(missing.items())[:5]} extra={list(extra.items())[:5]}"
    )


def test_task1_2_min_freq_filter_exact(spark):
    """Filter >=3 over golden 1.1 (keeping the N6 leaked dims row as data)
    reproduces golden 1.2 exactly — SURVEY.md §5 chain-consistency."""
    m = read_mtx(
        spark, _ref("1.2/input/OutputTask1_1.mtx"), compat_n6=True
    ).withColumnRenamed("value", "cnt")
    filtered = filter_min_corpus_freq(
        m.withColumnRenamed("term_id", "term").withColumnRenamed("doc_id", "doc"), 3
    )
    got = {(r["term"], r["doc"]): int(r["cnt"]) for r in filtered.collect()}
    golden = read_mtx(spark, _ref("1.2/output/Output_Task1_2.mtx"), compat_n6=True)
    want = {(r["term_id"], r["doc_id"]): int(r["value"]) for r in golden.collect()}
    # golden file's own dims line is also present via compat_n6; drop it —
    # it is the 1.2 header, not data (the LEAKED row from 1.1 stays).
    d = mtx_dims(_ref("1.2/output/Output_Task1_2.mtx"))
    want.pop((d.n_rows, d.n_cols), None) if (
        want.get((d.n_rows, d.n_cols)) == d.nnz
    ) else None
    assert got == want, (
        f"{len(set(got) ^ set(want))} key diffs; "
        f"got-only={list(set(got) - set(want))[:5]} want-only={list(set(want) - set(got))[:5]}"
    )


def test_task1_4_tfidf_n1_numeric_parity(spark):
    """N1-compat tf-idf over the committed 1.4 input matches the golden
    matrix to 1e-5 (golden prints %.6f)."""
    m = read_mtx(spark, _ref("1.4/input/output_1_2.mtx")).select(
        F.col("doc_id"), F.col("term_id").alias("term"), F.col("value").alias("cnt")
    )
    out = tfidf(m, compat_n1=True).select("doc_id", "term", "tfidf")
    got = {(r["doc_id"], r["term"]): r["tfidf"] for r in out.collect()}
    # golden is doc-first (N2) and headerless triples after dedup (S10)
    golden = read_mtx(
        spark, _ref("1.4/output/task_1_4.mtx"), col_order=("doc_id", "term_id"),
        header=False,
    ).collect()
    want = {(r["doc_id"], r["term_id"]): r["value"] for r in golden}
    assert set(got) == set(want), (
        f"key sets differ by {len(set(got) ^ set(want))}"
    )
    worst = max(abs(got[k] - want[k]) for k in want)
    assert worst <= 1e-5, f"max abs diff {worst}"


def _parse_iter_file(path: str):
    """Parse a reference iter_<i>/part-r-00000: assignment lines
    ``<cluster>,\\t<x>,<y>`` plus ``centroids:<c>,\\t<x>,<y>`` lines holding
    the NEXT iteration's centroids (per-cluster means the reducer emitted —
    ref sources/2.1/source/task2_1.java:205-213)."""
    assigns, cents = [], {}
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            key, val = line.split("\t")
            key = key.rstrip(",")
            x, y = (float(v) for v in val.split(","))
            if key.startswith("centroids:"):
                cents[int(key.split(":")[1])] = [x, y]
            else:
                assigns.append((int(key), x, y))
    return assigns, cents


def test_task2_1_iteration_trajectory_replay(spark):
    """M6-M9 trajectory replay: seed from the golden iter_{i-1} 'centroids:'
    lines and verify that ONE engine step (assign_nearest + per-cluster
    means) reproduces the committed iter_i exactly — all three transitions
    iter_0->1->2->3 (ref sources/2.1/output/iterations/), assignments as
    exact multisets, means to 1e-9. This checks the whole iteration
    SEQUENCE, not just the converged fixed point."""
    pts = read_points_csv(spark, _ref("2.1/input/2DPoints.csv"))
    feats = pts.select(F.array("x1", "x2").alias("p"), "x1", "x2").cache()
    n_pts = feats.count()
    for i in (1, 2, 3):
        _, prev_cents = _parse_iter_file(
            _ref(f"2.1/output/iterations/iter_{i - 1}/part-r-00000")
        )
        cur_assigns, cur_cents = _parse_iter_file(
            _ref(f"2.1/output/iterations/iter_{i}/part-r-00000")
        )
        assert len(cur_assigns) == n_pts
        centroids = [prev_cents[c] for c in sorted(prev_cents)]
        assigned = assign_nearest(feats, centroids, "p", round_decimals=None)
        got = sorted(
            (r["cluster"], round(r["x1"], 9), round(r["x2"], 9))
            for r in assigned.collect()
        )
        want = sorted((c, round(x, 9), round(y, 9)) for c, x, y in cur_assigns)
        assert got == want, f"iter_{i}: assignment multiset differs"
        means = (
            assigned.groupBy("cluster")
            .agg(F.avg("x1").alias("mx"), F.avg("x2").alias("my"))
            .collect()
        )
        assert len(means) == len(cur_cents)
        for r in means:
            cx, cy = cur_cents[r["cluster"]]
            assert abs(r["mx"] - cx) < 1e-9 and abs(r["my"] - cy) < 1e-9, (
                f"iter_{i}: centroid {r['cluster']} drifted"
            )
    feats.unpersist()


def test_task2_1_assignment_and_centroids(spark):
    """Golden centroids -> nearest assignment == golden classes (exact),
    and per-cluster means == golden centroids (1e-9 fixed point)."""
    pts = read_points_csv(spark, _ref("2.1/input/2DPoints.csv"))
    with open(_ref("2.1/output/task_2_1.clusters"), encoding="utf-8") as fh:
        centroids = []
        for line in fh:
            line = line.strip()
            if line:
                c, x, y = line.split(",")
                centroids.append((int(c), [float(x), float(y)]))
    centroids = [v for _, v in sorted(centroids)]

    feats = pts.select(F.array("x1", "x2").alias("p"), "x1", "x2")
    assigned = assign_nearest(feats, centroids, "p", round_decimals=None)

    got = {
        (r["cluster"], round(r["x1"], 9), round(r["x2"], 9))
        for r in assigned.collect()
    }
    want = set()
    with open(_ref("2.1/output/task_2_1.classes"), encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if line:
                c, x, y = line.split(",")
                want.add((int(c), round(float(x), 9), round(float(y), 9)))
    assert got == want, f"{len(got ^ want)} assignment diffs"

    means = (
        assigned.groupBy("cluster")
        .agg(F.avg("x1").alias("mx"), F.avg("x2").alias("my"))
        .orderBy("cluster")
        .collect()
    )
    for r in means:
        cx, cy = centroids[r["cluster"]]
        assert abs(r["mx"] - cx) < 1e-9 and abs(r["my"] - cy) < 1e-9
