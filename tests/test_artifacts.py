"""Reference-layout artifact sinks (S11/M9): file names, line formats,
grouping, iteration rotation — values covered by the golden trajectory
replay in test_golden_parity.py and the oracle-gated Lloyd traces."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.kmeans import assign_nearest
from document_clustering_with_hadoop_mapreduce_spark.operators.term_matrix import term_doc_counts
from document_clustering_with_hadoop_mapreduce_spark.operators.tfidf import tfidf
from document_clustering_with_hadoop_mapreduce_spark.pipelines import (
    task_2_2_doc_kmeans_with_artifacts,
)
from document_clustering_with_hadoop_mapreduce_spark.sources.artifacts import (
    write_points_iteration_dir,
)
from document_clustering_with_hadoop_mapreduce_spark.sources.corpus import read_points_csv
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table
from tests.test_golden_parity import _parse_iter_file

REF = "/root/reference/sources"


def _ref(path: str) -> str:
    p = os.path.join(REF, path)
    if not os.path.exists(p):
        pytest.skip(f"reference fixture missing: {p}")
    return p


@pytest.mark.slow
def test_points_iteration_dir_matches_golden_layout(spark, tmp_path):
    """Replay golden iter_0 -> iter_1 and write the iteration dir; the
    written file must parse identically to the committed golden (multiset
    at 9dp) and follow the reference's structure: per-cluster grouping
    with the 'centroids:<c>' line closing each cluster's block, plus the
    _SUCCESS marker."""
    _, prev_cents = _parse_iter_file(
        _ref("2.1/output/iterations/iter_0/part-r-00000")
    )
    golden_assigns, golden_cents = _parse_iter_file(
        _ref("2.1/output/iterations/iter_1/part-r-00000")
    )
    pts = read_points_csv(spark, _ref("2.1/input/2DPoints.csv"))
    feats = pts.select(F.array("x1", "x2").alias("p"), "x1", "x2")
    centroids = [prev_cents[c] for c in sorted(prev_cents)]
    assigned = assign_nearest(feats, centroids, "p", round_decimals=None)
    means = {
        r["cluster"]: [r["mx"], r["my"]]
        for r in assigned.groupBy("cluster")
        .agg(F.avg("x1").alias("mx"), F.avg("x2").alias("my"))
        .collect()
    }
    new_centroids = [means[c] for c in sorted(means)]

    it_dir = write_points_iteration_dir(str(tmp_path), 1, assigned, new_centroids)
    part = os.path.join(it_dir, "part-r-00000")
    assert os.path.exists(os.path.join(it_dir, "_SUCCESS"))

    got_assigns, got_cents = _parse_iter_file(part)
    assert sorted((c, round(x, 9), round(y, 9)) for c, x, y in got_assigns) == sorted(
        (c, round(x, 9), round(y, 9)) for c, x, y in golden_assigns
    )
    assert sorted(got_cents) == sorted(golden_cents)
    for c, (gx, gy) in golden_cents.items():
        assert abs(got_cents[c][0] - gx) < 1e-9 and abs(got_cents[c][1] - gy) < 1e-9

    # structural parity: every line matches the reference grammar, and the
    # centroids:<c> line closes cluster c's block (reducer-key grouping)
    point_re = re.compile(r"^\d+,\t-?[\d.E-]+,-?[\d.E-]+$")
    cent_re = re.compile(r"^centroids:(\d+),\t-?[\d.E-]+,-?[\d.E-]+$")
    current = None
    with open(part, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            m = cent_re.match(line)
            if m:
                assert int(m.group(1)) == current, "centroid line outside its block"
                current = None
            else:
                assert point_re.match(line), f"bad line: {line!r}"
                c = int(line.split(",")[0])
                assert current is None or c == current, "interleaved clusters"
                current = c


@pytest.mark.slow
def test_doc_kmeans_artifact_rotation_and_formats(spark, sf_dir, tmp_path):
    """2.2 layout: final iteration drops the _iter<i> infix, earlier
    iterations are rotated away, .losses/.txt are append-only with per-
    iteration section headers, line grammars match the reference files."""
    out = str(tmp_path / "artifacts")
    k, iters = 3, 2
    m = tfidf(term_doc_counts(load_table(spark, sf_dir, "documents")))
    trace = task_2_2_doc_kmeans_with_artifacts(m, out, k=k, max_iter=iters)
    assert len(trace) == iters

    names = sorted(os.listdir(out))
    assert names == [
        "task_2_2.classes", "task_2_2.clusters", "task_2_2.losses", "task_2_2.txt",
    ], f"iteration files not rotated: {names}"

    with open(os.path.join(out, "task_2_2.clusters"), encoding="utf-8") as fh:
        cluster_lines = fh.read().splitlines()
    assert len(cluster_lines) == k
    v_size = m.select("term").distinct().count()
    for i, line in enumerate(cluster_lines):
        cid, body = line.split("\t")
        assert int(cid) == i
        assert body.endswith(" ")  # reference keeps a trailing space
        assert len(body.strip().split(" ")) == v_size

    n_docs = m.select("doc_id").distinct().count()
    with open(os.path.join(out, "task_2_2.classes"), encoding="utf-8") as fh:
        class_lines = fh.read().splitlines()
    assert len(class_lines) == n_docs
    assert all(re.match(r"^\S+ \d+$", ln) for ln in class_lines)

    with open(os.path.join(out, "task_2_2.losses"), encoding="utf-8") as fh:
        losses_txt = fh.read()
    sections = re.findall(r"Iteration (\d+): \n((?:[-\d.E]+\n)+)", losses_txt)
    assert [int(s[0]) for s in sections] == [1, 2]
    for _, body in sections:
        assert len(body.strip().splitlines()) == k
    # final section's per-cluster losses sum to the final trace WCSS
    final_losses = [float(x) for x in sections[-1][1].strip().splitlines()]
    assert abs(sum(final_losses) - trace[-1]) < 1e-6

    with open(os.path.join(out, "task_2_2.txt"), encoding="utf-8") as fh:
        txt = fh.read()
    top_sections = re.findall(r"Iteration (\d+): \n", txt)
    assert [int(s) for s in top_sections] == [1, 2]
    top_line_re = re.compile(r"^(-?[\d.E-]+=\d+, )+$")
    body_lines = [
        ln for ln in txt.splitlines() if ln and not ln.startswith("Iteration")
    ]
    assert len(body_lines) == k * iters
    assert all(top_line_re.match(ln) for ln in body_lines)
