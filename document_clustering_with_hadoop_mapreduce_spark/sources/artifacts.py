"""Reference-layout per-iteration artifact sinks (S11/M9 compat).

The reference persists clustering state in two file layouts:

- task 2.1 (ref sources/2.1/source/task2_1.java:194-214,292): each MR
  iteration writes ``<out>/iter_<i>/part-r-00000`` grouped by reducer key —
  cluster i's points as ``<c>,\\t<x>,<y>`` lines followed by a
  ``centroids:<c>,\\t<x>,<y>`` line carrying the NEXT centroids — plus an
  empty ``_SUCCESS`` marker (goldens at sources/2.1/output/iterations/).
- task 2.2 (ref sources/2.2/source/KMeansReducer.java:25-131): per
  iteration ``task_2_2_iter<i>.clusters`` (``<c>\\t<v0> <v1> ... ``) and
  ``task_2_2_iter<i>.classes`` (``<doc> <c>`` lines), DELETING iteration
  i-1's files; the FINAL iteration writes ``task_2_2.clusters`` /
  ``task_2_2.classes`` instead; ``task_2_2.losses`` and ``task_2_2.txt``
  are append-only with an ``\\nIteration <i+1>: \\n`` section header per
  iteration, one line per cluster (loss / ``<value>=<term_idx>, `` top-10).

These sinks reproduce the FILE LAYOUT — names, line formats, grouping,
iteration rotation, final-iteration renaming — with values from the
engine's verified operators. The reference's in-file arithmetic defects
(KMeansReducer.java:173-186 divides centroid sums by count+1 and compares
WCSS against a running half-updated centroid) are deliberately NOT
reproduced; value parity for the sane math is proven by the golden
trajectory replay in tests/test_golden_parity.py.

Anti-scale BY DESIGN, like ``write_mtx_single``: artifact payloads are k
centroids + n assignment ids, written driver-side via toLocalIterator —
data-sized outputs belong to the DataFrame writers.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def doc_kmeans_cluster_lines(
    spark: SparkSession,
    centroids_idx: DataFrame | None,
    v_size: int,
    k: int,
) -> DataFrame:
    """The k preformatted ``<cid>\\t<v0> <v1> ... <v(V-1)> `` lines of a
    task-2.2 ``.clusters`` file, assembled EXECUTOR-side.

    ``centroids_idx`` is the sparse (cluster, term_idx, w) centroid frame
    (term_idx = rank in the sorted term dictionary — the documented N5
    fix), or None for the skipped final recompute (all-zero rows, like the
    reference's uninitialized reducer state). Per-cluster (term_idx, w)
    pairs aggregate into ONE row per cluster; an Arrow pandas UDF then
    densifies and formats each vector with Python ``repr`` (= Java
    ``Double.toString`` text for these magnitudes, ref
    sources/2.2/source/KMeansReducer.java:56-66). The k x V dense TEXT
    exists only inside k executor rows — the driver never holds a
    vocab-sized object; the caller streams the k lines out
    ``write_mtx_single``-style."""
    import pandas as pd

    pair_t = "array<struct<term_idx:int,w:double>>"
    clusters = spark.range(k).select(F.col("id").cast("int").alias("cluster"))
    if centroids_idx is None:
        pairs = clusters.withColumn("pairs", F.array().cast(pair_t))
    else:
        agg = centroids_idx.groupBy("cluster").agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("term_idx").cast("int").alias("term_idx"),
                        F.col("w").cast("double").alias("w"),
                    )
                )
            ).alias("pairs")
        )
        pairs = clusters.join(agg, "cluster", "left").withColumn(
            "pairs", F.coalesce(F.col("pairs"), F.array().cast(pair_t))
        )

    def body(batch):
        out = []
        for row in batch:
            dense = ["0.0"] * v_size
            for p in row:
                dense[int(p["term_idx"])] = repr(float(p["w"]))
            out.append(" ".join(dense))
        return pd.Series(out)

    # module stringifies annotations (future import); pandas_udf needs real
    # type objects to infer the scalar eval type — attach them directly
    body.__annotations__ = {"batch": pd.Series, "return": pd.Series}
    body_udf = F.pandas_udf(body, "string")
    return pairs.select(
        "cluster",
        F.concat(
            F.col("cluster").cast("string"), F.lit("\t"), body_udf("pairs"), F.lit(" ")
        ).alias("line"),
    )


def _fmt(v: float) -> str:
    """Shortest round-trip decimal — Python repr matches Java
    Double.toString for the magnitudes these artifacts hold."""
    return repr(float(v))


def write_points_iteration_dir(
    out_root: str,
    iteration: int,
    assigned: DataFrame,
    new_centroids: list[list[float]],
    x_col: str = "x1",
    y_col: str = "x2",
    cluster_col: str = "cluster",
) -> str:
    """Task 2.1 layout: ``<out_root>/iter_<i>/part-r-00000`` + ``_SUCCESS``.

    ``assigned`` is the iteration's (cluster, x, y) assignment;
    ``new_centroids`` the recomputed means the reducer would emit.
    Returns the iteration directory path.
    """
    it_dir = os.path.join(out_root, f"iter_{iteration}")
    os.makedirs(it_dir, exist_ok=True)
    rows = (
        assigned.select(cluster_col, x_col, y_col)
        .orderBy(cluster_col)
        .toLocalIterator()
    )
    tmp = os.path.join(it_dir, "part-r-00000.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        current = None
        for r in rows:
            c = int(r[cluster_col])
            if current is not None and c != current:
                cx, cy = new_centroids[current]
                fh.write(f"centroids:{current},\t{_fmt(cx)},{_fmt(cy)}\n")
            current = c
            fh.write(f"{c},\t{_fmt(r[x_col])},{_fmt(r[y_col])}\n")
        if current is not None:
            cx, cy = new_centroids[current]
            fh.write(f"centroids:{current},\t{_fmt(cx)},{_fmt(cy)}\n")
    os.replace(tmp, os.path.join(it_dir, "part-r-00000"))
    open(os.path.join(it_dir, "_SUCCESS"), "w", encoding="utf-8").close()
    return it_dir


def write_doc_kmeans_iteration(
    out_folder: str,
    iteration: int,
    max_iteration: int,
    assignments: DataFrame,
    cluster_lines: DataFrame,
    losses: list[float],
    top10: list[list[tuple[float, int]]] | None = None,
    prefix: str = "task_2_2",
    id_col: str = "doc_id",
    cluster_col: str = "cluster",
) -> None:
    """Task 2.2 layout for ONE iteration: rotating ``_iter<i>.clusters`` /
    ``_iter<i>.classes`` (final iteration drops the ``_iter<i>`` infix),
    previous iteration's files deleted, ``.losses`` / ``.txt`` appended
    with the reference's section headers.

    ``cluster_lines``: the k preformatted ``.clusters`` lines from
    ``doc_kmeans_cluster_lines`` (streamed out sorted, the
    ``write_mtx_single`` discipline — no vocab-sized driver object);
    ``losses``: per-cluster WCSS for this iteration; ``top10``: per
    cluster, (weight, term_idx) pairs strongest-first.
    """
    os.makedirs(out_folder, exist_ok=True)

    def _path(suffix: str, it: int | None) -> str:
        infix = "" if it is None else f"_iter{it}"
        return os.path.join(out_folder, f"{prefix}{infix}{suffix}")

    final = iteration == max_iteration - 1
    for suffix in (".clusters", ".classes"):
        old = _path(suffix, iteration - 1)
        if iteration > 0 and os.path.exists(old):
            os.remove(old)

    cl_path = _path(".clusters", None if final else iteration)
    with open(cl_path, "w", encoding="utf-8") as fh:
        for r in cluster_lines.orderBy("cluster").toLocalIterator():
            fh.write(r["line"] + "\n")

    cls_path = _path(".classes", None if final else iteration)
    with open(cls_path, "w", encoding="utf-8") as fh:
        for r in assignments.select(id_col, cluster_col).orderBy(
            cluster_col, id_col
        ).toLocalIterator():
            fh.write(f"{r[id_col]} {r[cluster_col]}\n")

    with open(_path(".losses", None), "a", encoding="utf-8") as fh:
        fh.write(f"\nIteration {iteration + 1}: \n")
        for loss in losses:
            fh.write(f"{_fmt(loss)}\n")

    if top10 is not None:
        with open(_path(".txt", None), "a", encoding="utf-8") as fh:
            fh.write(f"\nIteration {iteration + 1}: \n")
            for pairs in top10:
                line = "".join(f"{_fmt(w)}={idx}, " for w, idx in pairs)
                fh.write(line + "\n")


def clean_artifact_folder(out_folder: str) -> None:
    """Remove a previous run's artifact folder (the append-only .losses/.txt
    files would otherwise accumulate across runs)."""
    if os.path.isdir(out_folder):
        shutil.rmtree(out_folder)
