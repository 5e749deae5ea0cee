"""MatrixMarket coordinate I/O — the reference's central interchange format.

Reference parity (SURVEY.md §2.1):
- S7  MTX source: banner + dims + `termId docId value` triples
      (ref sources/1.2/source/task1_2.java:31-43, 1.4/source/task1_4.java:60-74)
- S8  dims-line scalar extract (ref sources/1.4/source/task1_4.java:35-57)
- S9  single-file sorted MTX sink (ref sources/1.1/source/task1_1.java:120-152)
- S10 headerless triple sink with dedup (ref sources/1.4/source/task1_4.java:144-179)

The reference skips the 2 header lines with a per-mapper row counter, which
is wrong across splits (N6: it leaked the dims line `9635 2225 142278` into
the task 1.2 golden output as data). Here the header is parsed ONCE in the
driver (a few bytes), and the distributed scan drops comment lines
declaratively; ``compat_n6=True`` reproduces the leak for golden-diff tests.

Scale: the triple scan is a plain distributed text read -> split -> cast,
fully splittable; no global ordering assumptions. The strict MatrixMarket
single-file writer is a COMPAT sink (banner must be line 1 => one writer);
the scale path is ``write_mtx_parts`` (distributed parts + sidecar header).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BANNER = "%%MatrixMarket matrix coordinate real general"


@dataclass(frozen=True)
class MtxDims:
    n_rows: int
    n_cols: int
    nnz: int


def mtx_dims(path: str) -> MtxDims:
    """S8: read the dims line driver-side (first non-comment line).

    The reference re-reads line 2 inside a mapper and ships the value via
    job config; here it's a few-byte driver read, CRLF-safe.
    """
    with open(path, encoding="utf-8", errors="replace") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("%"):
                continue
            a, b, c = line.split()[:3]
            return MtxDims(int(a), int(b), int(c))
    raise ValueError(f"no dims line found in {path}")


def read_mtx(
    spark: SparkSession,
    path: str,
    col_order: tuple[str, str] = ("term_id", "doc_id"),
    header: bool = True,
    compat_n6: bool = False,
) -> DataFrame:
    """S7: MTX triples as DataFrame (col_order[0] INT, col_order[1] INT,
    value DOUBLE).

    ``col_order`` names the first two coordinate columns — the reference's
    1.4 output is doc-first despite its comments (SURVEY.md §2.7-N2), so
    callers reading that file pass ``("doc_id", "term_id")``.
    ``header=False`` reads headerless triple files (the S10 sink's output).
    ``compat_n6=True`` keeps the dims line as a data row, reproducing the
    reference's per-split header-skip leak for golden-diff tests.
    """
    lines = spark.read.text(path)
    # CRLF-safe: committed reference fixtures have \r\n (SURVEY.md §5)
    v = F.regexp_replace(F.col("value"), "\r$", "")
    rows = lines.select(v.alias("line")).filter(
        ~F.col("line").startswith("%") & (F.trim("line") != "")
    )
    parts = F.split(F.trim("line"), r"\s+")
    triples = rows.select(
        parts.getItem(0).cast("int").alias(col_order[0]),
        parts.getItem(1).cast("int").alias(col_order[1]),
        parts.getItem(2).cast("double").alias("value"),
    )
    if header and not compat_n6:
        d = mtx_dims(path)
        # drop exactly the dims row; a data triple can only collide if its
        # value equals the total nnz AND its coords equal the matrix shape —
        # impossible for count/tf-idf matrices with >1 entry.
        triples = triples.filter(
            ~(
                (F.col(col_order[0]) == d.n_rows)
                & (F.col(col_order[1]) == d.n_cols)
                & (F.col("value") == float(d.nnz))
            )
        )
    return triples


def write_mtx_single(
    df: DataFrame,
    path: str,
    n_rows: int,
    n_cols: int,
    row_col: str = "term_id",
    col_col: str = "doc_id",
    int_values: bool = True,
    sort: str = "numeric",
    banner: bool = True,
    dedup: bool = False,
) -> int:
    """S9/S10 COMPAT sink: one strictly-formatted MatrixMarket file.

    ``sort="string"`` reproduces the reference's lexicographic line sort
    (O1 — golden proof `1 1 1` < `1 11 1` < `1 1199 1`,
    ref sources/1.1/source/task1_1.java:142); ``sort="numeric"`` is the sane
    mode. ``dedup=True`` is S10's LinkedHashSet dedup. Anti-scale by design
    (single writer); returns nnz written.
    """
    rows = df.select(row_col, col_col, "value")
    if dedup:
        rows = rows.dropDuplicates()
    value = (
        F.col("value").cast("long").cast("string")
        if int_values
        else F.format_string("%.6f", "value")
    )
    lined = rows.select(
        F.concat_ws(
            " ", F.col(row_col).cast("string"), F.col(col_col).cast("string"), value
        ).alias("line")
    )
    if sort == "string":
        lined = lined.orderBy("line")
    else:
        lined = rows.orderBy(row_col, col_col).select(
            F.concat_ws(
                " ", F.col(row_col).cast("string"), F.col(col_col).cast("string"), value
            ).alias("line")
        )
    nnz = lined.count()
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        if banner:
            fh.write(BANNER + "\n")
            fh.write(f"{n_rows} {n_cols} {nnz}\n")
        for r in lined.toLocalIterator():
            fh.write(r["line"] + "\n")
    os.replace(tmp, path)
    return nnz


def write_mtx_parts(
    df: DataFrame,
    out_dir: str,
    n_rows: int,
    n_cols: int,
    row_col: str = "term_id",
    col_col: str = "doc_id",
    int_values: bool = True,
) -> None:
    """Scale path: distributed triple parts + a sidecar ``_header`` file.

    Each task writes its own part (no single-reducer merge, no driver
    buffering — the reference merged the whole matrix in the driver,
    ref sources/1.1/source/task1_1.java:126-138)."""
    value = (
        F.col("value").cast("long").cast("string")
        if int_values
        else F.format_string("%.6f", "value")
    )
    lines = df.select(
        F.concat_ws(
            " ", F.col(row_col).cast("string"), F.col(col_col).cast("string"), value
        ).alias("value")
    )
    lines.write.mode("overwrite").text(out_dir)
    nnz = df.count()
    with open(os.path.join(out_dir, "_header"), "w", encoding="utf-8") as fh:
        fh.write(BANNER + "\n")
        fh.write(f"{n_rows} {n_cols} {nnz}\n")
