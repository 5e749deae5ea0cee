"""End-to-end task pipelines — the reference's 8 lab drivers as functions.

A user of the reference runs `hadoop jar task1_1.jar <in> <out>`; here each
task is one function over DataFrames, composing the operator modules. Output
files use the reference's formats (MatrixMarket, `cluster,x,y` lines) via
the compat sinks, so downstream tooling keeps working.

Task -> reference driver mapping (SURVEY.md §0):
  1.1 term x doc counts      sources/1.1/source/task1_1.java
  1.2 corpus-freq >= 3       sources/1.2/source/task1_2.java
  1.3 global top-10 terms    sources/1.3/source/Task1_3.java
  1.4 TF-IDF                 sources/1.4/source/task1_4.java
  1.5 top-5 terms/category   sources/1.5/source/task_1_5.java
  2.1 2-D K-Means (euclid)   sources/2.1/source/task2_1.java
  2.2 doc K-Means (cosine)   sources/2.2/source/*.java
  2.3 same, k-means|| init   sources/2.3/source/*.java

Golden parity for the computational cores is proven in
tests/test_golden_parity.py; these facades add the I/O shell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .compat import clean_text_ref
from .operators.kmeans import mllib_kmeans
from .operators.term_matrix import filter_min_corpus_freq, term_totals
from .operators.tfidf import tfidf
from .operators.topk import top_k_global, top_k_per_group
from .sources.corpus import (
    load_line_dict,
    load_stopwords,
    read_corpus,
    read_points_csv,
)
from .sources.mtx import mtx_dims, read_mtx, write_mtx_single


def task_1_1_term_doc_matrix(
    spark: SparkSession,
    corpus_dir: str,
    terms_path: str,
    docs_path: str,
    stopwords_path: str,
    out_mtx: str | None = None,
    exact_ref_cleaning: bool = True,
) -> DataFrame:
    """Corpus -> (term_id, doc_id, count) triples; optional MTX file in the
    reference's exact format (banner, dims, string-sorted lines)."""
    docs = read_corpus(spark, corpus_dir, wholetext=True)
    stop = load_stopwords(spark, stopwords_path)
    terms_dict = load_line_dict(spark, terms_path, token_col="term", id_col="term_id")
    docs_dict = load_line_dict(spark, docs_path, token_col="doc_name", id_col="num_id")

    clean = clean_text_ref if exact_ref_cleaning else (lambda c: F.lower(c))
    toks = (
        docs.select(
            F.col("doc_id").alias("doc_name"),
            F.explode(F.split(F.trim("text"), r"\s+")).alias("raw"),
        )
        .select("doc_name", clean(F.col("raw")).alias("term"))
        .filter((F.col("term") != "") & ~F.col("term").isin(*stop))
    )
    matrix = (
        toks.join(F.broadcast(terms_dict), "term")
        .groupBy("term_id", "doc_name")
        .agg(F.count(F.lit(1)).alias("value"))
        .join(F.broadcast(docs_dict), "doc_name")
        .select("term_id", F.col("num_id").alias("doc_id"), "value")
    )
    if out_mtx is not None:
        n_terms = terms_dict.count()
        n_docs = docs_dict.count()
        write_mtx_single(
            matrix, out_mtx, n_terms, n_docs, int_values=True, sort="string"
        )
    return matrix


def task_1_2_min_freq_filter(
    spark: SparkSession, in_mtx: str, min_total: int = 3, out_mtx: str | None = None
) -> DataFrame:
    m = read_mtx(spark, in_mtx).withColumnRenamed("value", "cnt")
    filtered = filter_min_corpus_freq(
        m.withColumnRenamed("term_id", "term").withColumnRenamed("doc_id", "doc"),
        min_total,
    ).select(
        F.col("term").alias("term_id"),
        F.col("doc").alias("doc_id"),
        F.col("cnt").alias("value"),
    )
    if out_mtx is not None:
        # the reference passes the INPUT matrix shape through to the output
        # header (golden 1.2 output keeps `9635 2225` with a new nnz);
        # recomputing max ids would shrink the shape when the last row/col
        # filters out — and cost an extra full pass
        d = mtx_dims(in_mtx)
        write_mtx_single(
            filtered, out_mtx, d.n_rows, d.n_cols, int_values=True, sort="string"
        )
    return filtered


def task_1_3_top_terms(spark: SparkSession, in_mtx: str, n: int = 10) -> DataFrame:
    m = read_mtx(spark, in_mtx).select(
        F.col("term_id").alias("term"), F.col("value").cast("long").alias("cnt")
    )
    totals = term_totals(m)
    return top_k_global(totals, [F.col("total_freq").desc(), F.col("term").asc()], n)


def task_1_4_tfidf(
    spark: SparkSession,
    in_mtx: str,
    out_mtx: str | None = None,
    compat_n1: bool = False,
) -> DataFrame:
    """Standard tf-idf by default; ``compat_n1=True`` reproduces the
    reference's per-document 'IDF' (golden-verified to 1e-5)."""
    m = read_mtx(spark, in_mtx).select(
        "doc_id", F.col("term_id").alias("term"), F.col("value").alias("cnt")
    )
    # materialize=False: m comes from an already-written triples file —
    # the second scan the checkpoint would avoid is a cheap file re-read
    out = tfidf(m, compat_n1=compat_n1, materialize=False).select(
        "doc_id",
        F.col("term").alias("term_id"),
        F.col("tfidf").alias("value"),
    )
    if out_mtx is not None:
        # reference 1.4 output: doc-first headerless triples, deduped (N2/S10)
        write_mtx_single(
            out, out_mtx, 0, 0, row_col="doc_id", col_col="term_id",
            int_values=False, banner=False, dedup=True,
        )
    return out


def task_1_5_category_top_terms(
    spark: SparkSession, tfidf_mtx: str, docs_path: str, k: int = 5
) -> DataFrame:
    """Top-k terms per category by average tf-idf, categories derived from
    the doc dictionary's `<category>.<num>` names (P8)."""
    m = read_mtx(spark, tfidf_mtx, col_order=("doc_id", "term_id"), header=False)
    docs_dict = load_line_dict(spark, docs_path, token_col="doc_name", id_col="doc_id")
    cats = docs_dict.select(
        "doc_id", F.regexp_extract("doc_name", r"^(.*)\.", 1).alias("category")
    )
    joined = m.join(F.broadcast(cats), "doc_id")
    per_cat = joined.groupBy("category").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    avg = (
        joined.groupBy("category", "term_id")
        .agg(F.sum("value").alias("s"))
        .join(F.broadcast(per_cat), "category")
        .withColumn("avg_tfidf", F.round(F.col("s") / F.col("n_docs"), 6))
        .select("category", "term_id", "avg_tfidf")
    )
    return top_k_per_group(
        avg, ["category"], [F.col("avg_tfidf").desc(), F.col("term_id").asc()], k
    )


def task_2_1_kmeans_2d(
    spark: SparkSession, points_csv: str, k: int = 3, tol: float = 1e-5,
    max_iter: int = 20,
) -> tuple[DataFrame, list[list[float]]]:
    """Euclidean K-Means on 2-D points with convergence (M7).

    Deterministic AND robust: best-of-N seeded k-means|| fits by WCSS
    (k-means has local optima — on this dataset one basin costs 6.18 and
    recovers the true classes at 0.996 agreement, another costs 14.8 and
    doesn't; a fixed seed list + argmin(cost) is reproducible, unlike the
    reference's unseeded shuffle, and immune to a single unlucky init)."""
    pts = read_points_csv(spark, points_csv)
    feats = pts.select(F.array("x1", "x2").alias("p"), "x1", "x2").cache()
    best = None
    for seed in (1, 2, 3):
        model, assigned = mllib_kmeans(
            feats, k=k, features_col="p", distance="euclidean",
            init_mode="k-means||", seed=seed, max_iter=max_iter, tol=tol,
        )
        cost = float(model.summary.trainingCost)
        if best is None or cost < best[0]:
            best = (cost, model, assigned)
    _, model, assigned = best
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned.select("x1", "x2", "cluster"), centroids


def task_2_2_doc_kmeans(
    spark: SparkSession, tfidf_mtx: str, k: int = 5, seed: int = 42,
    init_mode: str = "random", max_iter: int = 10,
):
    """Document K-Means over a TF-IDF matrix with correct cosine distance
    (the reference's N3 'cosine' lives in compat). Returns (model,
    assignments with term-aligned sparse features)."""
    from .operators.doc_cluster import pivot_to_sparse_vectors

    m = read_mtx(spark, tfidf_mtx, col_order=("doc_id", "term_id"), header=False)
    vecs = pivot_to_sparse_vectors(
        m.select("doc_id", F.col("term_id").alias("term"), F.col("value").alias("tfidf"))
    )
    from pyspark.ml.clustering import KMeans

    km = KMeans(
        k=k, seed=seed, maxIter=max_iter, initMode=init_mode,
        distanceMeasure="cosine", featuresCol="features", predictionCol="cluster",
    )
    model = km.fit(vecs)
    return model, model.transform(vecs)


def task_2_2_doc_kmeans_with_artifacts(
    matrix: DataFrame,
    out_folder: str,
    k: int = 5,
    max_iter: int = 3,
    weight_col: str = "tfidf",
) -> list[float]:
    """Task 2.2 with the reference's per-iteration artifact files (S11/M9):
    rotating ``task_2_2_iter<i>.clusters/.classes`` (final iteration drops
    the infix, previous iteration deleted), append-only ``.losses`` and
    ``.txt`` with per-iteration section headers — the exact layout of
    ``sources/2.2/ouput/task_2_2.*`` (ref KMeansReducer.java:25-131).

    Values come from the verified sparse Lloyd loop; the dense centroid
    lines use the term-sorted dictionary index (the documented N5 fix —
    the reference's slots were reducer-arrival-ordered). The k x V dense
    TEXT is assembled executor-side (``doc_kmeans_cluster_lines``) and
    streamed out k lines at a time, ``write_mtx_single``-style — the
    driver holds nothing vocab-sized (the reference shipped k x V
    centroid strings through job config; this sink reproduces the FILE,
    not the anti-pattern). A compat sink, not the scale path — the
    engine's centroids stay sparse.

    Returns the per-iteration WCSS trace.
    """
    from pyspark.sql import Window

    from .operators.doc_cluster import sparse_lloyd
    from .sources.artifacts import (
        clean_artifact_folder,
        doc_kmeans_cluster_lines,
        write_doc_kmeans_iteration,
    )

    clean_artifact_folder(out_folder)
    spark = matrix.sparkSession
    # term dictionary as a FRAME (term -> sorted rank), reused every
    # iteration's broadcast join — never collected to the driver
    vocab = (
        matrix.select("term")
        .distinct()
        .withColumn("term_idx", F.row_number().over(Window.orderBy("term")) - 1)
        .localCheckpoint(eager=False)
    )
    v_size = vocab.count()

    def on_iteration(it, assigned, new_cents, wcss):
        if new_cents is not None:
            # two consumers (the .clusters lines + the top-10 window)
            idx = (
                new_cents.join(F.broadcast(vocab), "term")
                .select(
                    "cluster",
                    F.col("term_idx").cast("int").alias("term_idx"),
                    F.col("w").cast("double").alias("w"),
                )
                .localCheckpoint(eager=False)
            )
        else:
            idx = None
        lines = doc_kmeans_cluster_lines(spark, idx, v_size=v_size, k=k)
        losses_rows = (
            assigned.groupBy("cluster").agg(F.sum("dist_sq").alias("loss")).collect()
        )
        loss_by_cluster = {r["cluster"]: float(r["loss"]) for r in losses_rows}
        losses = [loss_by_cluster.get(c, 0.0) for c in range(k)]
        top10: list[list[tuple[float, int]]] = [[] for _ in range(k)]
        if idx is not None:
            w10 = Window.partitionBy("cluster").orderBy(F.desc("w"), F.asc("term_idx"))
            rows10 = (
                idx.where(F.col("w") != 0.0)
                .withColumn("rn", F.row_number().over(w10))
                .where(F.col("rn") <= 10)
                .orderBy("cluster", "rn")
                .collect()  # k x 10 rows — bounded
            )
            for r in rows10:
                top10[r["cluster"]].append((float(r["w"]), int(r["term_idx"])))
        write_doc_kmeans_iteration(
            out_folder, it, max_iter, assigned, lines, losses, top10=top10
        )

    _, _, trace = sparse_lloyd(
        matrix, k=k, max_iter=max_iter, weight_col=weight_col,
        on_iteration=on_iteration,
    )
    return trace


def task_2_3_doc_kmeans_scalable(
    spark: SparkSession, tfidf_mtx: str, k: int = 5, seed: int = 42,
    max_iter: int = 10,
):
    """Task 2.3 = task 2.2 with k-means|| init (the Bahmani et al.
    algorithm the reference hand-rolls; built into MLlib)."""
    return task_2_2_doc_kmeans(
        spark, tfidf_mtx, k=k, seed=seed, init_mode="k-means||", max_iter=max_iter
    )


def build_training_export(
    documents,
    out_dir: str,
    n_shards: int = 64,
    max_tokens: int = 2048,
    num_streams: int = 1024,
    salt: str = "export-v1",
):
    """Curated corpus -> trainer-ready artifact, the last mile after
    ``corpus_curation``: a deterministic global shuffle into
    ``out_dir/shards/shard=<i>/`` parquet dirs (training order = columns
    (shard, pos) — sources/export.py) plus a sequence-packing MANIFEST at
    ``out_dir/manifest`` mapping every doc to its packed training
    sequence (operators/textstats.py::sequence_pack — (stream, seq,
    seq_id, offset, n_tokens)), so the loader can assemble fixed-capacity
    sequences without re-tokenizing.

    Everything is a pure function of (salt, doc ids, token counts): a
    re-run reproduces both artifacts exactly, and a new ``salt`` is a
    fresh epoch permutation. Returns {"n_docs", "n_shards",
    "n_sequences"} driver-side scalars for the build log — three tiny
    aggregates, nothing corpus-sized collected.
    """
    from pyspark.sql import functions as F

    from .operators.textstats import sequence_pack
    from .sources.export import write_training_shards

    write_training_shards(
        documents, f"{out_dir}/shards", n_shards=n_shards, salt=salt
    )
    manifest = sequence_pack(
        documents, max_tokens=max_tokens, num_streams=num_streams, salt=salt
    )
    manifest.write.mode("overwrite").parquet(f"{out_dir}/manifest")
    spark = documents.sparkSession
    written = spark.read.parquet(f"{out_dir}/shards")
    man = spark.read.parquet(f"{out_dir}/manifest")
    return {
        "n_docs": written.count(),
        "n_shards": written.select("shard").distinct().count(),
        "n_sequences": man.select("seq_id").distinct().count(),
    }
