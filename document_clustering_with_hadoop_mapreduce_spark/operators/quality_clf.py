"""Learned quality classifier — the GPT-3-style quality filter (Brown et
al. 2020, appendix A; also the CCNet/fasttext pattern): train a linear
classifier to distinguish a high-quality reference slice from the raw
pool, score every document, and keep probabilistically with the
Pareto-threshold rule so the filter does not collapse the corpus onto the
classifier's mode.

This completes the quality stack next to the HEURISTIC gates
(``textstats.doc_quality``, ``c4_line_filter``), the PERPLEXITY proxy
(``unigram_cross_entropy``) and the IMPORTANCE weights (``dsir``): same
bag-of-hashed-n-grams features as DSIR (fixed ``n_buckets``-dim space —
vocabulary-independent), but a DISCRIMINATIVE model instead of two
generative LMs.

Scale design — train small, score big:
- TRAINING runs on the labeled frame you pass it (in production a
  bounded sample — a learned linear filter saturates long before corpus
  scale) via MLlib ``LogisticRegression`` (distributed L-BFGS,
  per-iteration treeAggregate). Vector assembly there is an
  Arrow-batched pandas UDF emitting VectorUDT's sqlType struct (same
  pattern as ``doc_cluster.pivot_to_sparse_vectors``) — no
  row-at-a-time Python anywhere in the module;
- SCORING — the corpus-sized hot path — never touches Python or MLlib
  row objects: the fitted coefficients leave the model ONCE as a
  driver-side list, enter the plan as an ``n_buckets``-element literal
  array, and every document's logit is one JVM-side
  sum(cnt * coef[bucket]) aggregate over the same map-side feature
  stream DSIR uses. No vector type, no UDF, no join;
- the keep decision is RNG-free: the Pareto draw is the salted-md5
  inverse-CDF (``dsir.gumbel_key`` discipline), reproducible across
  runs, partitionings and engines.

Reference parity: no learned-filter surface exists in the reference; this
extends its MLlib usage (SURVEY §2.6) into the curation family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int60
from .dsir import hashed_ngram_counts


def quality_features(
    docs: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, features): MLlib sparse vectors of hashed uni+bigram
    counts, for TRAINING. One explode + one (doc, bucket) aggregate + one
    per-doc collect_list; the vectors never densify (32 KB/doc dense at
    the default width vs ~tokens-per-doc sparse).

    The UDT construction is the Arrow-batched pandas UDF pattern of
    ``doc_cluster.pivot_to_sparse_vectors`` — batches cross the Python
    boundary as columnar buffers and come back as VectorUDT's sqlType
    struct (type=0 sparse, size, indices, values); the per-doc sorted
    (bucket, cnt) struct array upstream is JVM-side."""
    import pandas as pd
    from pyspark.ml.linalg import VectorUDT

    counts = hashed_ngram_counts(docs, n_buckets, text_col, id_col)
    pairs = counts.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("bucket").cast("int").alias("bucket"),
                    F.col("cnt").alias("cnt"),
                )
            )
        ).alias("bc")
    )

    def to_sparse(bc):
        n = len(bc)
        return pd.DataFrame({
            "type": [0] * n,  # 0 = sparse in VectorUDT's struct encoding
            "size": [n_buckets] * n,
            "indices": [[int(r["bucket"]) for r in row] for row in bc],
            "values": [[float(r["cnt"]) for r in row] for row in bc],
        })

    # module stringifies annotations (future import); pandas_udf needs real
    # type objects to infer the scalar eval type — attach them directly
    to_sparse.__annotations__ = {"bc": pd.Series, "return": pd.DataFrame}
    to_sparse_udf = F.pandas_udf(to_sparse, VectorUDT())
    return pairs.select("doc_id", to_sparse_udf("bc").alias("features"))


def train_quality_classifier(
    docs: DataFrame,
    is_positive: Column,
    n_buckets: int = 4096,
    reg_param: float = 1e-3,
    max_iter: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[list[float], float]:
    """Fit the LR quality model and hand back plain Python parameters
    ``(coefficients, intercept)`` — the only artifact scoring needs, and
    deliberately NOT an MLlib model object so the corpus-sized scoring
    path stays JVM-side (see module docstring).

    Positives are the trusted slice (``is_positive`` boolean Column over
    ``docs``), negatives the rest of the pool (the paper trains
    curated-vs-CommonCrawl; against one pool rest-of-pool is the standard
    stand-in). ``docs`` should be a bounded labeled sample in production.
    """
    from pyspark.ml.classification import LogisticRegression

    labeled = docs.withColumn("label", is_positive.cast("double"))
    feats = quality_features(labeled, n_buckets, text_col, id_col).join(
        labeled.select(F.col(id_col).alias("doc_id"), "label"), "doc_id"
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=float(reg_param),
        maxIter=int(max_iter),
        standardization=False,
    )
    model = lr.fit(feats)
    return [float(c) for c in model.coefficients], float(model.intercept)


def quality_scores(
    docs: DataFrame,
    coefficients: list[float],
    intercept: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, quality_prob): P(high quality) per document — the
    corpus-sized path. The coefficient vector enters the plan as ONE
    literal array; each doc's logit is a JVM-side
    sum(cnt * coef[bucket+1]) over the map-side hashed-n-gram stream,
    then a sigmoid. A doc with no features (blank) scores
    sigmoid(intercept). ``n_buckets`` is ``len(coefficients)``."""
    n_buckets = len(coefficients)
    coefs = F.lit([float(c) for c in coefficients])
    counts = hashed_ngram_counts(docs, n_buckets, text_col, id_col)
    logits = counts.groupBy("doc_id").agg(
        F.sum(F.col("cnt") * F.element_at(coefs, F.col("bucket").cast("int") + 1)).alias(
            "__dot"
        )
    )
    ids = docs.select(F.col(id_col).alias("doc_id"))
    logit = F.coalesce(F.col("__dot"), F.lit(0.0)) + F.lit(float(intercept))
    return ids.join(logits, "doc_id", "left").select(
        "doc_id",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("quality_prob"),
    )


def pareto_filter(
    scores: DataFrame,
    alpha: float = 9.0,
    salt: str = "quality-v1",
    id_col: str = "doc_id",
    score_col: str = "quality_prob",
) -> DataFrame:
    """GPT-3's re-weighted keep rule: keep a document iff its Pareto draw
    exceeds ``1 - score`` — high-scoring docs almost always survive,
    low-scoring docs survive with heavy-tailed probability, so the
    filtered corpus keeps some of everything instead of collapsing onto
    the classifier's favorites (the paper: keep when
    ``np.random.pareto(alpha) > 1 - score``).

    The draw is the deterministic salted-hash inverse-CDF: with
    u = (md5_60(salt:id)+1)/(2^60+1) uniform in (0,1), a Pareto-II/Lomax
    sample is ``u^(-1/alpha) - 1``. Pure map-side filter, bit-reproducible
    (same discipline as ``hash_split``/``dsir.gumbel_key``). Output keeps
    the input schema plus a ``pareto_draw`` audit column.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    u = (
        md5_int60(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))) + 1
    ) / (float(1 << 60) + 1.0)
    draw = F.pow(u, F.lit(-1.0 / float(alpha))) - 1.0
    return scores.withColumn("pareto_draw", F.round(draw, 6)).filter(
        F.col("pareto_draw") > (F.lit(1.0) - F.col(score_col))
    )


def calibration_report(
    scored: DataFrame,
    label_col: str = "label",
    prob_col: str = "quality_prob",
    n_bins: int = 10,
) -> tuple[DataFrame, float]:
    """Reliability table + Expected Calibration Error (Guo et al., ICML
    2017 §2) for a probabilistic filter: before a keep-threshold or
    Pareto rule consumes ``quality_prob`` as a PROBABILITY, this is the
    evidence it behaves like one.

    Returns ``(bins, ece)``: one row per non-empty equal-width bin —
    (bin, n, mean_prob 6dp, frac_pos 6dp, abs gap 6dp) — and the scalar
    ECE = sum over bins of (n_b / N) * |mean_prob_b - frac_pos_b|.
    Probabilities are clamped into [0, 1] BEFORE both binning and the
    bin means (prob 1.0 lands in the top bin; an out-of-range score
    cannot fabricate mean_prob > 1); rows with a NULL probability
    (e.g. unscored docs surviving a left join) are EXCLUDED — Spark's
    greatest() skips nulls, so without the filter they would silently
    inflate bin 0 as phantom counts.

    Scale shape: ONE aggregation exchange on the n_bins-key column
    (map-side partial sums); the returned bin frame is REBUILT from the
    k collected rows, so consuming it never re-runs the corpus scan.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col(prob_col).cast("double")))
    binned = scored.where(F.col(prob_col).isNotNull()).select(
        F.least(F.lit(n_bins - 1), F.floor(p * n_bins).cast("int")).alias("bin"),
        p.alias("__p"),
        F.col(label_col).cast("double").alias("__y"),
    )
    rows = (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("__p"), 6).alias("mean_prob"),
            F.round(F.avg("__y"), 6).alias("frac_pos"),
        )
        .withColumn("gap", F.round(F.abs(F.col("mean_prob") - F.col("frac_pos")), 6))
        .orderBy("bin")
        .collect()
    )
    total = sum(r["n"] for r in rows)
    ece = (
        sum(r["n"] * abs(r["mean_prob"] - r["frac_pos"]) for r in rows) / total
        if total
        else 0.0
    )
    spark = scored.sparkSession
    bins = spark.createDataFrame(
        [(r["bin"], r["n"], r["mean_prob"], r["frac_pos"], r["gap"]) for r in rows],
        "bin int, n long, mean_prob double, frac_pos double, gap double",
    )
    return bins, round(ece, 6)
