"""Learned quality filter: the LR separates a text-derived slice (AUC),
the JVM-side literal-coefficient scorer matches MLlib's own transform,
and the Pareto keep rule is deterministic with the right tail behavior.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.quality_clf import (
    pareto_filter,
    quality_features,
    quality_scores,
    train_quality_classifier,
)
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table

NB = 512


def _pos():
    # text-derived positive slice (the fixture's `lang` column is independent
    # of the text, so a label the features can actually express is needed)
    return F.col("text").contains("spark")


def _fit(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents", fan_out=False).select("doc_id", "text")
    coefs, intercept = train_quality_classifier(docs, _pos(), n_buckets=NB, max_iter=30)
    return docs, coefs, intercept


@pytest.mark.slow
def test_classifier_separates_text_derived_slice(spark, sf_dir):
    docs, coefs, intercept = _fit(spark, sf_dir)
    scored = (
        quality_scores(docs, coefs, intercept)
        .join(docs.select("doc_id", _pos().cast("int").alias("y")), "doc_id")
        .collect()
    )
    pos = sorted(r["quality_prob"] for r in scored if r["y"] == 1)
    neg = sorted(r["quality_prob"] for r in scored if r["y"] == 0)
    assert pos and neg
    # exact AUC via rank-sum
    import bisect

    wins = sum(bisect.bisect_left(neg, p) + 0.5 * (
        bisect.bisect_right(neg, p) - bisect.bisect_left(neg, p)
    ) for p in pos)
    auc = wins / (len(pos) * len(neg))
    assert auc > 0.95, auc


@pytest.mark.slow
def test_jvm_scorer_matches_mllib_transform(spark, sf_dir):
    """The corpus-path scorer (literal coefficient array, no Python, no
    vector type) must reproduce MLlib's own probability to fp-sum noise."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import vector_to_array

    docs, coefs, intercept = _fit(spark, sf_dir)
    mine = {
        r["doc_id"]: r["quality_prob"] for r in quality_scores(docs, coefs, intercept).collect()
    }
    # rebuild an MLlib model with the SAME parameters and transform
    labeled = docs.withColumn("label", _pos().cast("double"))
    feats = quality_features(labeled, NB).join(
        labeled.select("doc_id", "label"), "doc_id"
    )
    model = LogisticRegression(
        featuresCol="features", labelCol="label", regParam=1e-3, maxIter=30,
        standardization=False,
    ).fit(feats)
    theirs = {
        r["doc_id"]: r["p"]
        for r in model.transform(feats)
        .select("doc_id", vector_to_array("probability")[1].alias("p"))
        .collect()
    }
    assert set(mine) == set(theirs)
    worst = max(abs(mine[d] - theirs[d]) for d in mine)
    assert worst < 1e-4, worst


def test_pareto_filter_deterministic_and_tailed(spark):
    ids = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, F.lit(1.0)).otherwise(F.lit(0.0)).alias("quality_prob"),
    )
    kept1 = pareto_filter(ids, alpha=9.0).collect()
    kept2 = pareto_filter(ids, alpha=9.0).collect()
    assert sorted(r["doc_id"] for r in kept1) == sorted(r["doc_id"] for r in kept2)
    hi = [r for r in kept1 if r["quality_prob"] == 1.0]
    lo = [r for r in kept1 if r["quality_prob"] == 0.0]
    # score 1.0: draw > 0 always -> all survive
    assert len(hi) == 1000
    # score 0.0: survives iff draw > 1, P = 2^-alpha ~ 0.2% -> a few, not many
    assert 0 < len(lo) < 30, len(lo)


def test_pareto_draw_matches_pure_python(spark):
    import hashlib

    ids = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), F.lit(1.0).alias("quality_prob")
    )
    got = {r["doc_id"]: r["pareto_draw"] for r in pareto_filter(ids, alpha=9.0).collect()}
    for i in range(50):
        h = int(hashlib.md5(f"quality-v1:{i}".encode()).hexdigest()[:15], 16)
        u = (h + 1) / (float(1 << 60) + 1.0)
        want = round(u ** (-1.0 / 9.0) - 1.0, 6)
        assert abs(got[i] - want) < 2e-6, (i, got[i], want)


def test_quality_scores_plan_is_jvm_side(spark, sf_dir):
    docs, coefs, intercept = _fit(spark, sf_dir)
    plan = quality_scores(docs, coefs, intercept)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_quality_features_vector_assembly_is_arrow_not_row_udf(spark, sf_dir):
    # Training vector assembly must be the Arrow pandas_udf path, never a
    # row-at-a-time Python UDF (BatchEvalPython) — the one remaining row
    # UDF in the codebase was here, and it's gone.
    from document_clustering_with_hadoop_mapreduce_spark.operators.quality_clf import (
        quality_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    plan = quality_features(docs, n_buckets=64)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


class TestCalibration:
    def test_matches_duckdb_oracle(self, spark):
        import duckdb

        from document_clustering_with_hadoop_mapreduce_spark.operators.quality_clf import (
            calibration_report,
        )

        rows = [(i, ((i * 37) % 100) / 100.0, 1 if (i * 53) % 100 < (i * 37) % 100 else 0) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id int, quality_prob double, label int")
        bins, ece = calibration_report(df, n_bins=10)
        got = [(r.bin, r.n, r.mean_prob, r.frac_pos, r.gap) for r in bins.collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE s (doc_id INT, p DOUBLE, y INT)")
        con.executemany("INSERT INTO s VALUES (?, ?, ?)", rows)
        want = con.execute(
            """
WITH b AS (
  SELECT least(9, greatest(0, CAST(floor(p * 10) AS INT))) AS bin, p, y FROM s
)
SELECT bin, count(*)::BIGINT, round(avg(p), 6), round(avg(y), 6),
       round(abs(round(avg(p), 6) - round(avg(y), 6)), 6)
FROM b GROUP BY bin ORDER BY bin
"""
        ).fetchall()
        assert got == [tuple(r) for r in want]
        want_ece = sum(n * abs(mp - fp) for _, n, mp, fp, _ in want) / 500
        assert ece == round(want_ece, 6)

    def test_perfectly_calibrated_scores_near_zero_ece(self, spark):
        from document_clustering_with_hadoop_mapreduce_spark.operators.quality_clf import (
            calibration_report,
        )

        # labels drawn deterministically to match each bin's probability:
        # in the p=0.3 bin, 30% positives, etc.
        rows = []
        i = 0
        for pb in (0.1, 0.3, 0.5, 0.7, 0.9):
            for j in range(100):
                rows.append((i, pb, 1 if j < pb * 100 else 0))
                i += 1
        df = spark.createDataFrame(rows, "doc_id int, quality_prob double, label int")
        _, ece = calibration_report(df, n_bins=10)
        assert ece < 1e-9

    def test_anti_calibrated_scores_high_ece(self, spark):
        from document_clustering_with_hadoop_mapreduce_spark.operators.quality_clf import (
            calibration_report,
        )

        rows = [(i, 0.95, 0) for i in range(100)] + [(i + 100, 0.05, 1) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id int, quality_prob double, label int")
        _, ece = calibration_report(df)
        assert ece > 0.85

    def test_edge_probs_and_validation(self, spark):
        import pytest as pt

        from document_clustering_with_hadoop_mapreduce_spark.operators.quality_clf import (
            calibration_report,
        )

        df = spark.createDataFrame(
            [(1, 1.0, 1), (2, 0.0, 0)], "doc_id int, quality_prob double, label int"
        )
        bins, _ = calibration_report(df, n_bins=10)
        got = {r.bin for r in bins.collect()}
        assert got == {0, 9}  # prob 1.0 clamps into the top bin
        with pt.raises(ValueError):
            calibration_report(df, n_bins=0)


class TestCalibrationNulls:
    def test_null_probs_excluded_and_range_clamped(self, spark):
        from document_clustering_with_hadoop_mapreduce_spark.operators.quality_clf import (
            calibration_report,
        )

        df = spark.createDataFrame(
            [(1, 0.95, 1), (2, None, 0), (3, 1.7, 1), (4, -0.3, 0)],
            "doc_id int, quality_prob double, label int",
        )
        bins, ece = calibration_report(df, n_bins=10)
        rows = {r.bin: r for r in bins.collect()}
        # null row excluded: total n == 3
        assert sum(r.n for r in rows.values()) == 3
        # 1.7 clamps to 1.0 (top bin, mean_prob <= 1); -0.3 clamps to 0.0
        assert rows[9].mean_prob <= 1.0
        assert rows[0].mean_prob >= 0.0
        assert 0.0 <= ece <= 1.0

    def test_returned_frame_is_report_sized(self, spark):
        from document_clustering_with_hadoop_mapreduce_spark.operators.quality_clf import (
            calibration_report,
        )

        df = spark.createDataFrame(
            [(i, i / 100.0, i % 2) for i in range(100)],
            "doc_id int, quality_prob double, label int",
        )
        bins, _ = calibration_report(df)
        # rebuilt from collected rows: a local relation, no corpus rescan
        plan = bins._jdf.queryExecution().executedPlan().toString()
        assert "Scan" not in plan or "ExistingRDD" in plan or "LocalTableScan" in plan
