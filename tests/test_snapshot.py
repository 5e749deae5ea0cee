"""Corpus snapshot diff: DuckDB oracle parity on derived snapshots of the
fixture, closed-form semantics, and the delta-sized output contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.snapshot import corpus_diff
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table

from conftest import assert_matches_oracle

# derived snapshots, same predicates both engines: "old" drops doc_id%7==0
# (those become `added`), "new" drops doc_id%11==3 (`removed`) and rewrites
# the text of doc_id%13==5 (`changed`)
_OLD_SQL = "SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0"
_NEW_SQL = (
    "SELECT doc_id, CASE WHEN doc_id % 13 = 5 THEN text || ' v2' ELSE text END AS text "
    "FROM documents WHERE doc_id % 11 <> 3"
)

_ORACLE = f"""
WITH old AS ({_OLD_SQL}),
new AS ({_NEW_SQL}),
o AS (SELECT doc_id, md5(text) AS old_hash FROM old),
n AS (SELECT doc_id, md5(text) AS new_hash FROM new),
j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, o.old_hash, n.new_hash
      FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
SELECT doc_id,
       CASE WHEN old_hash IS NULL THEN 'added'
            WHEN new_hash IS NULL THEN 'removed'
            WHEN old_hash <> new_hash THEN 'changed' END AS status,
       old_hash, new_hash
FROM j
WHERE old_hash IS NULL OR new_hash IS NULL OR old_hash <> new_hash
"""


def _snapshots(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents", fan_out=False).select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 11 != 3).select(
        "doc_id",
        F.when(F.col("doc_id") % 13 == 5, F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return old, new


def test_corpus_diff_matches_oracle(spark, sf_dir, duck):
    old, new = _snapshots(spark, sf_dir)
    assert_matches_oracle(corpus_diff(old, new), duck, _ORACLE)


def test_corpus_diff_all_classes_nonempty(spark, sf_dir):
    old, new = _snapshots(spark, sf_dir)
    by_status = {
        r["status"]: r["n"]
        for r in corpus_diff(old, new).groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    assert set(by_status) == {"added", "removed", "changed"}
    assert all(v > 0 for v in by_status.values())


def test_corpus_diff_closed_form(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")], "doc_id int, text string"
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")], "doc_id int, text string"
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}  # doc 1 absent: unchanged


def test_corpus_diff_null_text_classified_by_presence(spark):
    """Presence must come from side markers, not hash nullness: a null-text
    document present in both snapshots is NOT 'added', and a null <-> text
    transition IS 'changed' (md5(NULL) is NULL, so a hash-based presence
    test gets both wrong)."""
    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "text"), (4, None)], "doc_id int, text string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, "now has text"), (3, None), (5, None)],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    # doc 1 (null -> null) unchanged and ABSENT; 2/3 transitions are changed;
    # 4 removed and 5 added even though their hashes are NULL on both sides
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}


def test_corpus_diff_plan_is_single_join(spark, sf_dir):
    """One shuffle join on the id, nothing corpus-sized broadcast, no
    cartesian — the diff must scale as a co-locatable sort-merge join."""
    old, new = _snapshots(spark, sf_dir)
    plan = corpus_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "FullOuter" in plan or "full_outer" in plan.lower()
