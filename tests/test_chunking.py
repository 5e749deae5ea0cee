"""chunk_documents: DuckDB oracle parity, coverage/overlap invariants on
real docs, edge shapes."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
    chunk_documents,
)

CT, OV = 16, 4  # chunk_tokens, overlap -> stride 12


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_matches_duckdb_oracle(spark, sf_dir, docs):
    got = sorted(
        (r.doc_id, r.chunk_idx, r.start_token, r.n_tokens, r.chunk_text)
        for r in chunk_documents(docs, chunk_tokens=CT, overlap=OV).collect()
    )
    stride = CT - OV
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\r]+') AS toks
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
),
sized AS (
  SELECT doc_id, toks,
         greatest(1, CAST(ceil((len(toks) - {OV}) / {stride}.0) AS INT)) AS nc
  FROM t
),
chunks AS (
  SELECT doc_id, i AS chunk_idx, 1 + i * {stride} AS start_token,
         toks[1 + i * {stride} : least(i * {stride} + {CT}, len(toks))] AS ctoks
  FROM sized, LATERAL (SELECT unnest(generate_series(0, nc - 1)) AS i) g
)
SELECT doc_id, chunk_idx::INT, start_token::INT,
       len(ctoks)::INT AS n_tokens, array_to_string(ctoks, ' ') AS chunk_text
FROM chunks
"""
        ).fetchall()
    )
    assert got == want


def test_coverage_and_overlap_invariants(spark, docs):
    out = chunk_documents(docs, chunk_tokens=CT, overlap=OV).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    total_doc_tokens = {
        r.doc_id: r.n
        for r in docs.where(F.trim("text") != "")
        .select("doc_id", F.size(F.split(F.trim("text"), "[ \\t\\n\\r]+")).alias("n"))
        .collect()
    }
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = total_doc_tokens[doc_id]
        # full coverage: last chunk reaches the final token
        last = chunks[-1]
        assert last.start_token + last.n_tokens - 1 == n
        # adjacent chunks share exactly OV tokens (when both are full-size)
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_token == a.start_token + (CT - OV)
            if a.n_tokens == CT:
                assert a.start_token + CT - b.start_token == OV
        # no chunk is empty and none exceeds the capacity
        assert all(0 < c.n_tokens <= CT for c in chunks)


def test_short_doc_single_chunk(spark):
    df = spark.createDataFrame(
        [(1, "just five little tokens here"), (2, ""), (3, None), (4, "x")],
        "doc_id int, text string",
    )
    out = chunk_documents(df, chunk_tokens=CT, overlap=OV).collect()
    by_doc = {r.doc_id: r for r in out}
    assert set(by_doc) == {1, 4}
    assert by_doc[1].n_tokens == 5 and by_doc[1].chunk_idx == 0
    assert by_doc[1].chunk_text == "just five little tokens here"
    assert by_doc[4].chunk_text == "x"


def test_chunk_ids_globally_unique(spark, docs):
    out = chunk_documents(docs, chunk_tokens=CT, overlap=OV)
    assert out.select("chunk_id").distinct().count() == out.count()


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id int, text string")
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_chunks_flow_through_minhash_dedup(spark, docs):
    """Composability: the chunk table IS a documents table (doc_id, text),
    so chunk-level near-dup runs through the existing MinHash/LSH stack
    unchanged — planted: two docs sharing a long identical passage yield
    chunk-level LSH candidates even though the DOCS differ elsewhere."""
    from pyspark.sql import functions as F

    from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingle_hashes,
    )
    from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
        chunk_documents,
    )

    shared = " ".join(f"passage{i}" for i in range(40))
    planted = spark.createDataFrame(
        [
            (9000001, "unique alpha beta gamma " * 10 + shared),
            (9000002, shared + " totally different tail content " * 10),
        ],
        "doc_id long, text string",
    )
    chunks = chunk_documents(planted, chunk_tokens=32, overlap=8).select(
        # chunk_id is a string; the dedup stack needs a long id — hash it
        F.abs(F.hash("chunk_id")).cast("long").alias("doc_id"),
        F.col("chunk_text").alias("text"),
        F.col("doc_id").alias("parent_doc"),
    )
    sigs = minhash_signatures(shingle_hashes(chunks, n=3))
    pairs = lsh_candidate_pairs(sigs)
    parent = chunks.select("doc_id", "parent_doc")
    cross_doc = (
        pairs.join(parent.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("parent_doc", "pa"), "doc_a")
        .join(parent.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("parent_doc", "pb"), "doc_b")
        .where(F.col("pa") != F.col("pb"))
        .count()
    )
    assert cross_doc > 0
