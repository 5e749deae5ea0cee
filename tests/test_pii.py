"""PII scrubbing: value parity against a DuckDB oracle running the SAME
pattern constants, on synthetic PII-bearing text plus real fixture rows."""

from __future__ import annotations

import duckdb

from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
    PII_PATTERNS,
    pii_scrub,
)
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table
from tests.conftest import assert_matches_oracle

SYNTH = [
    (9001, "contact me at jane.doe+spam@example.co.uk or visit https://example.com/a?b=c today"),
    (9002, "call +1 (555) 123-4567 or 555.987.6543 now"),
    (9003, "no pii here, just text with numbers 42 and 7"),
    (9004, "mixed: bob@x.io went to http://t.co/xyz then phoned 020 7946 0958."),
    (9005, ""),
]


def test_pii_scrub_matches_duckdb_oracle(spark, sf_dir):
    docs = spark.createDataFrame(SYNTH, "doc_id LONG, text STRING").unionByName(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(50)
    )
    out = pii_scrub(docs)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    con.execute(
        "CREATE VIEW synth AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t.replace(chr(39), chr(39) * 2)}')" for i, t in SYNTH)
        + ") AS t(doc_id, text)"
    )
    email, url, phone = (
        PII_PATTERNS["email"], PII_PATTERNS["url"], PII_PATTERNS["phone"],
    )
    sql = f"""
    WITH all_docs AS (
      SELECT doc_id, text FROM synth
      UNION ALL
      SELECT doc_id, text FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 50)
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(text,
               '{email}', '', 'g'), '{url}', '', 'g'), '{phone}', '', 'g') AS clean_text,
           len(regexp_extract_all(text, '{email}')) AS n_emails,
           len(regexp_extract_all(text, '{url}')) AS n_urls,
           len(regexp_extract_all(text, '{phone}')) AS n_phones
    FROM all_docs"""
    assert_matches_oracle(out, con, sql)
    con.close()

    got = {r["doc_id"]: r for r in out.filter(out.doc_id >= 9001).collect()}
    assert got[9001]["n_emails"] == 1 and got[9001]["n_urls"] == 1
    assert got[9002]["n_phones"] == 2
    assert got[9003]["n_emails"] == got[9003]["n_urls"] == got[9003]["n_phones"] == 0
    assert "bob@x.io" not in got[9004]["clean_text"]
    assert "http://" not in got[9004]["clean_text"]


def test_pii_scrub_is_map_side_only(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents", fan_out=False)
    plan = pii_scrub(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
