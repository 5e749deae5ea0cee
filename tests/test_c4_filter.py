"""C4-style line/page filter: DuckDB oracle parity on a hand-built
multi-line corpus (the parquet fixture text is single-line word soup, so
the line rules are exercised by a constructed frame registered into
DuckDB), plus rule-by-rule semantic checks and the no-shuffle plan pin.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import c4_line_filter

from conftest import assert_matches_oracle

GOOD = "this line has five words."  # terminal '.', 5 words
DOCS = [
    # survives: three qualifying lines + one junk line removed
    (1, f"{GOOD}\n{GOOD}\n{GOOD}\nshort line"),
    # dropped: only two lines survive (< min_kept_lines)
    (2, f"{GOOD}\n{GOOD}\nno terminal punctuation here at all"),
    # line rules, one violation each: no terminal punct / too few words /
    # contains javascript — page keeps the three good lines
    (3, f"{GOOD}\nends with no period\nfew words here.\nenable JavaScript to view this.\n{GOOD}\n{GOOD}"),
    # page-level drops: lorem ipsum (any case), curly brace
    (4, f"{GOOD}\n{GOOD}\n{GOOD}\nLorem Ipsum dolor sit amet."),
    (5, f"{GOOD}\n{GOOD}\n{GOOD}\nfunction f() {{ return 1; }}"),
    # terminal quote counts as sentence end (C4 keeps end-quotation lines)
    (6, 'he said "this is five words."\n' + f"{GOOD}\n" + 'she replied "indeed it is so!"'),
    # empty page
    (7, ""),
]

_ORACLE = """
WITH lines AS (
  SELECT doc_id, text,
         len(string_split(text, chr(10))) AS n_lines,
         list_filter(string_split(text, chr(10)), l ->
             regexp_matches(l, '[.!?"''][ \t\r]*$')
             AND len(string_split_regex(trim(l), '[ \t\r]+')) >= 5
             AND NOT contains(lower(l), 'javascript')) AS kept
  FROM c4docs
)
SELECT doc_id, array_to_string(kept, chr(10)) AS clean_text,
       n_lines::INT AS n_lines, len(kept)::INT AS n_kept_lines
FROM lines
WHERE len(kept) >= 3
  AND NOT contains(lower(text), 'lorem ipsum')
  AND NOT contains(text, '{')"""


def _frame(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_c4_filter_matches_duckdb_oracle(spark):
    con = duckdb.connect()
    con.register("c4docs", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    df = c4_line_filter(_frame(spark))
    assert_matches_oracle(df, con, _ORACLE)
    con.close()


def test_c4_filter_rule_semantics(spark):
    out = {r["doc_id"]: r.asDict() for r in c4_line_filter(_frame(spark)).collect()}
    assert set(out) == {1, 3, 6}
    assert out[1]["clean_text"] == "\n".join([GOOD] * 3)
    assert (out[1]["n_lines"], out[1]["n_kept_lines"]) == (4, 3)
    # doc 3: each junk line removed for a DIFFERENT line rule
    assert out[3]["n_kept_lines"] == 3 and "javascript" not in out[3]["clean_text"].lower()
    # doc 6: end-quotation lines count as sentence ends
    assert out[6]["n_kept_lines"] == 3


def test_c4_filter_thresholds(spark):
    kept = {r["doc_id"] for r in c4_line_filter(_frame(spark), min_kept_lines=2).collect()}
    assert 2 in kept  # relaxed page threshold admits doc 2
    strict = {r["doc_id"] for r in c4_line_filter(_frame(spark), min_words_per_line=6).collect()}
    assert strict == set()  # every GOOD line has exactly 5 words


def test_c4_filter_is_map_side_only(spark):
    plan = c4_line_filter(_frame(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
