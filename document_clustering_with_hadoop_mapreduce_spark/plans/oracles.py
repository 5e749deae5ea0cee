"""Shared SQL fragments for the DuckDB correctness oracles.

The oracle SQL is GENERATED from the same constants the Spark operators use
(`functions.text.STOPWORDS`, the cleaning regexes, minhash params), so the
pipeline and its oracle cannot drift. Fragments compose via CTEs.
"""

from __future__ import annotations

from ..functions.text import CLEAN_RE_DUCKDB, STOPWORDS

STOPWORDS_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# (doc_id, term) token stream after clean/split/stopword-drop — mirrors
# functions.text.explode_tokens exactly.
TOKENS_CTE = f"""
toks AS (
  SELECT doc_id,
         unnest(string_split_regex(regexp_replace(lower(text), '{CLEAN_RE_DUCKDB}', '', 'g'), '[ \t\n\r]+')) AS term
  FROM documents
),
terms AS (
  SELECT doc_id, term FROM toks
  WHERE term <> '' AND term NOT IN ({STOPWORDS_SQL})
)"""

# A1 sparse count matrix
MATRIX_CTE = f"""
WITH {TOKENS_CTE},
matrix AS (
  SELECT doc_id, term, count(*) AS cnt FROM terms GROUP BY doc_id, term
)"""

# A5/A6 standard tf-idf over the matrix
TFIDF_CTE = f"""{MATRIX_CTE},
tf AS (
  SELECT doc_id, term, cnt,
         cnt::DOUBLE / sum(cnt) OVER (PARTITION BY doc_id) AS tf
  FROM matrix
),
-- N = total corpus size, a driver-known scalar in the Spark plan (the
-- reference reads `totalDocs` from a config side-channel, S12 —
-- ref sources/1.4/source/task1_4.java:46-49,115); count(*) here mirrors
-- `documents.count()` on the Spark side so the engines agree by
-- construction even if a document tokenizes to zero terms.
n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
tfidf AS (
  SELECT doc_id, term, cnt, tf,
         tf * ln(n.n_docs / count(*) OVER (PARTITION BY term)) AS tfidf
  FROM tf, n
)"""
