"""Exact phrase search over the corpus — the retrieval family's positional
counterpart to ``operators/bm25.py``'s bag-of-words ranking.

An m-token phrase occurs in a document exactly where the document's m-gram
stream equals the phrase — so batch phrase search is the SAME shape as
heavy-hitter mining (``operators/heavyhitters.py``), run in reverse: explode
each document's m-grams map-side, keep the grams that equal a queried
phrase (broadcast hash join against the query list — queries are KBs), and
count per (phrase, doc). No positional inverted index, no m-way positional
self-join chain: for scan-time search Spark's columnar scan + codegen'd
filter IS the index, and the whole plan is one explode + one broadcast
join + one aggregate — the only shuffle is the final (phrase, doc) count,
bounded by actual matches, not the corpus.

Phrases are normalized through the SAME tokenizer as the documents
(``functions.text.tokens`` semantics, python-side twin) — a phrase with
punctuation or case matches its cleaned form, and a phrase that cleans to
nothing is rejected loudly rather than silently matching nowhere.

All phrases in one batch must share a token length? No — grams are
exploded once per distinct phrase length (usually 1-2 lengths), still one
corpus scan via a fused array concat.

Ranking is occurrence count (ties on doc_id) — compose with ``bm25_topk``
when mixed phrase+term relevance is wanted.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import CLEAN_RE_SPARK, SPLIT_RE, tokens
from .heavyhitters import _gram_strings


def normalize_phrase(phrase: str) -> str:
    """The python twin of ``functions.text.tokens`` for a query string:
    lowercase, strip non-alphanumerics, collapse whitespace."""
    cleaned = re.sub(CLEAN_RE_SPARK, "", phrase.lower())
    return " ".join(t for t in re.split(SPLIT_RE, cleaned) if t)


def phrase_match_counts(
    documents: DataFrame,
    phrases: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(phrase, doc_id, n_matches) for every document containing each
    phrase at least once; ``phrase`` is the normalized form. Occurrences
    may overlap (["a a a"] matches "a a a a" twice) — the sliding-window
    convention, same as ``duplicate_spans``.
    """
    normed = sorted({normalize_phrase(p) for p in phrases})
    if not normed or any(not p for p in normed):
        raise ValueError(
            f"phrases must be non-empty and survive tokenization, got {list(phrases)!r}"
        )
    lengths = sorted({len(p.split(" ")) for p in normed})
    toks = F.col("__toks")
    grams = F.concat(*[_gram_strings(toks, m) for m in lengths])
    stream = documents.select(
        F.col(id_col).alias("doc_id"),
        F.filter(tokens(F.col(text_col)), lambda t: t != "").alias("__toks"),
    ).select("doc_id", F.explode(grams).alias("phrase"))
    query = documents.sparkSession.createDataFrame(
        [(p,) for p in normed], "phrase string"
    )
    return (
        stream.join(F.broadcast(query), "phrase")
        .groupBy("phrase", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )


def phrase_topk(
    documents: DataFrame,
    phrases: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(phrase, doc_id, n_matches, rank): the top ``k`` documents per
    phrase by occurrence count (ties on doc_id) — one window over the
    match-bounded count frame."""
    from .topk import top_k_per_group

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counts = phrase_match_counts(documents, phrases, text_col, id_col)
    return top_k_per_group(
        counts, ["phrase"], [F.col("n_matches").desc(), F.col("doc_id").asc()], k
    )


def phrase_oracle_sql(
    phrases: Sequence[str], k: int | None = None, source: str = "documents"
) -> str:
    """DuckDB mirror of ``phrase_match_counts`` (or ``phrase_topk`` when
    ``k`` is given) — the same m-gram equality over the same token
    stream."""
    from ..functions.text import CLEAN_RE_DUCKDB

    normed = sorted({normalize_phrase(p) for p in phrases})
    lengths = sorted({len(p.split(" ")) for p in normed})
    in_list = ", ".join("'" + p.replace("'", "''") + "'" for p in normed)
    gram_selects = "\n  UNION ALL\n  ".join(
        f"""SELECT doc_id, array_to_string(toks[i:i+{m - 1}], ' ') AS phrase
  FROM ph_t, UNNEST(generate_series(1, len(toks) - {m - 1})) AS t(i)
  WHERE len(toks) >= {m}"""
        for m in lengths
    )
    base = f"""
WITH ph_t AS (
  SELECT doc_id,
         list_filter(string_split_regex(regexp_replace(lower(text), '{CLEAN_RE_DUCKDB}', '', 'g'), '{SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM {source}
),
ph_grams AS (
  {gram_selects}
),
ph_counts AS (
  SELECT phrase, doc_id, count(*)::BIGINT AS n_matches
  FROM ph_grams WHERE phrase IN ({in_list})
  GROUP BY phrase, doc_id
)"""
    if k is None:
        return base + "\nSELECT phrase, doc_id, n_matches FROM ph_counts"
    return base + f""",
ph_ranked AS (
  SELECT phrase, doc_id, n_matches,
         row_number() OVER (PARTITION BY phrase ORDER BY n_matches DESC, doc_id ASC)::INT AS rank
  FROM ph_counts
)
SELECT phrase, doc_id, n_matches, rank FROM ph_ranked WHERE rank <= {int(k)}"""
