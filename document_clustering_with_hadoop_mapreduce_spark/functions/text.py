"""Text cleaning / tokenization column functions.

Re-expresses the reference's map-side token pipeline (strip punctuation ->
lowercase -> whitespace split -> stopword drop; ``sources/1.1/source/
task1_1.java:50-86`` in the reference) as pure Spark column expressions that
stay inside whole-stage codegen — no Python UDFs in the hot path.

Every constant here is ALSO consumed by ``plans/oracles.py`` to generate the
equivalent DuckDB SQL, so the Spark pipeline and the correctness oracle can
never drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Characters kept after cleaning: ASCII alnum + whitespace. The reference
# strips a fixed punctuation set (task1_1.java:75-81); we normalize harder
# (anything non-alnum) which is the sane default for arbitrary corpora.
#
# Canonical whitespace class: the ASCII core [ \t\n\r], written identically
# for Java regex (Spark) and RE2 (DuckDB). Java's `\s` also matches \f and
# \x0B while RE2's `\s` differs again — using `\s` on both engines glues
# words differently on \f/\x0B inputs, so NEITHER side uses it.
WS_CLASS = r" \t\n\r"
CLEAN_RE_SPARK = rf"[^a-z0-9{WS_CLASS}]"
CLEAN_RE_DUCKDB = CLEAN_RE_SPARK  # one class, both engines
SPLIT_RE = rf"[{WS_CLASS}]+"

# Compact English stopword list (reference ships a 299-word file,
# sources/1.1/input/stopwords.txt; the engine accepts any list — this is the
# built-in default shared with the oracle SQL).
STOPWORDS: tuple[str, ...] = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "from",
    "has", "have", "he", "in", "is", "it", "its", "of", "on", "or", "that",
    "the", "this", "to", "was", "were", "will", "with", "she", "they", "we",
    "you", "i", "not", "no", "his", "her", "their", "our", "my", "me",
)


def clean_text(col: Column) -> Column:
    """Lowercase and strip non-alphanumerics (reference P2)."""
    return F.regexp_replace(F.lower(col), CLEAN_RE_SPARK, "")


def tokens(col: Column) -> Column:
    """Cleaned whitespace tokens as ``array<string>`` (reference P1+P2)."""
    return F.split(F.trim(clean_text(col)), SPLIT_RE)


def explode_tokens(text_col: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Exploded token column with empty + stopword tokens dropped (P1-P3).

    Usage::

        df.select("doc_id", explode_tokens(F.col("text")).alias("term"))
    """
    return F.explode(
        F.filter(
            tokens(text_col),
            lambda t: (t != "") & ~t.isin(*stopwords),
        )
    )


def token_count(text_col: Column) -> Column:
    """Whitespace token count, empty-safe (text-analysis surface)."""
    toks = F.split(F.trim(text_col), SPLIT_RE)
    return F.when(F.trim(text_col) == "", F.lit(0)).otherwise(F.size(toks))
