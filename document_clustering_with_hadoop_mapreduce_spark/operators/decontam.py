"""Benchmark decontamination: drop training documents that overlap an
evaluation/benchmark set on word n-grams.

The standard guard in LLM training-data builds (GPT-3 appendix C, PaLM §6,
Llama 2 §A.6 all describe variants): a training document is *contaminated*
when it shares at least ``min_overlap`` distinct word n-grams with any
document in the held-out eval suite; contaminated documents are removed
before training so benchmark numbers measure generalization, not recall.

Scale design (the asymmetry is the whole trick): benchmarks are MBs while
the corpus is TBs, so the eval n-gram set is the ONLY thing that moves —
it is distinct-aggregated (a few million longs at most) and broadcast to
every executor. The corpus side is a map-side shingle-hash explode (zero
shuffle, same narrow stage as MinHash — ``shingle_hashes``) feeding a
broadcast-hash semi-join; only MATCHED (doc_id, h) rows reach the per-doc
overlap aggregate, so the lone exchange carries the contamination hits,
not the corpus. The final removal is a left-anti join against the flagged
id set, which AQE turns into a broadcast anti-join when the flagged set is
small (the normal case).

Shingling reuses the dedup substrate (``operators/dedup.py``:
token-pipeline with stopwords KEPT, 60-bit md5 shingle hashes) so the
DuckDB oracle mirrors bit-for-bit with the same hash expression the
MinHash oracles use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_hashes


def eval_ngram_set(eval_docs: DataFrame, n: int = 8, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Distinct 60-bit n-gram hashes of the eval suite: one column ``h``.

    Small by construction (benchmarks are MBs) — the caller broadcasts it.
    The distinct here is cheap (eval-sized) and makes the broadcast frame
    minimal."""
    return shingle_hashes(eval_docs, n=n, text_col=text_col, id_col=id_col).select("h").distinct()


def contamination_stats(
    documents: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_overlap): distinct n-gram hashes each training document
    shares with the eval set. Documents with zero overlap are ABSENT (the
    common case at scale — emitting a zero row per corpus doc would turn a
    hits-sized result into a corpus-sized one; ``decontaminate`` treats
    absence as clean).

    countDistinct, not count: a doc repeating one contaminated n-gram 50
    times overlaps the benchmark on ONE n-gram, and ``shingle_hashes``
    deliberately skips the corpus-side distinct (min/semi-join consumers
    don't need it), so the dedup happens here on matched rows only.
    """
    corpus = shingle_hashes(documents, n=n, text_col=text_col, id_col=id_col)
    hits = corpus.join(F.broadcast(eval_ngram_set(eval_docs, n, text_col, id_col)), "h")
    return hits.groupBy("doc_id").agg(F.countDistinct("h").alias("n_overlap"))


def decontaminate(
    documents: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training documents with contaminated ones removed (same schema as
    ``documents``). A doc is removed when it shares >= ``min_overlap``
    distinct n-grams with the eval suite; ``min_overlap`` > 1 is the
    tolerance knob for boilerplate n-grams that legitimately occur
    everywhere (licence headers, navigation chrome)."""
    if min_overlap < 1:
        raise ValueError(f"min_overlap must be >= 1, got {min_overlap}")
    flagged = (
        contamination_stats(documents, eval_docs, n, text_col, id_col)
        .filter(F.col("n_overlap") >= min_overlap)
        .select(F.col("doc_id").alias(id_col))
    )
    return documents.join(flagged, id_col, "left_anti")
