"""BPE tokenizer training/encoding vs a pure-Python oracle.

The oracle re-implements the identical algorithm (word-count training
table, (count desc, pair asc) tie-break, greedy left-to-right merge) with
plain dicts, so merge tables and encodings must match EXACTLY — any
drift in the fold semantics or tie-break ordering fails loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.bpe import (
    EOW,
    bpe_encode_words,
    bpe_token_counts,
    bpe_train,
    encode_word,
    word_counts,
)


def py_bpe_train(wc: dict[str, int], num_merges: int, min_frequency: int = 2):
    """Reference implementation: returns (merges, final segmentation)."""
    table = {w: (list(w) + [EOW], c) for w, c in wc.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in table.values():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (a, b), n = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if n < min_frequency:
            break
        merges.append((a, b))
        for w, (syms, c) in table.items():
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            table[w] = (out, c)
    return merges, {w: syms for w, (syms, c) in table.items()}


def _docs(spark, rows):
    return spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


SENNRICH = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3


def test_sennrich_corpus_first_merges(spark):
    """The classic worked example: 'es' (9) wins the lexicographic tie with
    'st'/'t</w>' (also 9), then chains to 'est', 'est</w>'."""
    docs = _docs(spark, [" ".join(SENNRICH)])
    merges = bpe_train(word_counts(docs), num_merges=3)
    assert merges == [("e", "s"), ("es", "t"), ("est", EOW)]


@pytest.mark.slow
def test_train_matches_python_oracle_on_corpus(spark, sf_dir):
    # deterministic subset, NOT limit(120): this frame is evaluated by
    # both the oracle collect AND bpe_train's per-merge actions, and
    # limit under a parallel scan may return a different 120 rows per
    # action (the class that flaked test_multimodal at sf0.01)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 120
    )
    wc_rows = word_counts(docs, max_words=400).collect()
    wc = {r["word"]: r["cnt"] for r in wc_rows}
    expected, _ = py_bpe_train(wc, num_merges=25)
    got = bpe_train(word_counts(docs, max_words=400), num_merges=25)
    assert got == expected
    assert len(got) == 25  # a real corpus sustains 25 merges


def test_train_min_frequency_early_stop(spark):
    docs = _docs(spark, ["ab cd", "ab"])  # best pair (a,b) has mass 2, rest 1
    merges = bpe_train(word_counts(docs), num_merges=10, min_frequency=2)
    assert merges == [("a", "b"), ("ab", EOW)]  # 'ab</w>' also reaches mass 2


def test_encode_matches_training_segmentation(spark, sf_dir):
    """Inference must reproduce training: encoding a training-set word with
    the rank rule equals the segmentation training left it with."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    wc = {r["word"]: r["cnt"] for r in word_counts(docs, max_words=400).collect()}
    merges, final = py_bpe_train(wc, num_merges=25)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, syms in sorted(final.items())[:200]:
        assert encode_word(w, ranks) == syms, w


def test_encode_words_udf_matches_pure_python(spark):
    merges = [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o")]
    ranks = {p: i for i, p in enumerate(merges)}
    words = spark.createDataFrame([("newest",), ("lowest",), ("x",)], "word string")
    got = {r["word"]: r["bpe"] for r in bpe_encode_words(words, merges).collect()}
    assert got == {w: encode_word(w, ranks) for w in ["newest", "lowest", "x"]}


def test_token_counts_closed_form(spark):
    docs = _docs(spark, ["newest newest low", "", "widest"])
    merges = [("e", "s"), ("es", "t"), ("est", EOW)]
    ranks = {p: i for i, p in enumerate(merges)}
    exp = {
        0: 2 * len(encode_word("newest", ranks)) + len(encode_word("low", ranks)),
        1: 0,  # blank doc keeps a 0 row via the left join
        2: len(encode_word("widest", ranks)),
    }
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_counts(docs, merges).collect()}
    assert got == exp


def test_determinism_same_merges_twice(spark):
    docs = _docs(spark, [" ".join(SENNRICH), "the newest widest low lower"])
    m1 = bpe_train(word_counts(docs), num_merges=8)
    m2 = bpe_train(word_counts(docs), num_merges=8)
    assert m1 == m2 and len(m1) == 8


def test_plan_word_counts_partial_agg_single_scan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = word_counts(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert plan.count("HashAggregate") >= 2  # map-side partial + final
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_plan_token_counts_no_vocab_broadcast_hint(spark, sf_dir):
    """The vocab frame is O(distinct words) — never hint-broadcast it.

    Checked on the OPTIMIZED LOGICAL plan (AQE may legitimately choose a
    stats-driven broadcast physically; the pin is that WE don't force it)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = [("t", "h"), ("th", "e"), ("the", EOW)]
    df = bpe_token_counts(docs, merges)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in logical and "hints=[broadcast" not in logical.lower()
    # the only Python stage is the vocab encoder, downstream of a distinct —
    # corpus text reaches an aggregate before any Arrow stage
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert physical.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in physical
