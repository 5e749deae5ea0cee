"""Exact-substring duplicate CUTTING (Lee et al. 2021 ExactSubstr removal):
DuckDB oracle parity on the fixture, closed-form semantics on a hand-built
corpus, and the map-side-rebuild plan shape.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.dedup import (
    cut_duplicate_spans,
)
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table

from conftest import assert_matches_oracle

W, STRIDE, MDF = 3, 1, 2

_ORACLE = f"""
WITH docs_t AS (
  SELECT doc_id,
         list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z0-9 \\t\\n\\r]', '', 'g'), '[ \\t\\n\\r]+'),
                     t -> t <> '') AS toks
  FROM documents
),
sp AS (
  SELECT doc_id, i AS pos,
         CAST(('0x' || substr(md5(array_to_string(toks[i:i+{W - 1}], ' ')), 1, 15)) AS BIGINT) AS h
  FROM docs_t, UNNEST(generate_series(1, len(toks) - {W - 1}, {STRIDE})) AS t(i)
  WHERE len(toks) >= {W}
),
dup AS (
  SELECT h, min(doc_id) AS kd
  FROM sp GROUP BY h HAVING count(DISTINCT doc_id) >= {MDF}
),
keeper AS (
  SELECT d.h, d.kd, min(s.pos) AS kp
  FROM dup d JOIN sp s ON s.h = d.h AND s.doc_id = d.kd
  GROUP BY d.h, d.kd
),
sites AS (
  SELECT s.doc_id, s.pos
  FROM sp s JOIN keeper k ON s.h = k.h
  WHERE NOT (s.doc_id = k.kd AND s.pos = k.kp)
),
kept AS (
  SELECT d.doc_id, t.i, d.toks[t.i] AS tok
  FROM docs_t d, UNNEST(generate_series(1, len(d.toks))) AS t(i)
  WHERE NOT EXISTS (
    SELECT 1 FROM sites s
    WHERE s.doc_id = d.doc_id AND t.i >= s.pos AND t.i <= s.pos + {W - 1}
  )
),
reb AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text, count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       len(d.toks)::INT AS n_tokens,
       (len(d.toks) - coalesce(r.n_kept, 0))::INT AS n_removed
FROM docs_t d LEFT JOIN reb r USING (doc_id)
"""


def test_cut_duplicate_spans_matches_oracle(spark, sf_dir, duck):
    docs = load_table(spark, sf_dir, "documents")
    df = cut_duplicate_spans(docs, window=W, stride=STRIDE, min_doc_freq=MDF)
    assert_matches_oracle(df, duck, _ORACLE)


def test_cut_duplicate_spans_removes_something_on_fixture(spark, sf_dir):
    # word-soup fixture texts share 3-grams heavily — the gate must not be
    # trivially green on an empty cut set
    docs = load_table(spark, sf_dir, "documents")
    out = cut_duplicate_spans(docs, window=W, stride=STRIDE)
    assert out.filter(F.col("n_removed") > 0).count() > 0


def test_cut_duplicate_spans_closed_form(spark):
    shared = "lorem ipsum dolor sit amet"  # 5-token passage, in docs 1 and 2
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"epsilon zeta {shared} eta theta iota"),
            (3, "kappa lambda mu nu xi omicron"),
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in cut_duplicate_spans(docs, window=5, stride=1).collect()}
    # doc 1 holds the keeper occurrence (min doc_id): untouched
    assert rows[1]["clean_text"] == f"alpha beta {shared} gamma delta"
    assert rows[1]["n_removed"] == 0
    # doc 2 loses exactly the 5 shared tokens, surrounding text survives
    assert rows[2]["clean_text"] == "epsilon zeta eta theta iota"
    assert rows[2]["n_removed"] == 5
    # doc 3 shares nothing: untouched
    assert rows[3]["clean_text"] == "kappa lambda mu nu xi omicron"
    assert rows[3]["n_removed"] == 0
    assert all(r["n_tokens"] - r["n_removed"] == len(r["clean_text"].split()) for r in rows.values() if r["clean_text"])


def test_cut_duplicate_spans_within_doc_repeat_of_cross_doc_span(spark):
    shared = "one two three"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} pad0 pad1"),
            (2, f"{shared} mid0 mid1 {shared}"),
        ],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in cut_duplicate_spans(docs, window=3, stride=1).collect()}
    # keeper is (doc 1, pos 1); BOTH of doc 2's occurrences are cut
    assert rows[1]["n_removed"] == 0
    assert rows[2]["clean_text"] == "mid0 mid1"
    assert rows[2]["n_removed"] == 6


def test_cut_duplicate_spans_rebuild_is_map_side(spark, sf_dir):
    """The token stream must never shuffle: the only exchanges are the
    hash-key aggregate, the site join and the per-doc cuts aggregate/join —
    the rebuild itself is a projection (no explode of tokens into rows)."""
    docs = load_table(spark, sf_dir, "documents", fan_out=False)
    plan = cut_duplicate_spans(docs, window=W)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # tokens are rebuilt in-row: the only Generates are the TWO span_hashes
    # explodes (keeper-agg consumer + site-join consumer — recomputing the
    # map-side explode is deliberately cheaper than materializing an
    # exploded corpus-x-positions frame); nothing explodes in the rebuild
    assert plan.count("Generate") == 2


@pytest.mark.slow
def test_cut_duplicate_spans_matches_pure_python_property(spark):
    """Property: the cut output equals a pure-Python reimplementation of
    keep-first-occurrence span removal on small random corpora."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcde", min_size=1, max_size=4)

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        docs=st.lists(
            st.lists(word, min_size=0, max_size=12).map(" ".join),
            min_size=1, max_size=6,
        ),
        window=st.integers(min_value=1, max_value=4),
    )
    def run(docs, window):
        from collections import defaultdict

        sites = defaultdict(list)  # span text -> [(doc, pos)]
        toks_by_doc = [t.split() for t in docs]
        for i, toks in enumerate(toks_by_doc):
            for p in range(len(toks) - window + 1):
                sites[" ".join(toks[p:p + window])].append((i, p + 1))
        cut = defaultdict(set)  # doc -> removed 1-based token indices
        for span, occ in sites.items():
            if len({d for d, _ in occ}) < 2:
                continue
            keeper = min(occ)
            for d, p in occ:
                if (d, p) != keeper:
                    cut[d].update(range(p, p + window))
        want = {}
        for i, toks in enumerate(toks_by_doc):
            kept = [t for j, t in enumerate(toks, start=1) if j not in cut[i]]
            want[i] = (" ".join(kept), len(toks), len(toks) - len(kept))
        frame = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
        got = {
            r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
            for r in cut_duplicate_spans(frame, window=window).collect()
        }
        assert got == want, (got, want)

    run()
