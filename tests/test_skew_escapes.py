"""Hot-key skew escapes are EXACT twins of their gated defaults:
sessionize_chunked == sessionize (incl. chunk-boundary sessions and a
planted viral user), filter_min_corpus_freq_joined == the window form,
and tfidf(df_via_join=True) == the window form — each bounds a task AQE
cannot split (a window partition) by a shape it can (a skewed join)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.events import (
    sessionize,
    sessionize_chunked,
)
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table


def _rows(df):
    return sorted(
        (r["user_id"], r["session_idx"], r["n_events"], r["duration_sec"], r["sum_value"])
        for r in df.collect()
    )


@pytest.mark.parametrize("chunk", ["day", "hour"])
def test_matches_one_pass_on_fixture(spark, sf_dir, chunk):
    ev = load_table(spark, sf_dir, "events")
    assert _rows(sessionize_chunked(ev, chunk=chunk)) == _rows(sessionize(ev))


def test_sessions_spanning_chunk_boundaries_merge_exactly(spark):
    """A session of 10-min-spaced events crossing midnight (and, for
    chunk='hour', eleven hour boundaries) must come back as ONE session
    with the same stats the one-pass form computes; a >gap silence inside
    one chunk must still split."""
    base = dt.datetime(2024, 3, 1, 22, 0, 0)
    rows = []
    # user 1: 18 events every 10 min from 22:00 -> 00:50 next day (one
    # session crossing the day boundary), then a 2h silence, then 3 more
    for i in range(18):
        rows.append((i, base + dt.timedelta(minutes=10 * i), 1, "click", 1.5))
    tail = base + dt.timedelta(minutes=10 * 17 + 120)
    for j in range(3):
        rows.append((100 + j, tail + dt.timedelta(minutes=10 * j), 1, "click", 2.0))
    # user 2: two single-event sessions inside one hour, 40 min apart
    rows.append((200, base, 2, "view", 0.25))
    rows.append((201, base + dt.timedelta(minutes=40), 2, "view", 0.25))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    want = _rows(sessionize(ev))
    assert _rows(sessionize_chunked(ev, chunk="day")) == want
    assert _rows(sessionize_chunked(ev, chunk="hour")) == want
    # shape sanity on the constructed truth: user 1 has exactly 2 sessions
    # (18 + 3 events), user 2 exactly 2 (the 40-min gap > the 30-min gap)
    by_user = {}
    for u, _idx, n, _d, _s in want:
        by_user.setdefault(u, []).append(n)
    assert sorted(by_user[1]) == [3, 18]
    assert by_user[2] == [1, 1]


def test_viral_user_identical_and_chunk_bounded(spark):
    """The planted hot case this operator exists for: one user with 4,000
    events over ~28 days (dense -> few sessions) among 50 normal users.
    Output identical to one-pass; the per-(user, chunk) group the sort
    task sees is a small fraction of the user's total events."""
    base = dt.datetime(2024, 5, 1, 0, 0, 0)
    rows = []
    for i in range(4000):
        rows.append((i, base + dt.timedelta(minutes=10 * i), 7, "click", 0.5))
    for u in range(50):
        rows.append((10_000 + u, base + dt.timedelta(hours=u), 100 + u, "view", 1.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    assert _rows(sessionize_chunked(ev, chunk="day")) == _rows(sessionize(ev))
    widest = (
        ev.groupBy("user_id", F.date_trunc("day", "ts"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert widest <= 145  # 24h of 10-min events: the bounded sort width


def test_min_freq_join_escape_matches_window_form(spark, sf_dir):
    """filter_min_corpus_freq_joined (the AQE-splittable skew escape) must
    return exactly the window form's rows on the real matrix, at a
    threshold that actually drops terms."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.term_matrix import (
        filter_min_corpus_freq,
        filter_min_corpus_freq_joined,
        term_doc_counts,
    )

    m = term_doc_counts(load_table(spark, sf_dir, "documents")).localCheckpoint()
    # a data-derived threshold that PROVABLY drops terms: the max per-term
    # corpus total (everything below it goes) — plus the slot's 3
    max_total = (
        m.groupBy("term").agg(F.sum("cnt").alias("t")).agg(F.max("t")).collect()[0][0]
    )
    full = m.count()
    for min_total in (3, int(max_total)):
        a = sorted(map(tuple, filter_min_corpus_freq(m, min_total).collect()))
        b = sorted(map(tuple, filter_min_corpus_freq_joined(m, min_total).collect()))
        assert a and a == b
    assert len(a) < full, "max-total threshold dropped nothing — vacuous check"


class TestRelationalWindowEscapes:
    """VERDICT r12 #1: the two remaining unsplittable per-customer windows
    get chunked escapes, row-identical to the one-pass forms."""

    @staticmethod
    def _recent_rows(df):
        return sorted(
            (r["c_custkey"], r["o_orderkey"], r["rn"], r["running_spend"])
            for r in df.collect()
        )

    @staticmethod
    def _rolling_rows(df):
        return sorted(
            (r["o_custkey"], r["o_orderkey"], r["spend_30d"]) for r in df.collect()
        )

    def test_recent_orders_chunked_matches_on_fixture(self, spark, sf_dir):
        from document_clustering_with_hadoop_mapreduce_spark.operators.relational import (
            customer_recent_orders,
            customer_recent_orders_chunked,
        )

        cust = load_table(spark, sf_dir, "customer")
        orders = load_table(spark, sf_dir, "orders")
        for chunk in ("month", "year"):
            assert self._recent_rows(
                customer_recent_orders_chunked(cust, orders, chunk=chunk)
            ) == self._recent_rows(customer_recent_orders(cust, orders))

    def test_rolling_chunked_matches_on_fixture(self, spark, sf_dir):
        from document_clustering_with_hadoop_mapreduce_spark.operators.relational import (
            rolling_30d_spend,
            rolling_30d_spend_chunked,
        )

        orders = load_table(spark, sf_dir, "orders")
        for chunk_days in (30, 45):
            assert self._rolling_rows(
                rolling_30d_spend_chunked(orders, chunk_days=chunk_days)
            ) == self._rolling_rows(rolling_30d_spend(orders))
        with pytest.raises(ValueError, match="chunk_days"):
            rolling_30d_spend_chunked(orders, chunk_days=7)

    def _hot_customer_frames(self, spark):
        """One customer with 3,000 orders over ~8 years (several per day)
        among 40 normal customers; includes exact chunk-boundary dates."""
        rows = []
        base = dt.date(1992, 1, 1)
        for i in range(3000):
            rows.append((100_000 + i, 7, base + dt.timedelta(days=i % 2900), 100.01 + (i % 97)))
        for u in range(40):
            for j in range(3):
                rows.append((200_000 + u * 10 + j, 100 + u, base + dt.timedelta(days=30 * j), 250.5 + u))
        orders = spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double"
        )
        cust = spark.createDataFrame(
            [(c, f"Customer#{c}") for c in [7] + [100 + u for u in range(40)]],
            "c_custkey long, c_name string",
        )
        return cust, orders

    def test_recent_orders_chunked_hot_customer(self, spark):
        from document_clustering_with_hadoop_mapreduce_spark.operators.relational import (
            customer_recent_orders,
            customer_recent_orders_chunked,
        )

        cust, orders = self._hot_customer_frames(spark)
        want = self._recent_rows(customer_recent_orders(cust, orders, k=5))
        for chunk in ("month", "year"):
            assert (
                self._recent_rows(
                    customer_recent_orders_chunked(cust, orders, k=5, chunk=chunk)
                )
                == want
            )

    def test_rolling_chunked_hot_customer_and_boundaries(self, spark):
        """The planted hot customer has same-date ties and orders exactly
        30 days apart (the inclusive frame edge) and exactly at aligned
        chunk boundaries — the cases where a two-chunk split could lose
        or double-count a contributor."""
        from document_clustering_with_hadoop_mapreduce_spark.operators.relational import (
            rolling_30d_spend,
            rolling_30d_spend_chunked,
        )

        cust, orders = self._hot_customer_frames(spark)
        # add exact-boundary rows: epoch multiples of 30d, and pairs 30d apart
        extra = spark.createDataFrame(
            [
                (900_001, 7, dt.date(1992, 3, 1), 10.0),
                (900_002, 7, dt.date(1992, 3, 31), 20.0),
                (900_003, 7, dt.date(1992, 4, 30), 40.0),
                (900_004, 99, dt.date(1970, 1, 31), 1.25),
                (900_005, 99, dt.date(1970, 3, 2), 2.5),
            ],
            "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double",
        )
        orders = orders.unionByName(extra)
        want = self._rolling_rows(rolling_30d_spend(orders))
        for chunk_days in (30, 60):
            assert (
                self._rolling_rows(rolling_30d_spend_chunked(orders, chunk_days=chunk_days))
                == want
            )


def test_tfidf_df_via_join_matches_window_form(spark, sf_dir):
    """tfidf(df_via_join=True) — the AQE-splittable hot-term escape — is
    row-identical to the window form, with n_docs driver-known AND
    derived."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.term_matrix import (
        term_doc_counts,
    )
    from document_clustering_with_hadoop_mapreduce_spark.operators.tfidf import tfidf

    m = term_doc_counts(load_table(spark, sf_dir, "documents")).localCheckpoint()
    n = m.select("doc_id").distinct().count()
    for kwargs in ({"n_docs": n}, {}):
        a = sorted(map(tuple, tfidf(m, **kwargs).collect()))
        b = sorted(map(tuple, tfidf(m, df_via_join=True, **kwargs).collect()))
        assert a and a == b
    # compat_n1 ignores the knob (doc-keyed window is doc-bounded)
    c = sorted(map(tuple, tfidf(m, n_docs=n, compat_n1=True).collect()))
    d = sorted(
        map(tuple, tfidf(m, n_docs=n, compat_n1=True, df_via_join=True).collect())
    )
    assert c == d
