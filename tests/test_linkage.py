"""Record linkage: DuckDB oracle parity under prefix blocking, planted-typo
recall under soundex blocking, block-cap semantics, cross-table mode."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.linkage import (
    blocked_matches,
    blocking_stats,
    prefix_block,
    soundex_block,
)

NAMES = [
    (1, "Acme Widgets Ltd"),
    (2, "ACME   Widgets, Ltd."),  # punctuation/case only: dist 0
    (3, "Acme Wigets Ltd"),  # one deletion: dist 1
    (4, "Acme Gadgets Ltd"),
    (5, "Bolt Fasteners Inc"),
    (6, "Bolt Fastenners Inc"),  # one insertion: dist 1
    (7, "Completely Different Co"),
    (8, "Zenith Optics"),
    (9, "Zenith Optic"),  # one deletion: dist 1
    (10, "Xenith Optics"),  # first-letter typo: soundex block differs
]


@pytest.fixture(scope="module")
def records(spark):
    return spark.createDataFrame(NAMES, "id int, name string")


class TestOracleParity:
    def test_prefix_block_matches_duckdb(self, spark, records):
        got = sorted(
            (r.id_a, r.id_b, r.dist)
            for r in blocked_matches(
                records, block_fn=lambda c: prefix_block(c, 3), max_dist=2
            ).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE recs (id INT, name VARCHAR)")
        con.executemany("INSERT INTO recs VALUES (?, ?)", NAMES)
        want = sorted(
            tuple(r)
            for r in con.execute(
                """
WITH prepped AS (
  SELECT id, name,
         trim(regexp_replace(lower(name), '[^a-z0-9]+', ' ', 'g')) AS norm,
         substr(replace(trim(regexp_replace(lower(name), '[^a-z0-9]+', ' ', 'g')), ' ', ''), 1, 3) AS block
  FROM recs
)
SELECT a.id, b.id, levenshtein(a.norm, b.norm) AS dist
FROM prepped a JOIN prepped b USING (block)
WHERE a.id < b.id AND levenshtein(a.norm, b.norm) <= 2
"""
            ).fetchall()
        )
        assert got == want
        assert (1, 2, 0) in got and (1, 3, 1) in got

    def test_blocking_stats_matches_group_counts(self, spark, records):
        stats = {
            r.block: (r.n_records, r.over_cap)
            for r in blocking_stats(
                records, soundex_block(F.col("name")), max_block_size=2
            ).collect()
        }
        assert sum(n for n, _ in stats.values()) == len(NAMES)
        # Acme* share soundex of first token 'acme' -> one block of 4, over cap 2
        over = [b for b, (n, o) in stats.items() if o]
        assert any(n > 2 for n, _ in stats.values()) and over


class TestSoundexRecall:
    def test_planted_typos_found(self, spark, records):
        got = {(r.id_a, r.id_b) for r in blocked_matches(records, max_dist=2).collect()}
        # vowel-preserving typos stay in the same soundex block
        assert {(1, 2), (1, 3), (5, 6), (8, 9)} <= got
        assert (7, 8) not in got

    def test_first_letter_typo_is_the_documented_miss(self, spark, records):
        # Zenith vs Xenith: dist 1 but different soundex first letter —
        # the known blocking recall loss; a second prefix-blocking pass
        # would ALSO miss it (different prefix), a last-3-chars pass finds it
        got = {(r.id_a, r.id_b) for r in blocked_matches(records, max_dist=2).collect()}
        assert (8, 10) not in got
        rev = blocked_matches(
            records,
            block_fn=lambda c: F.substring(
                F.reverse(F.regexp_replace(F.lower(c), "[^a-z0-9]", "")), 1, 3
            ),
            max_dist=2,
        )
        assert (8, 10) in {(r.id_a, r.id_b) for r in rev.collect()}


class TestCaps:
    def test_over_cap_block_excluded(self, spark):
        rows = [(i, "Smith Hardware") for i in range(10)] + [(100, "Jones Tools"), (101, "Jones Tool")]
        df = spark.createDataFrame(rows, "id int, name string")
        got = {(r.id_a, r.id_b) for r in blocked_matches(df, max_block_size=5).collect()}
        assert got == {(100, 101)}  # the smith block (10 > 5) dropped entirely

    def test_validation(self, spark, records):
        with pytest.raises(ValueError):
            blocked_matches(records, max_dist=-1)
        with pytest.raises(ValueError):
            blocked_matches(records, max_block_size=0)


class TestCrossTable:
    def test_master_vs_feed(self, spark):
        master = spark.createDataFrame(
            [(1, "Acme Widgets Ltd"), (2, "Bolt Fasteners Inc")], "id int, name string"
        )
        feed = spark.createDataFrame(
            [(900, "acme widgets ltd"), (901, "Unrelated Name Here")], "id int, name string"
        )
        got = {(r.id_a, r.id_b, r.dist) for r in blocked_matches(master, feed).collect()}
        assert got == {(1, 900, 0)}


class TestEmptyNorm:
    def test_unmatchable_names_never_fabricate_links(self, spark):
        # pure punctuation / non-Latin names normalize to '' — they must
        # be EXCLUDED, not paired with each other at distance 0
        df = spark.createDataFrame(
            [(1, "???"), (2, "#!!"), (3, "---"), (4, "Real Name Co"), (5, "Real Name Co")],
            "id int, name string",
        )
        got = {(r.id_a, r.id_b) for r in blocked_matches(df, max_dist=2).collect()}
        assert got == {(4, 5)}
