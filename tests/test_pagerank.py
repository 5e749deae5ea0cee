"""PageRank: pure-python power-iteration oracle parity on a random digraph,
planted structure (hub dominance), dangling-mass conservation, convergence
contract."""

from __future__ import annotations

import random

import pytest

from document_clustering_with_hadoop_mapreduce_spark.operators.graph import pagerank


def _pagerank_py(edges, d=0.85, iters=100, tol=1e-12):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out: dict = {}
    for u, v in set(edges):
        out.setdefault(u, set()).add(v)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(r[v] for v in nodes if v not in out)
        nr = {}
        for v in nodes:
            nr[v] = (1 - d) / n + d * dangling / n
        for u, vs in out.items():
            w = r[u] / len(vs)
            for v in vs:
                nr[v] += d * w
        delta = sum(abs(nr[v] - r[v]) for v in nodes)
        r = nr
        if delta < tol:
            break
    return r


class TestOracleParity:
    @pytest.mark.slow
    def test_random_digraph_matches_power_iteration(self, spark):
        rng = random.Random(13)
        edges = list({(rng.randrange(60), rng.randrange(60)) for _ in range(400)})
        edges = [(u, v) for u, v in edges if u != v]
        df = spark.createDataFrame(edges, "src int, dst int")
        got = {r.node: r.rank for r in pagerank(df, max_iter=100, tol=1e-7).collect()}
        want = _pagerank_py(edges)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-6), v

    def test_ranks_sum_to_one(self, spark):
        rng = random.Random(5)
        edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(150)]
        edges = [(u, v) for u, v in edges if u != v]
        df = spark.createDataFrame(edges, "src int, dst int")
        # rank mass is conserved at EVERY iteration, so a short fixed run suffices
        total = sum(r.rank for r in pagerank(df, max_iter=8, tol=0.0).collect())
        assert total == pytest.approx(1.0, abs=1e-6)


class TestStructure:
    @pytest.mark.slow
    def test_star_hub_dominates(self, spark):
        # spokes all point at the hub: hub rank far above any spoke
        df = spark.createDataFrame(
            [(i, 0) for i in range(1, 21)], "src int, dst int"
        )
        # fixed 25 iterations: residual ~0.85^25 is far below the 10x dominance margin
        ranks = {r.node: r.rank for r in pagerank(df, max_iter=25, tol=0.0).collect()}
        hub, spokes = ranks[0], [ranks[i] for i in range(1, 21)]
        assert hub > 10 * max(spokes)

    @pytest.mark.slow
    def test_undirected_symmetrizes(self, spark):
        # path a-b-c undirected: middle node most central
        df = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
        ranks = {
            r.node: r.rank
            for r in pagerank(df, undirected=True, max_iter=25, tol=0.0).collect()
        }
        assert ranks[2] > ranks[1] == pytest.approx(ranks[3], abs=1e-9)


class TestContract:
    def test_nonconvergent_budget_raises(self, spark):
        df = spark.createDataFrame([(1, 2), (2, 1), (3, 1)], "src int, dst int")
        with pytest.raises(RuntimeError, match="did not converge"):
            pagerank(df, max_iter=1, tol=1e-15)

    def test_fixed_iterations_when_tol_zero(self, spark):
        df = spark.createDataFrame([(1, 2), (2, 1)], "src int, dst int")
        ranks = pagerank(df, max_iter=3, tol=0.0)
        assert ranks.count() == 2

    def test_empty_edges(self, spark):
        df = spark.createDataFrame([], "src int, dst int")
        assert pagerank(df).count() == 0

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 2)], "src int, dst int")
        with pytest.raises(ValueError, match="damping"):
            pagerank(df, damping=1.0)
        with pytest.raises(ValueError, match="max_iter"):
            pagerank(df, max_iter=0)


class TestTextRank:
    @pytest.mark.slow
    def test_hub_word_outranks_frequency(self, spark):
        from document_clustering_with_hadoop_mapreduce_spark.operators.graph import (
            textrank_keywords,
        )

        # 'core' co-occurs with 12 DISTINCT partners (one doc each);
        # 'noise' repeats 40 times against a single partner. Frequency
        # ranks noise first; TextRank must rank core first.
        rows = [(i, f"core partner{i}") for i in range(12)]
        rows += [(100 + i, "noise buddy " * 1) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        top = [
            r.term
            for r in textrank_keywords(df, top_n=3, max_iter=90, tol=1e-4).collect()
        ]
        assert top[0] == "core"

    def test_real_corpus_returns_topn(self, spark, sf_dir):
        from document_clustering_with_hadoop_mapreduce_spark.operators.graph import (
            textrank_keywords,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
        out = textrank_keywords(docs, top_n=10, max_iter=90, tol=1e-3).collect()
        assert len(out) == 10
        assert all(r.rank > 0 for r in out)


def _hits_py(edges, iters=100, tol=1e-12):
    import math

    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    out: dict = {}
    inc: dict = {}
    for u, v in set(edges):
        out.setdefault(u, set()).add(v)
        inc.setdefault(v, set()).add(u)
    h = {v: 1.0 for v in nodes}
    a = {v: 1.0 for v in nodes}
    for _ in range(iters):
        na = {v: sum(h[u] for u in inc.get(v, ())) for v in nodes}
        z = math.sqrt(sum(x * x for x in na.values())) or 1.0
        na = {v: x / z for v, x in na.items()}
        nh = {u: sum(na[v] for v in out.get(u, ())) for u in nodes}
        z = math.sqrt(sum(x * x for x in nh.values())) or 1.0
        nh = {u: x / z for u, x in nh.items()}
        d = sum(abs(nh[v] - h[v]) + abs(na[v] - a[v]) for v in nodes)
        h, a = nh, na
        if d < tol:
            break
    return h, a


class TestHITS:
    @pytest.mark.slow
    def test_matches_pure_python_power_iteration(self, spark):
        import random

        from document_clustering_with_hadoop_mapreduce_spark.operators.graph import hits

        rng = random.Random(17)
        edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(150)})
        edges = [(u, v) for u, v in edges if u != v]
        df = spark.createDataFrame(edges, "src int, dst int")
        got = {r.node: (r.hub, r.authority) for r in hits(df, max_iter=40, tol=1e-6).collect()}
        h, a = _hits_py(edges)
        assert set(got) == set(h)
        for v in h:
            assert got[v][0] == pytest.approx(h[v], abs=1e-5), v
            assert got[v][1] == pytest.approx(a[v], abs=1e-5), v

    def test_directory_page_is_hub_reference_page_is_authority(self, spark):
        from document_clustering_with_hadoop_mapreduce_spark.operators.graph import hits

        # node 0 links to everything (directory); node 99 is linked by
        # everything (reference). Roles must separate.
        edges = [(0, i) for i in range(1, 10)] + [(i, 99) for i in range(1, 10)]
        df = spark.createDataFrame(edges, "src int, dst int")
        got = {r.node: r for r in hits(df, max_iter=60, tol=1e-8).collect()}
        assert got[0].hub == max(r.hub for r in got.values())
        assert got[99].authority == max(r.authority for r in got.values())
        assert got[0].authority < 1e-9 and got[99].hub < 1e-9

    def test_validation_and_empty(self, spark):
        from document_clustering_with_hadoop_mapreduce_spark.operators.graph import hits

        empty = spark.createDataFrame([], "src int, dst int")
        assert hits(empty).count() == 0
        df = spark.createDataFrame([(1, 2)], "src int, dst int")
        with pytest.raises(ValueError):
            hits(df, max_iter=0)


class TestLazyFixedUndirected:
    """Round 11: fixed-iteration + undirected runs as ONE fully-lazy
    composed plan (no counts, no checkpoints) — zero Spark jobs at call
    time, values bit-identical to the eager path."""

    @pytest.mark.slow
    def test_bit_identical_to_eager_on_presymmetrized_edges(self, spark):
        from pyspark.sql import functions as F

        from document_clustering_with_hadoop_mapreduce_spark.operators.graph import (
            pagerank,
        )

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1), (6, 6), (7, 3)],
            "src long, dst long",
        )
        lazy = sorted(
            tuple(r) for r in pagerank(edges, max_iter=5, tol=0.0, undirected=True).collect()
        )
        # manually symmetrized + undirected=False takes the EAGER path
        # (counts + per-round checkpoints) over the same logical graph —
        # the two must agree bit-for-bit, not just approximately
        sym = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        eager = sorted(
            tuple(r) for r in pagerank(sym, max_iter=5, tol=0.0, undirected=False).collect()
        )
        assert lazy and lazy == eager

    def test_call_runs_zero_jobs(self, spark):
        from document_clustering_with_hadoop_mapreduce_spark.operators.graph import (
            pagerank,
        )

        edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        edges.count()  # materialize the local frame's first pass
        tracker = spark.sparkContext.statusTracker()
        n0 = len(tracker.getJobIdsForGroup(None))
        pagerank(edges, max_iter=5, tol=0.0, undirected=True)
        assert len(tracker.getJobIdsForGroup(None)) == n0

    def test_empty_edge_list_yields_empty_frame(self, spark):
        from document_clustering_with_hadoop_mapreduce_spark.operators.graph import (
            pagerank,
        )

        empty = spark.createDataFrame([], "src long, dst long")
        out = pagerank(empty, max_iter=3, tol=0.0, undirected=True)
        assert out.columns == ["node", "rank"] and out.count() == 0

    def test_lsh_slot_construction_job_ceiling(self, spark, sf_dir):
        """The fused lsh_candidate_pairs slot used to run 46 jobs / ~11 s
        per plan construction (eager pagerank counts + AQE materializing
        every checkpoint's stages). With lazy pagerank + the plain AQE-on
        localCheckpoint(eager=False) pairs frame (round 13) construction
        is the LSH operator's internal cuts plus the one extra AQE
        stage-materialization job the ceiling absorbs."""
        from document_clustering_with_hadoop_mapreduce_spark.plans.registry import (
            all_queries,
        )

        q = all_queries()["lsh_candidate_pairs"].spark
        q(spark, sf_dir)  # prime
        tracker = spark.sparkContext.statusTracker()
        n0 = len(tracker.getJobIdsForGroup(None))
        q(spark, sf_dir)
        delta = len(tracker.getJobIdsForGroup(None)) - n0
        assert delta <= 8, (
            f"lsh_candidate_pairs construction ran {delta} jobs — eager "
            "derivation leaked back into plan-construction time"
        )
