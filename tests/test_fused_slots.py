"""Invariant gates for the round-7 fused registry slots, beyond the
driver's hash parity: PageRank rows fused into lsh_candidate_pairs and
the BM25/RRF/metrics retrieval stack fused into tfidf_cosine_pairs.
These pin structural properties that must hold at ANY scale factor, so a
fixture regeneration can't silently degrade the slots into vacuous
results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.plans.registry import all_queries


@pytest.fixture(scope="module")
def lsh_fused(spark, sf_dir):
    return all_queries()["lsh_candidate_pairs"].spark(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def ret_fused(spark, sf_dir):
    return all_queries()["tfidf_cosine_pairs"].spark(spark, sf_dir).cache()


class TestLshPagerankFusion:
    def test_rank_rows_cover_exactly_the_pair_nodes(self, lsh_fused):
        pairs = lsh_fused.where(F.col("kind") == "pair")
        nodes = {
            r[0]
            for r in pairs.select("doc_a").union(pairs.select("doc_b")).distinct().collect()
        }
        ranked = {r["doc_a"] for r in lsh_fused.where(F.col("kind") == "rank").collect()}
        assert ranked == nodes

    def test_ranks_form_a_distribution(self, lsh_fused):
        ranks = lsh_fused.where(F.col("kind") == "rank")
        n = ranks.count()
        assert n > 0
        total = ranks.agg(F.sum("rank")).collect()[0][0]
        # 6dp-rounded per-node ranks: sum within n * 5e-7 of 1
        assert abs(total - 1.0) <= n * 5e-7 + 1e-6
        assert ranks.where(F.col("rank") <= 0).count() == 0

    @pytest.mark.slow
    def test_hub_outranks_leaf_on_a_star(self, spark):
        # centrality sanity on a constructed star: the hub of identical
        # boilerplate docs must hold the highest pagerank of its component
        from document_clustering_with_hadoop_mapreduce_spark.operators.graph import pagerank

        edges = spark.createDataFrame(
            [(0, d) for d in range(1, 9)], "src long, dst long"
        )
        got = {r["node"]: r["rank"] for r in pagerank(
            edges, max_iter=5, tol=0.0, undirected=True
        ).collect()}
        assert got[0] == max(got.values())


class TestRetrievalFusion:
    @pytest.mark.slow
    def test_all_kinds_present(self, ret_fused):
        kinds = {r["kind"] for r in ret_fused.select("kind").distinct().collect()}
        assert {"bm25", "rrf", "m_nrel", "m_recall", "m_mrr", "m_ndcg"} <= kinds

    def test_bm25_and_rrf_are_dense_topk_per_query(self, ret_fused):
        for kind in ("bm25", "rrf"):
            rows = ret_fused.where(F.col("kind") == kind).collect()
            per_q: dict[str, list[int]] = {}
            for r in rows:
                per_q.setdefault(r["query_id"], []).append(r["rank"])
            assert per_q
            for q, ranks in per_q.items():
                assert sorted(ranks) == list(range(1, len(ranks) + 1)), (kind, q)
                assert len(ranks) <= 10

    def test_rrf_top1_came_from_a_system_topk(self, ret_fused):
        # RRF only re-ranks union(bm25 top-k, tf top-k): its #1 per query
        # must at minimum appear somewhere in the fused BM25 rows OR have
        # been contributed by the tf system (not directly visible) — but a
        # doc ranked #1 by RRF with k=60 needs a strong rank in at least
        # one system; assert the weaker, exact property: every rrf doc
        # appears in some system's top-k, i.e. rrf docs ⊆ union of inputs.
        # bm25 rows are visible; tf rows are not, so check: every rrf doc
        # NOT in bm25's top-k still has a valid rank (structure), and at
        # least one rrf top-1 overlaps bm25's top-k (the systems agree
        # somewhere on this corpus).
        bm = {
            (r["query_id"], r["doc_id"])
            for r in ret_fused.where(F.col("kind") == "bm25").collect()
        }
        top1 = [
            (r["query_id"], r["doc_id"])
            for r in ret_fused.where((F.col("kind") == "rrf") & (F.col("rank") == 1)).collect()
        ]
        assert top1
        assert any(t in bm for t in top1)

    def test_metrics_bounded_and_consistent(self, ret_fused):
        mets: dict[str, dict[str, float]] = {}
        for r in ret_fused.where(F.col("kind").startswith("m_")).collect():
            mets.setdefault(r["query_id"], {})[r["kind"]] = r["score"]
        assert mets
        for q, m in mets.items():
            assert set(m) == {"m_nrel", "m_recall", "m_mrr", "m_ndcg"}, q
            assert m["m_nrel"] >= 1, q  # every derived query term has postings
            for k in ("m_recall", "m_mrr", "m_ndcg"):
                assert 0.0 <= m[k] <= 1.0, (q, k, m[k])
            # the fused list holds <= 10 docs, so recall <= 10 / n_rel
            # (+5e-7: recall_at_k is 6dp-rounded, possibly upward)
            assert m["m_recall"] <= min(1.0, 10.0 / m["m_nrel"]) + 5e-7, q

    def test_queries_are_one_per_lang(self, ret_fused, spark, sf_dir):
        langs = {
            r["lang"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("lang").distinct().collect()
        }
        bm_qs = {
            r["query_id"]
            for r in ret_fused.where(F.col("kind") == "bm25").select("query_id").distinct().collect()
        }
        assert bm_qs == langs


@pytest.fixture(scope="module")
def wn_fused(spark, sf_dir):
    return all_queries()["doc_fingerprints"].spark(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def cc_fused(spark, sf_dir):
    return all_queries()["dedup_components"].spark(spark, sf_dir).cache()


class TestWinnowFusion:
    """Round-8 fusion: winnow overlap pairs + spans riding doc_fingerprints."""

    def test_doc_rows_cover_the_corpus(self, wn_fused, spark, sf_dir):
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert wn_fused.where(F.col("kind") == "doc").count() == n_docs

    def test_pair_and_span_rows_agree(self, wn_fused):
        # spans are pairs + the hull columns: same (doc_a, doc_b, shared) set
        key = lambda k: {
            (r["id_a"], r["id_b"], r["n"])
            for r in wn_fused.where(F.col("kind") == k).collect()
        }
        pairs, spans = key("pair"), key("span")
        assert len(pairs) > 0  # fixture near-dups guarantee overlaps
        assert pairs == spans

    def test_span_hulls_are_ordered(self, wn_fused):
        bad = wn_fused.where(
            (F.col("kind") == "span")
            & ((F.col("a_start") > F.col("a_end")) | (F.col("b_start") > F.col("b_end"))
               | (F.col("a_start") < 1) | (F.col("b_start") < 1))
        )
        assert bad.count() == 0

    def test_pairs_are_ordered_and_min_shared(self, wn_fused):
        pairs = wn_fused.where(F.col("kind") == "pair")
        assert pairs.where(F.col("id_a") >= F.col("id_b")).count() == 0
        assert pairs.where(F.col("n") < 2).count() == 0


class TestComponentSplitFusion:
    """Round-8 fusion: leakage-safe split riding dedup_components."""

    def test_components_share_one_split(self, cc_fused):
        # THE leakage invariant: every member of a component draws the
        # same (bucket, split) — near-dups can never straddle train/test
        multi = (
            cc_fused.groupBy("component")
            .agg(F.count_distinct("split").alias("ns"), F.count_distinct("bucket").alias("nb"))
            .where((F.col("ns") > 1) | (F.col("nb") > 1))
        )
        assert multi.count() == 0

    def test_split_matches_bucket_thresholds(self, cc_fused):
        bad = cc_fused.where(
            ~(
                ((F.col("bucket") < 9000) & (F.col("split") == "train"))
                | ((F.col("bucket") >= 9000) & (F.col("bucket") < 9500) & (F.col("split") == "valid"))
                | ((F.col("bucket") >= 9500) & (F.col("split") == "test"))
            )
        )
        assert bad.count() == 0
        assert cc_fused.where((F.col("bucket") < 0) | (F.col("bucket") >= 10000)).count() == 0

    def test_singletons_match_plain_hash_split(self, cc_fused, spark, sf_dir):
        # docs that are their own component must draw exactly the
        # hash_split bucket (same salt, key = own id)
        base = {
            r["doc_id"]: (r["bucket"], r["split"])
            for r in all_queries()["hash_split"].spark(spark, sf_dir).collect()
        }
        singles = cc_fused.where(F.col("component") == F.col("doc_id")).collect()
        assert len(singles) > 0
        for r in singles:
            assert base[r["doc_id"]] == (r["bucket"], r["split"]), r["doc_id"]


@pytest.fixture(scope="module")
def ua_fused(spark, sf_dir):
    return all_queries()["user_activity"].spark(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def lang_fused(spark, sf_dir):
    return all_queries()["language_id"].spark(spark, sf_dir).cache()


class TestRetentionFusion:
    """Round-8 fusion: weekly cohort retention riding user_activity."""

    def test_user_rows_cover_all_users(self, ua_fused, spark, sf_dir):
        n = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("user_id").distinct().count()
        )
        assert ua_fused.where(F.col("kind") == "user").count() == n

    def test_week_zero_retention_is_one(self, ua_fused):
        rows = ua_fused.where(F.col("kind") == "retention")
        assert rows.count() > 0
        assert rows.where((F.col("weeks_since") == 0) & (F.col("v") != 1.0)).count() == 0

    def test_retention_bounded_and_monotone_cohorts(self, ua_fused):
        rows = ua_fused.where(F.col("kind") == "retention")
        assert rows.where((F.col("v") < 0) | (F.col("v") > 1)).count() == 0
        # every later-week count is <= the cohort's week-0 count
        bad = (
            rows.groupBy("cohort_week")
            .agg(
                F.max(F.when(F.col("weeks_since") == 0, F.col("n"))).alias("size0"),
                F.max(F.when(F.col("weeks_since") > 0, F.col("n"))).alias("later_max"),
            )
            .where(F.col("later_max") > F.col("size0"))
        )
        assert bad.count() == 0


class TestBigramLmFusion:
    """Round-8 fusion: self-trained bigram-LM score riding language_id."""

    def test_lang_rows_cover_the_corpus(self, lang_fused, spark, sf_dir):
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert lang_fused.where(F.col("kind") == "lang").count() == n_docs

    def test_lm_scores_positive_and_docs_subset(self, lang_fused):
        lm = lang_fused.where(F.col("kind") == "lm")
        assert lm.count() > 0
        # self-trained: every probability < 1 -> cross-entropy > 0
        assert lm.where(F.col("v") <= 0).count() == 0
        assert lm.where(F.col("n") < 1).count() == 0
        lang_ids = {r["doc_id"] for r in lang_fused.where(F.col("kind") == "lang").select("doc_id").collect()}
        lm_ids = {r["doc_id"] for r in lm.select("doc_id").collect()}
        assert lm_ids <= lang_ids


class TestMixtureFusion:
    """Round-8 fusion: token-budget mixing planner riding stratified_sample."""

    @pytest.fixture(scope="class")
    def mix_fused(self, spark, sf_dir):
        return all_queries()["stratified_sample"].spark(spark, sf_dir).cache()

    def test_rate_rows_cover_all_strata(self, mix_fused, spark, sf_dir):
        langs = {
            r["lang"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("lang").distinct().collect()
        }
        strata = {
            r["stratum"]
            for r in mix_fused.where(F.col("kind") == "rate").collect()
        }
        assert strata == langs

    def test_rates_bounded_and_budget_semantics(self, mix_fused):
        rates = mix_fused.where(F.col("kind") == "rate")
        assert rates.where((F.col("rate") <= 0) | (F.col("rate") > 1)).count() == 0
        # no-budget strata keep everything
        assert rates.where(F.col("budget_tokens").isNull() & (F.col("rate") != 1.0)).count() == 0

    def test_budget_docs_hit_budget_in_expectation(self, mix_fused, spark, sf_dir):
        from document_clustering_with_hadoop_mapreduce_spark.functions.text import token_count
        from document_clustering_with_hadoop_mapreduce_spark.plans.queries_events import (
            _MIX_BUDGETS,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        kept_ids = {
            r["doc_id"]
            for r in mix_fused.where(F.col("kind") == "budget_doc").select("doc_id").collect()
        }
        kept = docs.where(F.col("doc_id").isin(list(kept_ids)))
        got = {
            r["lang"]: r["m"]
            for r in kept.groupBy("lang")
            .agg(F.sum(token_count(F.col("text"))).alias("m"))
            .collect()
        }
        for lang, budget in _MIX_BUDGETS.items():
            if lang in got:
                # expectation-level check: within 3x of the budget (hash
                # sampling variance at small strata), never wildly over
                assert got[lang] <= 3 * budget, (lang, got[lang], budget)


class TestBpeFusion:
    """Round-10 fusion: the trained BPE merge table (kind='merge') and the
    learned-tokenizer per-doc counts (n_bpe_learned on kind='doc' rows)
    inside the doc_quality slot."""

    @pytest.fixture(scope="class")
    def dq_fused(self, spark, sf_dir):
        df = all_queries()["doc_quality"].spark(spark, sf_dir).cache()
        yield df
        # unpersist so later plan-shape tests don't match the cached
        # InMemoryRelation instead of the real plan
        df.unpersist()

    def test_doc_rows_cover_the_corpus(self, dq_fused, spark, sf_dir):
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert dq_fused.where(F.col("kind") == "doc").count() == n_docs

    def test_merge_rows_are_a_dense_ordered_table(self, dq_fused):
        from document_clustering_with_hadoop_mapreduce_spark.plans.queries_events import (
            _BPE_MERGES,
        )

        merges = (
            dq_fused.where(F.col("kind") == "merge")
            .select("merge_rank", "a", "b")
            .collect()
        )
        ranks = sorted(r["merge_rank"] for r in merges)
        # dense 0..k-1 (k == _BPE_MERGES unless the corpus ran dry early)
        assert ranks == list(range(len(ranks)))
        assert len(ranks) <= _BPE_MERGES
        for r in merges:
            assert r["a"] and r["b"], r

    def test_merge_rows_match_direct_training(self, dq_fused, spark, sf_dir):
        from document_clustering_with_hadoop_mapreduce_spark.operators.bpe import (
            bpe_train,
            word_counts,
        )
        from document_clustering_with_hadoop_mapreduce_spark.plans.queries_events import (
            _BPE_MERGES,
            _BPE_MIN_FREQ,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        expect = bpe_train(
            word_counts(docs), num_merges=_BPE_MERGES, min_frequency=_BPE_MIN_FREQ
        )
        got = {
            r["merge_rank"]: (r["a"], r["b"])
            for r in dq_fused.where(F.col("kind") == "merge").collect()
        }
        assert got == dict(enumerate(expect))

    def test_learned_counts_match_pure_python_encode(self, dq_fused, spark, sf_dir):
        """Spot-check n_bpe_learned against a driver-side re-encode of the
        doc's tokens with the trained ranks (the non-distributed oracle)."""
        from document_clustering_with_hadoop_mapreduce_spark.operators.bpe import encode_word
        from document_clustering_with_hadoop_mapreduce_spark.functions.text import (
            CLEAN_RE_SPARK,
        )
        import re

        ranks = {
            (r["a"], r["b"]): r["merge_rank"]
            for r in dq_fused.where(F.col("kind") == "merge").collect()
        }
        rows = (
            dq_fused.where(F.col("kind") == "doc")
            .select("doc_id", "n_bpe_learned")
            .limit(50)
            .collect()
        )
        texts = {
            r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where(F.col("doc_id").isin([r["doc_id"] for r in rows]))
            .collect()
        }
        clean = re.compile(CLEAN_RE_SPARK)
        for r in rows:
            toks = [t for t in re.split(r"[ \t\n\r]+", clean.sub("", texts[r["doc_id"]].lower())) if t]
            expect = sum(len(encode_word(w, ranks)) for w in toks)
            assert r["n_bpe_learned"] == expect, r["doc_id"]


class TestSplitPackFusion:
    """Round-10 fusion: sequence packing columns on the hash_split slot —
    structural invariants that must hold at ANY scale factor."""

    @pytest.fixture(scope="class")
    def sp_fused(self, spark, sf_dir):
        df = all_queries()["hash_split"].spark(spark, sf_dir).cache()
        yield df
        # unpersist so the plan-shape pin on this slot sees the real plan,
        # not an InMemoryTableScan over this fixture's cache
        df.unpersist()

    def test_one_row_per_doc(self, sp_fused, spark, sf_dir):
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert sp_fused.count() == n_docs
        assert sp_fused.select("doc_id").distinct().count() == n_docs

    def test_pack_positions_are_a_prefix_sum(self, sp_fused):
        from document_clustering_with_hadoop_mapreduce_spark.plans.queries_events import (
            _PACK_MAX_TOKENS,
        )

        rows = sp_fused.select(
            "doc_id", "stream", "seq", "seq_id", "offset", "global_start", "n_tokens"
        ).collect()
        by_stream: dict[int, list] = {}
        for r in rows:
            by_stream.setdefault(r["stream"], []).append(r)
        for stream, members in by_stream.items():
            members.sort(key=lambda r: r["doc_id"])
            cum = 0
            for r in members:
                # the packed position IS the running token sum in doc_id order
                assert r["global_start"] == cum, (stream, r["doc_id"])
                assert r["seq"] == cum // _PACK_MAX_TOKENS
                assert r["offset"] == cum % _PACK_MAX_TOKENS
                assert r["seq_id"] == r["stream"] * (1 << 32) + r["seq"]
                assert r["n_tokens"] >= 0
                cum += r["n_tokens"]

    def test_split_matches_standalone_operator(self, sp_fused, spark, sf_dir):
        from document_clustering_with_hadoop_mapreduce_spark.operators.textstats import (
            hash_split,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        base = {r["doc_id"]: (r["bucket"], r["split"]) for r in hash_split(docs).collect()}
        for r in sp_fused.select("doc_id", "bucket", "split").collect():
            assert base[r["doc_id"]] == (r["bucket"], r["split"]), r["doc_id"]


class TestHardNegativeFusion:
    """Round-11 fusion: kind='hardneg' rows on embedding_top_pairs must be
    exactly mine_hard_negatives over the slot's declared positives (each
    anchor's exact top-1 neighbor), and the anti join must provably bite:
    no anchor's positive may appear among its negatives."""

    @pytest.fixture(scope="class")
    def etp_fused(self, spark, sf_dir):
        df = all_queries()["embedding_top_pairs"].spark(spark, sf_dir).cache()
        yield df
        df.unpersist()

    @pytest.mark.slow
    def test_hardneg_slice_matches_standalone(self, etp_fused, spark, sf_dir):
        from document_clustering_with_hadoop_mapreduce_spark.operators.similarity import (
            cosine_topk,
            mine_hard_negatives,
        )
        from document_clustering_with_hadoop_mapreduce_spark.plans.queries_similarity import (
            HN_ANCHORS,
            HN_NEG,
            HN_SEARCH_K,
        )
        from document_clustering_with_hadoop_mapreduce_spark.sources.tables import (
            load_table,
        )

        got = sorted(
            (r["id_a"], r["id_b"], r["value"])
            for r in etp_fused.collect()
            if r["kind"] == "hardneg"
        )
        emb = load_table(spark, sf_dir, "embeddings")
        positives = cosine_topk(
            emb, emb.filter(F.col("vec_id") < HN_ANCHORS), k=1
        ).select(
            F.col("query_id").alias("anchor_id"),
            F.col("vec_id").alias("positive_id"),
        )
        expect = sorted(
            (r["anchor_id"], r["negative_id"], r["cos"])
            for r in mine_hard_negatives(
                positives, emb, n_neg=HN_NEG, search_k=HN_SEARCH_K
            ).collect()
        )
        assert got and got == expect

    def test_positives_never_appear_as_negatives(self, etp_fused, spark, sf_dir):
        from document_clustering_with_hadoop_mapreduce_spark.operators.similarity import (
            cosine_topk,
        )
        from document_clustering_with_hadoop_mapreduce_spark.plans.queries_similarity import (
            HN_ANCHORS,
        )
        from document_clustering_with_hadoop_mapreduce_spark.sources.tables import (
            load_table,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        pos = {
            (r["query_id"], r["vec_id"])
            for r in cosine_topk(
                emb, emb.filter(F.col("vec_id") < HN_ANCHORS), k=1
            ).collect()
        }
        negs = {
            (r["id_a"], r["id_b"])
            for r in etp_fused.collect()
            if r["kind"] == "hardneg"
        }
        # the top-1 neighbor is by construction the hardest candidate, so
        # without the anti join it WOULD rank first — its absence is the
        # fusion's load-bearing check
        assert negs and not (pos & negs)


class TestHardNegConstructionCost:
    def test_construction_runs_only_the_bounded_probe_collects(self, spark, sf_dir):
        """Round-11 follow-up to the VERDICT-r10-#1 class: constructing
        the embedding_top_pairs plan must NOT execute the positives
        frame's corpus-scan lineage (the operator's anchor-derivation
        counts + probe collect used to re-run it ~4x -> 13 jobs per
        construction; with anchor_vectors forwarded it is exactly the
        two contract-bounded 8-row probe collects)."""
        q = all_queries()["embedding_top_pairs"].spark
        q(spark, sf_dir)  # prime imports / footer reads
        tracker = spark.sparkContext.statusTracker()
        n0 = len(tracker.getJobIdsForGroup(None))
        q(spark, sf_dir)
        delta = len(tracker.getJobIdsForGroup(None)) - n0
        # 2 bounded collects (positives' anchors + hardneg probes); allow
        # AQE splitting each into at most 2 stages-as-jobs
        assert delta <= 4, (
            f"embedding_top_pairs plan construction ran {delta} jobs — "
            "the positives lineage leaked back into construction time"
        )
