"""Clustering invariants (SURVEY.md §5 item 4) — randomness-proof checks
the reference never had: nearest-assignment consistency, WCSS monotonicity,
seeded reproducibility, label agreement."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from document_clustering_with_hadoop_mapreduce_spark.operators.kmeans import (
    assign_nearest,
    lloyd_kmeans,
    mllib_kmeans,
)
from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table


def test_assign_nearest_is_argmin(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    init = emb.filter(F.col("vec_id") < 3).orderBy("vec_id").collect()
    centroids = [[float(x) for x in r["embedding"]] for r in init]
    out = assign_nearest(emb, centroids, "embedding", round_decimals=None)
    # recompute distances to every centroid; assigned must be the min
    rows = out.collect()
    for r in rows[:50]:
        v = [float(x) for x in r["embedding"]]
        dists = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in centroids]
        assert r["cluster"] == dists.index(min(dists))
        assert abs(r["dist_sq"] - min(dists)) < 1e-9


def test_lloyd_wcss_non_increasing(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    _, _, trace = lloyd_kmeans(emb, k=4, max_iter=6)
    wcss = [t.wcss for t in trace]
    assert len(wcss) >= 2
    for a, b in zip(wcss, wcss[1:]):
        assert b <= a + 1e-6, f"WCSS increased: {wcss}"


def test_lloyd_assignments_match_final_centroids(spark, sf_dir):
    """On a max_iter exit the returned assignments must be re-derived from
    the FINAL centroids (not one update stale) — MLlib's contract."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.kmeans import assign_nearest

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids, _ = lloyd_kmeans(emb, k=3, max_iter=3)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    feats = emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    want = {
        r["vec_id"]: r["cluster"]
        for r in assign_nearest(feats, centroids, round_decimals=None).collect()
    }
    assert got == want


def test_mllib_kmeans_seeded_reproducible(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    _, a1 = mllib_kmeans(emb, k=5, seed=42)
    _, a2 = mllib_kmeans(emb, k=5, seed=42)
    d1 = {r["vec_id"]: r["cluster"] for r in a1.select("vec_id", "cluster").collect()}
    d2 = {r["vec_id"]: r["cluster"] for r in a2.select("vec_id", "cluster").collect()}
    assert d1 == d2
    assert len(set(d1.values())) == 5


def test_mllib_assignment_is_nearest_final_centroid(spark, sf_dir):
    """After Lloyd converges, every point sits in the cluster of its nearest
    final center (SURVEY.md §5 item 4 — the invariant the reference's
    unseeded runs could never assert). NOTE: the synthetic embeddings are
    near-isotropic noise (labels don't correspond to geometric clusters),
    so label-recovery is NOT a valid check here; geometry invariants are."""
    emb = load_table(spark, sf_dir, "embeddings")
    model, assigned = mllib_kmeans(emb, k=5, seed=42, max_iter=50)
    centers = [list(map(float, c)) for c in model.clusterCenters()]
    for r in assigned.select("embedding", "cluster").collect()[:100]:
        v = [float(x) for x in r["embedding"]]
        dists = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in centers]
        assert r["cluster"] == dists.index(min(dists))


@pytest.mark.slow
def test_scalable_init_deterministic_and_bahmani_shaped(spark, sf_dir):
    """Deterministic k-means|| (M3/A15/M1): two runs select byte-identical
    candidate sets (hash-Bernoulli draws, no RNG), the top-k come back
    ordered by seed id with positive nearest-point weights, and the
    oversampling actually oversamples (more candidates than k see the
    weight step — the property the reference's l*d/psi loop exists for,
    ref sources/2.2/source/ScalableKMeans.java:86-156)."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.kmeans import (
        scalable_kmeans_init,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    cents1, w1 = scalable_kmeans_init(emb, k=5, l=10.0, rounds=3)
    cents2, w2 = scalable_kmeans_init(emb, k=5, l=10.0, rounds=3)
    assert [(i, v) for i, v in cents1] == [(i, v) for i, v in cents2]
    assert w1 == w2
    assert len(cents1) == 5
    ids = [i for i, _ in cents1]
    assert ids == sorted(ids)
    assert set(w1) == set(ids)
    # weights are nearest-point counts over ALL candidates -> each chosen
    # seed holds at least itself, and the total is at most n
    assert all(w >= 1 for w in w1.values())
    assert sum(w1.values()) <= n
    # one assignment pass under the chosen centroids covers every point
    assigned = assign_nearest(emb, [v for _, v in cents1], "embedding", round_decimals=6)
    sizes = {r["cluster"]: r["n"] for r in
             assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(sizes.values()) == n


def test_n3_similarity_compat(spark):
    """N3 shim: dot/(|a|+|b|) — verified against hand math, including the
    reference's first-max-wins tie behavior."""
    from document_clustering_with_hadoop_mapreduce_spark.compat import assign_nearest_n3, n3_similarity

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 2.0]), (3, [3.0, 4.0])],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]
    out = {r["vec_id"]: (r["cluster"], r["similarity"])
           for r in assign_nearest_n3(df, cents).collect()}
    # doc1 vs c0: dot=1, |a|=1, |b|=1 -> 0.5 ; vs c1: dot=0 -> 0.0
    assert out[1][0] == 0 and abs(out[1][1] - 0.5) < 1e-12
    # doc2 vs c0: 0 ; vs c1: 2/(2+1) = 0.6667
    assert out[2][0] == 1 and abs(out[2][1] - 2 / 3) < 1e-12
    # doc3 (3,4): c0 3/6=0.5, c1 4/6=0.6667 -> cluster 1
    assert out[3][0] == 1
    # sentinel fires only when BOTH norms are zero
    # (ref sources/2.2/source/KMeansMapper.java:52-54)
    zz = spark.range(1).select(
        n3_similarity(F.array(F.lit(0.0), F.lit(0.0)),
                      F.array(F.lit(0.0), F.lit(0.0))).alias("s")
    ).collect()[0]["s"]
    assert zz == -9999.0
    # zero vector vs non-zero centroid: 0/(0+|b|) = 0.0, no sentinel
    z = spark.createDataFrame([(9, [0.0, 0.0])], "vec_id INT, embedding ARRAY<DOUBLE>")
    rz = assign_nearest_n3(z, cents).collect()[0]
    assert rz["cluster"] == 0 and rz["similarity"] == 0.0

    # scale-variance: true cosine is invariant under scaling, N3 is NOT —
    # the defect SURVEY.md §2.7-N3 documents
    a = [1.0, 1.0]
    sim1 = spark.range(1).select(
        n3_similarity(F.array(*[F.lit(x) for x in a]),
                      F.array(*[F.lit(x) for x in a])).alias("s")
    ).collect()[0]["s"]
    sim2 = spark.range(1).select(
        n3_similarity(F.array(*[F.lit(2 * x) for x in a]),
                      F.array(*[F.lit(2 * x) for x in a])).alias("s")
    ).collect()[0]["s"]
    assert abs(sim1 - sim2) > 1e-6


def test_random_dense_init_matches_pure_python_oracle():
    """M2 parity: the deterministic dense init is a pure function of
    (seed, j, t) — reproduce it independently with hashlib and compare
    every cell; draws are uniform [0,1) rounded to 3dp like the
    reference's DecimalFormat output."""
    import hashlib

    from document_clustering_with_hadoop_mapreduce_spark.operators.kmeans import random_dense_init

    got = random_dense_init(k=4, dim=7, seed=11)
    assert len(got) == 4 and all(len(r) == 7 for r in got)
    for j in range(4):
        for t in range(7):
            h = int(hashlib.md5(f"11:{j}:{t}".encode()).hexdigest()[:15], 16)
            assert got[j][t] == round(h / float(1 << 60), 3)
            assert 0.0 <= got[j][t] < 1.0
    # deterministic across calls, sensitive to the seed
    assert got == random_dense_init(k=4, dim=7, seed=11)
    assert got != random_dense_init(k=4, dim=7, seed=12)


def test_lloyd_accepts_dense_random_init(spark, sf_dir):
    """lloyd_kmeans(init_centroids=random_dense_init(...)) runs the full
    traced loop from the M2-style matrix: WCSS non-increasing, k clusters
    labeled from the given matrix's row indices."""
    from document_clustering_with_hadoop_mapreduce_spark.operators.kmeans import (
        lloyd_kmeans,
        random_dense_init,
    )
    from document_clustering_with_hadoop_mapreduce_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    init = random_dense_init(k=3, dim=dim, seed=42)
    assigned, cents, trace = lloyd_kmeans(emb, k=3, max_iter=4, init_centroids=init)
    assert len(cents) == 3
    wcss = [t.wcss for t in trace]
    assert all(b <= a * (1 + 1e-9) for a, b in zip(wcss, wcss[1:]))
    assert assigned.select("cluster").distinct().count() <= 3
    # wrong-dim init (stale dim) fails loudly at entry, not mid-plan
    import pytest

    with pytest.raises(ValueError, match="dimension"):
        lloyd_kmeans(emb, k=3, init_centroids=random_dense_init(k=3, dim=dim + 1, seed=42))
    with pytest.raises(ValueError, match="inconsistent"):
        lloyd_kmeans(emb, k=2, init_centroids=[[0.0] * dim, [0.0] * (dim - 1)])


def test_assign_nearest_arrow_magnitude_guard(spark):
    """Round-9 advisor fix: the Arrow assigner's HALF_UP emulation
    floor(d2*1e6+0.5) is exact only while d2*1e6 < 2^52 (at odd integers
    in [2^52, 2^53) the +0.5 rounds half-to-even up — verified
    numerically); past the bound it RAISES (pointing at
    round_decimals=None) instead of silently diverging from
    assign_nearest's decimal F.round tie-breaks."""
    import pytest

    from document_clustering_with_hadoop_mapreduce_spark.operators.kmeans import (
        assign_nearest_arrow,
    )

    big = 4.0e9  # d2 ~ 1.6e19 -> d2*1e6 far past even 2^53
    df = spark.createDataFrame(
        [(1, [big, 0.0]), (2, [0.0, 0.0])], "vec_id int, embedding array<double>"
    )
    cents = [[0.0, 0.0], [1.0, 1.0]]
    with pytest.raises(Exception, match="round_decimals=None"):
        assign_nearest_arrow(df, cents).collect()
    # the divergence WINDOW itself: d2*1e6 ~ 5.0e15 sits in [2^52, 2^53),
    # where the old 2^53 threshold would NOT have raised — pins the bound
    mid = 70711.0  # d2 ~ 5.0e9
    df_mid = spark.createDataFrame(
        [(1, [mid, 0.0]), (2, [0.0, 0.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(Exception, match="round_decimals=None"):
        assign_nearest_arrow(df_mid, cents).collect()
    # a corrupt NaN embedding must raise too (NaN >= bound is False, so the
    # guard has an explicit isnan arm), not silently argmin to cluster 0
    df_nan = spark.createDataFrame(
        [(1, [float("nan"), 0.0]), (2, [0.0, 0.0])],
        "vec_id int, embedding array<double>",
    )
    with pytest.raises(Exception, match="non-finite"):
        assign_nearest_arrow(df_nan, cents).collect()
    # the documented escape hatch: exact unrounded distances still assign
    got = {
        r["vec_id"]: r["cluster"]
        for r in assign_nearest_arrow(df, cents, round_decimals=None).collect()
    }
    assert got == {1: 1, 2: 0}
