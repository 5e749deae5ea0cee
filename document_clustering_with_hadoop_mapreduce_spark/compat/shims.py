"""Reference bug-compat shims (SURVEY.md §2.7).

- ``clean_text_ref``  — P2's exact charset strip (only `~!@#$%^&*()-+[]"':.,<>`
  removed, then lowercase), vs. the engine default that strips all
  non-alphanumerics. Needed for byte-exact golden parity with task 1.1.
- ``n3_similarity``   — the reference's "cosine": dot(a,b)/(|a|+|b|) — SUM of
  norms, not product (ref sources/2.2/source/KMeansMapper.java:39-56). Not
  scale-invariant; kept only to mirror 2.2/2.3 assignment behavior.
- ``assign_nearest_n3`` — argmax assignment under N3 similarity.

N1 (doc-keyed "idf") lives in ``operators.tfidf(compat_n1=True)``;
O1 (string-sorted output) and N6 (dims-line leak) live in ``sources.mtx``.
All are pure column expressions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# exact charset from ref sources/1.1/source/task1_1.java:75-81
REF_SPECIAL_CHARS = "~!@#$%^&*()\\-+\\[\\]\"':.,<>"


def clean_text_ref(col: Column) -> Column:
    """P2 bug-compat: strip ONLY the reference's punctuation set, lowercase.
    Leaves ;?/{}| etc. in place, exactly like the reference."""
    return F.lower(F.regexp_replace(col, f"[{REF_SPECIAL_CHARS}]", ""))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def n3_similarity(a: Column, b: Column) -> Column:
    """N3: dot(a,b) / (|a| + |b|); -9999 sentinel when both norms are zero
    (the reference also uses the sentinel for length mismatches, which a
    typed array column makes impossible)."""
    d = _norm(a) + _norm(b)
    return F.when(d == 0.0, F.lit(-9999.0)).otherwise(_dot(a, b) / d)


def assign_nearest_n3(
    df: DataFrame, centroids: list[list[float]], features_col: str = "embedding"
) -> DataFrame:
    """2.2/2.3 bug-compat assignment: argmax of N3 similarity, lowest
    centroid id wins ties (the reference keeps the first max,
    ref sources/2.2/source/KMeansMapper.java:95-104)."""
    vec = F.transform(F.col(features_col), lambda x: x.cast("double"))
    sims = []
    for cid, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(v)) for v in c])
        # max struct comparison: higher sim wins, then LOWER cid — negate id
        sims.append(
            F.struct(
                n3_similarity(vec, lit).alias("s"), F.lit(-cid).alias("neg_cid")
            )
        )
    best = F.array_max(F.array(*sims))
    return df.withColumn("cluster", -best["neg_cid"]).withColumn(
        "similarity", best["s"]
    )
