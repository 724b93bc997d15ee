"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the correctness baseline; LSH
(random-hyperplane) bucketing as the scale path. Dot products run as
JVM-side higher-order functions (``zip_with`` + ``aggregate``) —
no Python in the hot path.

At cluster scale the query side is broadcast (top-k against a bounded
query set); the corpus side streams. For all-pairs workloads use the
LSH variant: candidate generation is a bucket equi-join instead of a
cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> F.Column:
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: str) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.col(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    key: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: broadcast queries × corpus scan.

    Output: (query_id, neighbor_id, cosine, rank). Ties broken by
    neighbor id for determinism.
    """
    q = queries.select(
        F.col(key).alias("query_id"), F.col(vec).alias("qvec")
    )
    c = corpus.select(F.col(key).alias("neighbor_id"), F.col(vec).alias("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot("qvec", "cvec") / (_norm("qvec") * _norm("cvec")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )


def hyperplane_sign_bits(vec: str, planes: list[list[float]]) -> F.Column:
    """LSH signature: bit j = sign of <v, plane_j> (deterministic planes)."""
    bits = None
    for j, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        d = F.aggregate(
            F.zip_with(F.col(vec), arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        term = F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bits = term if bits is None else bits + term
    return bits.cast("int")


def lsh_planes(dim: int, nbits: int = 8) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG in [-1, 1])."""
    planes = []
    s = 42
    for _ in range(nbits):
        row = []
        for _ in range(dim):
            s = (s * 6364136223846793005 + 1442695040888963407) % (2**63)
            row.append((s % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    key: str = "vec_id",
    vec: str = "embedding",
    nbits: int = 8,
    dim: int = 64,
) -> DataFrame:
    """IVF/LSH-bucketed ANN: exact search within matching sign buckets.

    Recall < 1 by construction (approximate); candidates are restricted
    to the query's bucket, turning the cross join into an equi-join.
    """
    planes = lsh_planes(dim, nbits)
    c = corpus.select(
        F.col(key).alias("neighbor_id"),
        F.col(vec).alias("cvec"),
        hyperplane_sign_bits(vec, planes).alias("bucket"),
    )
    q = queries.select(
        F.col(key).alias("query_id"),
        F.col(vec).alias("qvec"),
        hyperplane_sign_bits(vec, planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine", _dot("qvec", "cvec") / (_norm("qvec") * _norm("cvec"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )
