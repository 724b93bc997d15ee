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
    # Norms are precomputed per input row BEFORE the join: inlined in
    # the per-pair cosine they would re-run the O(dim) aggregate() HOF
    # N×Q times per side instead of once per row (the expensive-
    # producer-in-single-consumer-column rule applied across a join).
    q = queries.select(
        F.col(key).alias("query_id"), F.col(vec).alias("qvec")
    ).withColumn("qn", _norm("qvec"))
    c = corpus.select(
        F.col(key).alias("neighbor_id"), F.col(vec).alias("cvec")
    ).withColumn("cn", _norm("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot("qvec", "cvec") / (F.col("qn") * F.col("cn")),
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
        term = F.when(d >= 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bits = term if bits is None else bits + term
    return bits.cast("long")


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
    ).withColumn("cn", _norm("cvec"))
    q = queries.select(
        F.col(key).alias("query_id"),
        F.col(vec).alias("qvec"),
        hyperplane_sign_bits(vec, planes).alias("bucket"),
    ).withColumn("qn", _norm("qvec"))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine", _dot("qvec", "cvec") / (F.col("qn") * F.col("cn"))
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means cells + nprobe search
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from collections.abc import Iterator  # noqa: E402
from pyspark.sql import types as T  # noqa: E402


def kmeans_centroids(
    emb: DataFrame,
    k: int = 16,
    iters: int = 10,
    sample_rows: int = 20_000,
    vec: str = "embedding",
    key: str = "vec_id",
    seed: int = 42,
) -> np.ndarray:
    """Driver-side deterministic k-means on a bounded sample.

    The codebook is tiny (k × dim floats) and is broadcast for
    assignment; training cost is bounded by ``sample_rows`` regardless
    of corpus size — the standard IVF recipe (train on a sample,
    assign everything). The sample is ``orderBy(key).limit(n)`` —
    a bare ``limit`` is nondeterministic across partitionings, which
    would make the codebook (and recall/cell skew) irreproducible.
    At cluster scale prefer a key-range/hash-bucket predicate over the
    global sort; at sample_rows ≤ 20k the TakeOrderedAndProject is
    cheap (no full sort materializes).
    """
    pdf = emb.select(key, vec).orderBy(key).limit(sample_rows).toPandas()
    X = np.vstack(pdf[vec].to_numpy()).astype(np.float64)
    # Guard zero vectors like _cell_assign_udf does: one all-zero
    # embedding in the sample would otherwise turn its row NaN, poison
    # whichever centroid argmax sends it to, and freeze that cell.
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    X = X / norms
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=min(k, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ cent.T
        assign = sims.argmax(axis=1)
        for j in range(len(cent)):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[j] = m / n
    return cent


def _cell_assign_udf(spark, centroids: np.ndarray, nprobe: int):
    """Vectorized cell assignment: one matmul per Arrow batch."""
    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def cells(vecs: pd.Series) -> pd.Series:
        cent = bc.value
        X = np.vstack(vecs.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (X / norms) @ cent.T
        top = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in top])

    return cells


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    key: str = "vec_id",
    vec: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 2,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: corpus vectors live in their nearest cell; each query
    probes its ``nprobe`` nearest cells and exact-scores only those
    members. The cross join becomes an equi-join on cell id, cutting
    scored pairs by ~n_cells/nprobe; recall is tested (not assumed)
    in pytest against the brute-force baseline.

    At 100 TB the cell assignment is one narrow matmul pass (Arrow
    batches), the codebook is broadcast, and the candidate join
    shuffles only by cell id — skew across cells is bounded by k-means
    balance, with AQE skew-split as the backstop.
    """
    spark = corpus.sparkSession
    if centroids is None:
        centroids = kmeans_centroids(corpus, k=n_cells, vec=vec, key=key)
    assign1 = _cell_assign_udf(spark, centroids, 1)
    assignp = _cell_assign_udf(spark, centroids, nprobe)

    c = corpus.select(
        F.col(key).alias("neighbor_id"),
        F.col(vec).alias("cvec"),
        F.element_at(assign1(F.col(vec)), 1).alias("cell"),
    ).withColumn("cn", _norm("cvec"))
    q = (
        queries.select(
            F.col(key).alias("query_id"),
            F.col(vec).alias("qvec"),
            assignp(F.col(vec)).alias("cells"),
        )
        .withColumn("qn", _norm("qvec"))  # before the explode: once per query
        .withColumn("cell", F.explode("cells"))
        .drop("cells")
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine", _dot("qvec", "cvec") / (F.col("qn") * F.col("cn"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    # No dedup needed before ranking: a corpus row lives in exactly ONE
    # cell (element_at(assign1, 1)) and a query's nprobe probed cells
    # are distinct argsort indices, so the equi-join emits each
    # (query_id, neighbor_id) pair at most once — a dropDuplicates here
    # was a pure extra hash exchange over every scored pair.
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )
