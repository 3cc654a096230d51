"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of the (small) query
set against the corpus, dot products computed JVM-side with higher-order
array functions, top-k via a per-query window. At 100 TB the corpus side
stays partition-parallel, queries are broadcast, and the only shuffle is
the final per-query top-k (tiny).

Scale path: LSH bucketing via SimHash-style random hyperplanes — corpus
vectors are bucketed once (a narrow map), queries probe matching buckets,
so the candidate set shrinks by ~2^bits. An IVF variant (k-means coarse
quantizer) would slot into the same two-stage shape.

Determinism: parallel double summation is order-dependent; for
oracle-comparable scores each product is quantized to decimal(38,12) and
summed exactly, then the cosine is computed in double — identical bits on
any engine. At pure-production scale, drop the decimal cast and keep
double sums (same plan, marginally faster).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ACC = "decimal(38,12)"


def random_hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH. The same literal
    plane values are inlined on both the Spark and oracle side, so bucket
    assignments agree bit-for-bit across engines."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _exact_dot(a, b):
    """Order-independent dot product of two float arrays, as double."""
    prods = F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(ACC))
    # re-cast inside the fold: decimal addition widens 38,12 → 38,11
    return F.aggregate(
        prods, F.lit(0).cast(ACC), lambda acc, p: (acc + p).cast(ACC)
    ).cast("double")


def _exact_norm2(a):
    return _exact_dot(a, a)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force cosine top-k: (query_id, neighbor_id, rank, cos).

    ``queries`` must have columns (query_id_col, vec_col). Self-matches
    (same id) are excluded. Ties rank deterministically by neighbor id.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qv"),
        _exact_norm2(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        _exact_norm2(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col, "neighbor_id",
            (_exact_dot(F.col("_qv"), F.col("_cv"))
             / F.sqrt(F.col("_qn") * F.col("_cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )


def hyperplane_bucket(df: DataFrame, planes: list[list[float]],
                      vec_col: str = "embedding") -> DataFrame:
    """Add an LSH bucket id: sign pattern of dot products with fixed
    hyperplanes (pass the same ``planes`` for corpus and queries).
    Narrow op — no shuffle; bucket the corpus once, reuse across queries.
    """
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(0)
    return df.withColumn("bucket", bucket.cast("int"))


def embedding_neardup_pairs(
    corpus: DataFrame,
    planes: list[list[float]],
    threshold: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= threshold)
    with hyperplane-bucket blocking: pairs are only formed inside a bucket,
    so cost is sum(|bucket|^2) instead of |corpus|^2. Approximate by
    construction (cross-bucket near-dups are missed); more planes → smaller
    buckets → cheaper and lower recall. The bucket equi-join is the only
    shuffle."""
    c = hyperplane_bucket(corpus, planes, vec_col)
    a = c.select(
        "bucket", F.col(id_col).alias("id_a"), F.col(vec_col).alias("_av"),
        _exact_norm2(F.col(vec_col)).alias("_an"),
    )
    b = c.select(
        "bucket", F.col(id_col).alias("id_b"), F.col(vec_col).alias("_bv"),
        _exact_norm2(F.col(vec_col)).alias("_bn"),
    )
    cos = _exact_dot(F.col("_av"), F.col("_bv")) / F.sqrt(F.col("_an") * F.col("_bn"))
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("_cos"))
        .where(F.col("_cos") >= threshold)
        .select("id_a", "id_b", F.round("_cos", 6).alias("cos"))
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN top-k probing only the query's hyperplane bucket (approximate:
    recall < 1; multiply buckets/probes for higher recall)."""
    c = hyperplane_bucket(corpus, planes, vec_col)
    q = hyperplane_bucket(queries, planes, vec_col).withColumnRenamed("bucket", "qbucket")
    qq = q.select(
        F.col(query_id_col), F.col("qbucket"), F.col(vec_col).alias("_qv"),
        _exact_norm2(F.col(vec_col)).alias("_qn"),
    )
    cc = c.select(
        "bucket", F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        _exact_norm2(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        cc.join(F.broadcast(qq), cc["bucket"] == qq["qbucket"])
        .where(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col, "neighbor_id",
            (_exact_dot(F.col("_qv"), F.col("_cv"))
             / F.sqrt(F.col("_qn") * F.col("_cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", F.round("cos", 6).alias("cos"))
    )
