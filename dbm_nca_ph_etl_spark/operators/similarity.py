"""Similarity search over embedding columns (north-star extension).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the
  (small) query set against the corpus, dot-product via array HOFs
  (JVM-side, codegen), rank with a per-query window. The correctness
  baseline and the right plan whenever |queries| is small: one
  broadcast, one shuffle (the window's partitionBy query_id).
- :func:`lsh_bucket_topk` — the scale path: random-hyperplane LSH
  (sign-of-dot-product with deterministic seeded planes) buckets both
  sides; candidates are only corpus vectors sharing a bucket, then
  exact re-rank. Sub-linear candidate sets at 100 TB; recall tunable
  by number of tables/planes.
All distance math is double-precision, left-to-right ``aggregate``
folds, so the DuckDB oracle (list_dot_product) reproduces values
bit-for-bit; outputs round to 6 dp before ranking anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] in double precision (sequential fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cos_sim) — self-matches excluded,
    similarity rounded to 6 dp, ties broken by neighbor id so results
    are total-order deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from a seeded
    integer hash — reproducible across engines and runs (no RNG)."""
    # simple LCG on (seed, i); values in [-1, 1)
    vals = []
    state = (seed * 1103515245 + 12345) & 0x7FFFFFFF
    for _ in range(dim):
        state = (state * 1103515245 + 12345) & 0x7FFFFFFF
        vals.append((state / 0x40000000) - 1.0)
    return vals


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: one sign bit per plane, packed to
    a bigint bucket key."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(v) for v in plane])) >= 0, 1).otherwise(0)
        for plane in planes
    ]
    key = F.lit(0).cast("bigint")
    for i, b in enumerate(bits):
        key = key + (b.cast("bigint") * F.lit(2**i).cast("bigint"))
    return key


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket-join on the hyperplane signature,
    exact cosine re-rank within buckets.

    At 100 TB the corpus side is hash-partitioned by bucket (one
    shuffle); each query probes exactly its bucket. Recall < 1.0 by
    design — the exact :func:`cosine_topk` is the oracle baseline.
    """
    planes = [_hyperplane(seed + i, dim) for i in range(num_planes)]
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
