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
    num_planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: ``num_tables`` independent hyperplane
    signatures; candidates share a bucket in ≥1 table; exact cosine
    re-rank on the deduped candidate set. P[catch a neighbor at angle
    θ] = 1-(1-(1-θ/π)^planes)^tables — more tables raises recall,
    more planes shrinks buckets.

    At 100 TB the corpus side is hash-partitioned by (table, bucket)
    (one shuffle); each query probes one bucket per table. Recall
    < 1.0 by design — exact :func:`cosine_topk` is the baseline.
    """
    c_sides, q_sides = [], []
    for t in range(num_tables):
        planes = [_hyperplane(dim, seed + t * 1000 + i) for i in range(num_planes)]
        sig = lsh_signature(F.col(vec_col), planes)
        c_sides.append(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("_cv"),
                sig.alias("bucket"),
            ).withColumn("table", F.lit(t))
        )
        q_sides.append(
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("_qv"),
                sig.alias("bucket"),
            ).withColumn("table", F.lit(t))
        )
    c = c_sides[0]
    for s in c_sides[1:]:
        c = c.unionByName(s)
    q = q_sides[0]
    for s in q_sides[1:]:
        q = q.unionByName(s)
    scored = (
        F.broadcast(q)
        .join(c, ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
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


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, EXACT: all (i<j) pairs
    with cosine ≥ threshold. O(n²) — the correctness baseline; use
    :func:`lsh_near_dup_pairs` as the 100 TB path."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def lsh_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 6,
    num_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs, LSH-accelerated: ``num_tables`` independent
    hyperplane signatures bucket the corpus; candidate pairs share a
    bucket in ≥1 table; exact cosine then filters false positives —
    so precision is 1.0 and only recall is approximate (more tables /
    fewer planes per table → higher recall, bigger buckets).

    Scale shape: per-table shuffle on bucket key (bounded bucket
    sizes), pair dedup, re-rank — never the O(n²) cross join. At
    100 TB add banding on vector chunks and AQE skew splitting for
    hot buckets; the operator contract is unchanged."""
    sides = []
    for t in range(num_tables):
        planes = [_hyperplane(dim, seed + t * 1000 + i) for i in range(num_planes)]
        sig = corpus.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("_v"),
            lsh_signature(F.col(vec_col), planes).alias("bucket"),
        ).withColumn("table", F.lit(t))
        sides.append(sig)
    tagged = sides[0]
    for s in sides[1:]:
        tagged = tagged.unionByName(s)
    left = tagged.select("table", "bucket", F.col("id").alias("id_a"), F.col("_v").alias("_va"))
    right = tagged.select("table", "bucket", F.col("id").alias("id_b"), F.col("_v").alias("_vb"))
    cand = (
        left.join(right, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_va", "_vb")
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a",
        "id_b",
        F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cos_sim"),
    ).where(F.col("cos_sim") >= threshold)


# -----------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse quantize, probe nearest cells
# -----------------------------------------------------------------------


def _centroids(n: int, dim: int, seed: int) -> list[list[float]]:
    """Deterministic random codebook (LCG, no RNG state). A trained
    k-means codebook drops in without changing the plan; a random one
    keeps the whole operator reproducible for the oracle/tests."""
    return [_hyperplane(dim, seed + 7777 + i) for i in range(n)]


def _scored_cells(vec: Column, cents: list[list[float]]) -> Column:
    """Array of (−score, cell_idx) structs, one per centroid.

    argmax of cos(v, c) == argmax of dot(v, c)/|c| (|v| is constant
    per row); |c| are Python-side literals. Shape matters twice here:
    an iterative when-chain duplicates fold subtrees exponentially
    (OOM at plan build), and nesting the folds inside an outer
    ``transform`` lambda forces slow interpreted evaluation (~45x) —
    a flat array of independent per-centroid folds is linear in plan
    size AND stays on the fast eval path.
    """
    cells = []
    for i, c in enumerate(cents):
        norm = float(sum(x * x for x in c) ** 0.5)
        score = dot(vec, F.array(*[F.lit(float(x)) for x in c])) / F.lit(norm)
        cells.append(F.struct((-score).alias("neg"), F.lit(i).alias("i")))
    return F.array(*cells)


def probe_clusters(vec: Column, cents: list[list[float]], n_probe: int) -> Column:
    """Array of the n_probe nearest centroid indices (score desc,
    index asc tiebreak) — the cells a query fans out to."""
    return F.slice(F.array_sort(_scored_cells(vec, cents)), 1, n_probe).getField("i")


def assign_cluster(vec: Column, cents: list[list[float]]) -> Column:
    """Index of the nearest (max cosine) centroid; first wins ties."""
    return F.element_at(probe_clusters(vec, cents, 1), 1)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: corpus vectors live in their nearest-centroid cell;
    each query probes its ``n_probe`` nearest cells and re-ranks
    exactly within them. ``n_probe == n_centroids`` degrades to the
    exact brute force (the test invariant); smaller n_probe trades
    recall for a ~n_probe/n_centroids candidate fraction.

    Scale shape: corpus is hash-partitioned by cell (one shuffle,
    done once and cacheable); queries broadcast; no cross join."""
    cents = _centroids(n_centroids, dim, seed)
    # repartition = the IVF index shape (corpus co-located by cell)
    # AND an exchange barrier so Catalyst's projection collapse can't
    # inline the 16-fold assignment into the join and re-evaluate it
    # per candidate row
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        assign_cluster(F.col(vec_col), cents).alias("cell"),
    ).repartition("cell")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(probe_clusters(F.col(vec_col), cents, n_probe)).alias("cell"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "cell")
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
