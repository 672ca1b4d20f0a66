"""Iterative graph operators (Pregel-shaped message passing).

Connected components (operators/dedup.py) covers the dedup-cluster
use; this module adds the other workhorse of corpus/link analysis —
PageRank — in the same iterate-with-lineage-cuts style as the k-means
trainer (operators/similarity.py):

- per iteration: ranks ⋈ edges on ``src`` (one shuffle) then a
  groupBy on ``dst`` (one shuffle) — exactly a Pregel superstep's
  scatter/gather, expressed relationally so Catalyst/AQE own the
  physical plan;
- ``localCheckpoint`` after each iteration truncates the lineage —
  without it the plan doubles per superstep and the driver, not the
  cluster, becomes the bottleneck;
- degrees are computed once and cached by reuse of the checkpointed
  frame; nothing but the k-row model state ever reaches the driver
  (and here not even that — ranks stay distributed).

The fixed-iteration form (rather than convergence-tested) is
deliberate: it is deterministic, replayable by a SQL oracle (the
catalog unrolls the same supersteps as chained CTEs in DuckDB), and
at 100 TB you budget supersteps up front anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node PageRank ``r'(v) = (1-d) + d·Σ r(u)/outdeg(u)`` over a
    directed edge list, ``iterations`` fixed supersteps from r₀ = 1.

    Nodes are whatever appears as a source; feed an undirected graph
    as both edge directions so every node has in- and out-edges (no
    dangling-mass redistribution — the caller owns that choice).
    Returns (node, rank) with full double precision; round for
    display/comparison.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    out_edges = e.join(deg, "src").localCheckpoint()  # (src, dst, _d)

    ranks = out_edges.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(1.0).alias("rank")
    )
    for _ in range(iterations):
        contribs = out_edges.join(
            ranks, out_edges["src"] == ranks["node"]
        ).select("dst", (F.col("rank") / F.col("_d")).alias("_c"))
        ranks = (
            contribs.groupBy("dst")
            .agg((F.lit(1.0 - damping) + damping * F.sum("_c")).alias("rank"))
            .select(F.col("dst").alias("node"), "rank")
            .localCheckpoint()
        )
    return ranks


def bfs_levels(
    edges: DataFrame,
    sources: list[str],
    max_hops: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Breadth-first shortest-path levels from a source set, bounded
    at ``max_hops`` supersteps — (node, dist) for every node reached.

    Per superstep: frontier ⋈ edges (one shuffle) then a min-groupBy
    (one shuffle, map-side combinable) folding new candidates into
    the running distance table; ``localCheckpoint`` cuts lineage.
    All-integer state, so the SQL-oracle comparison is exact with no
    float-rounding caveats. Bounded hops is the deliberate contract
    (same as :func:`pagerank`): deterministic, oracle-replayable, and
    at 100 TB you cap supersteps anyway — unreached nodes simply
    don't appear.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    dist = (
        e.sparkSession.createDataFrame(
            [(s, 0) for s in sources], "node string, dist int"
        )
    )
    for _ in range(max_hops):
        hops = e.join(dist, e["src"] == dist["node"]).select(
            F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        dist = (
            dist.unionByName(hops)
            .groupBy("node")
            .agg(F.min("dist").cast("int").alias("dist"))
            .localCheckpoint()
        )
    return dist


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Global triangle count of an undirected graph (edges may be
    given in either or both directions; self-loops ignored) — 1 row,
    ``n_triangles``.

    The naive three-way self-join materializes every path of length
    2 — O(Σ deg²), ruinous on skewed graphs (one celebrity node with
    10⁶ neighbors yields 10¹² wedges). This is the standard
    degree-orientation fix: orient every edge from the
    (degree, node)-smaller endpoint to the larger, so each vertex's
    out-degree is bounded by O(√m) on any graph (arboricity bound) —
    the wedge join shrinks from Σ deg² to Σ outdeg², and each
    triangle is counted exactly once at its smallest vertex. The
    catalog oracle deliberately keeps the naive a<b<c three-way join:
    the optimized plan must reproduce the naive semantics exactly.
    """
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    both = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = both.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    keyed = (
        both.join(deg.withColumnRenamed("a", "_n1"), F.col("a") == F.col("_n1"))
        .withColumnRenamed("d", "da")
        .join(deg.withColumnRenamed("a", "_n2"), F.col("b") == F.col("_n2"))
        .withColumnRenamed("d", "db")
        .select(
            "a", "b",
            F.struct(F.col("da").alias("d"), F.col("a").alias("n")).alias("ka"),
            F.struct(F.col("db").alias("d"), F.col("b").alias("n")).alias("kb"),
        )
    )
    oriented = keyed.where(F.col("ka") < F.col("kb")).select(
        F.col("a").alias("u"), F.col("b").alias("v"), F.col("kb").alias("kv")
    ).localCheckpoint()
    w1 = oriented.select("u", F.col("v").alias("x"), F.col("kv").alias("kx"))
    w2 = oriented.select("u", F.col("v").alias("y"), F.col("kv").alias("ky"))
    wedges = w1.join(w2, "u").where(F.col("kx") < F.col("ky")).select("x", "y")
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    # left_semi keeps every wedge row (a pair (x,y) reached from two
    # different u is two distinct triangles) without materializing
    # join output columns
    tri = wedges.join(closing, ["x", "y"], "left_semi")
    return tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))


def shortest_paths(
    edges: DataFrame,
    sources: list[str],
    max_hops: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """WEIGHTED single-source shortest paths — Bellman-Ford as
    bounded supersteps, the weighted upgrade of :func:`bfs_levels`
    (Dijkstra's priority queue is inherently sequential; Bellman-
    Ford relaxation is a join+min-groupBy per round, which is the
    form a cluster can actually run — the Pregel SSSP example).

    ``max_hops`` bounds the path LENGTH considered (k rounds relax
    every ≤k-edge path): deterministic, oracle-replayable, and the
    standard production cap. Integer weights are the contract —
    distances stay exact under any partitioning, so the SQL-oracle
    hash comparison has no float caveats. Negative weights are
    refused (with a bounded-round relaxation they silently yield
    path-length-dependent results; Bellman-Ford's negative-cycle
    detection needs the unbounded variant).

    Per superstep: frontier ⋈ edges (one shuffle), min-groupBy
    (map-side combinable), localCheckpoint lineage cut — O(k·|E|)
    total work, the same scale shape as bfs_levels/pagerank."""
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("long").alias("w"),
    ).localCheckpoint()
    if e.where(F.col("w") < 0).limit(1).count() > 0:
        raise ValueError("shortest_paths requires non-negative integer weights")
    dist = e.sparkSession.createDataFrame(
        [(s, 0) for s in sources], "node string, dist long"
    )
    for _ in range(max_hops):
        relax = e.join(dist, e["src"] == dist["node"]).select(
            F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.unionByName(relax)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
            .localCheckpoint()
        )
    return dist
