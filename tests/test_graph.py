"""PageRank operator invariants (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.operators.graph import pagerank


def _edges(spark, pairs):
    und = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(und, "src string, dst string")


class TestPageRank:
    def test_symmetric_pair_is_fixed_point(self, spark):
        # A <-> B: each node's rank stays exactly 1.0 every superstep
        ranks = {
            r.node: r.rank
            for r in pagerank(_edges(spark, [("a", "b")]), iterations=5).collect()
        }
        assert ranks == {"a": 1.0, "b": 1.0}

    def test_star_center_dominates_and_mass_conserves(self, spark):
        # undirected star a-{b,c,d}: per-node form conserves total
        # rank (= n) when every node has in-edges; center > leaves
        ranks = {
            r.node: r.rank
            for r in pagerank(
                _edges(spark, [("a", "b"), ("a", "c"), ("a", "d")]),
                iterations=8,
            ).collect()
        }
        assert abs(sum(ranks.values()) - 4.0) < 1e-9
        assert ranks["a"] > ranks["b"]
        assert abs(ranks["b"] - ranks["c"]) < 1e-12
        assert abs(ranks["b"] - ranks["d"]) < 1e-12

    def test_directed_chain_ranks_downstream_higher(self, spark):
        # a -> b -> c -> a (cycle, so no dangling): symmetric again
        cyc = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
        )
        ranks = [r.rank for r in pagerank(cyc, iterations=6).collect()]
        assert all(abs(r - 1.0) < 1e-12 for r in ranks)

    def test_plan_stays_bounded_per_iteration(self, spark):
        # the localCheckpoint lineage cut: the final plan must not
        # contain one join per superstep (it references only the last
        # checkpointed scan)
        pr = pagerank(_edges(spark, [("a", "b"), ("b", "c")]), iterations=6)
        plan = pr._jdf.queryExecution().toString()
        assert plan.count("Join") <= 2


class TestBFS:
    def test_chain_distances(self, spark):
        und = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
        edges = _edges(spark, und)
        from dbm_nca_ph_etl_spark.operators.graph import bfs_levels

        dist = {
            r.node: r.dist for r in bfs_levels(edges, ["a"], max_hops=3).collect()
        }
        # e is 4 hops away -> not reached within 3
        assert dist == {"a": 0, "b": 1, "c": 2, "d": 3}

    def test_multi_source_min(self, spark):
        from dbm_nca_ph_etl_spark.operators.graph import bfs_levels

        edges = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        dist = {
            r.node: r.dist
            for r in bfs_levels(edges, ["a", "d"], max_hops=5).collect()
        }
        assert dist == {"a": 0, "d": 0, "b": 1, "c": 1}


class TestTriangleCount:
    def test_matches_brute_force(self, spark):
        import itertools
        import random

        from dbm_nca_ph_etl_spark.operators.graph import triangle_count

        random.seed(7)
        nodes = list(range(12))
        edges = set()
        for _ in range(30):
            a, b = random.sample(nodes, 2)
            edges.add((min(a, b), max(a, b)))
        brute = sum(
            1
            for a, b, c in itertools.combinations(nodes, 3)
            if (a, b) in edges and (b, c) in edges and (a, c) in edges
        )
        df = spark.createDataFrame(sorted(edges), "src long, dst long")
        assert triangle_count(df).collect()[0].n_triangles == brute

    def test_duplicate_and_reversed_edges_ignored(self, spark):
        from dbm_nca_ph_etl_spark.operators.graph import triangle_count

        df = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "c"), ("a", "a")],
            "src string, dst string",
        )
        assert triangle_count(df).collect()[0].n_triangles == 1


class TestShortestPaths:
    def test_weighted_beats_hop_count(self, spark):
        from dbm_nca_ph_etl_spark.operators.graph import shortest_paths

        # a->b direct costs 10; a->c->b costs 2+3=5: weighted SSSP
        # must prefer the longer-hop cheaper path (BFS would not)
        edges = spark.createDataFrame(
            [("a", "b", 10), ("a", "c", 2), ("c", "b", 3)],
            "src string, dst string, w long",
        )
        got = {r.node: r.dist for r in shortest_paths(edges, ["a"], max_hops=3).collect()}
        assert got == {"a": 0, "b": 5, "c": 2}

    def test_hop_bound_limits_relaxation(self, spark):
        from dbm_nca_ph_etl_spark.operators.graph import shortest_paths

        # chain a-1->b-1->c-1->d; 2 hops can't reach d
        edges = spark.createDataFrame(
            [("a", "b", 1), ("b", "c", 1), ("c", "d", 1)],
            "src string, dst string, w long",
        )
        got = {r.node: r.dist for r in shortest_paths(edges, ["a"], max_hops=2).collect()}
        assert got == {"a": 0, "b": 1, "c": 2}

    def test_negative_weights_refused(self, spark):
        import pytest

        from dbm_nca_ph_etl_spark.operators.graph import shortest_paths

        edges = spark.createDataFrame(
            [("a", "b", -1)], "src string, dst string, w long"
        )
        with pytest.raises(ValueError):
            shortest_paths(edges, ["a"])
