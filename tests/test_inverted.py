"""Inverted index build + conjunctive posting-list retrieval."""

import pyspark.sql.functions as F

from dbm_nca_ph_etl_spark.operators.inverted import (
    build_postings,
    conjunctive_search,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark hash join hash"),
            (2, "sort merge join"),
            (3, "hash aggregate"),
            (4, "HASH   Join\tspark"),
            (5, ""),
        ],
        "doc_id long, text string",
    )


class TestPostings:
    def test_tf_and_case_normalization(self, spark):
        p = {
            (r["token"], r["doc_id"]): r["tf"]
            for r in build_postings(_docs(spark)).collect()
        }
        assert p[("hash", 1)] == 2  # tf counts repeats
        assert p[("hash", 4)] == 1  # case/whitespace normalized
        assert ("", 5) not in p  # empty docs emit nothing

    def test_conjunctive_all_terms_required(self, spark):
        postings = build_postings(_docs(spark))
        got = {
            r["doc_id"]: r["score"]
            for r in conjunctive_search(postings, ["hash", "join"]).collect()
        }
        # doc1: hash tf2 + join tf1 = 3; doc4: 1+1 = 2; docs 2,3 miss a term
        assert got == {1: 3, 4: 2}

    def test_duplicate_query_terms_are_set_semantic(self, spark):
        postings = build_postings(_docs(spark))
        a = conjunctive_search(postings, ["hash", "join"]).collect()
        b = conjunctive_search(postings, ["hash", "join", "hash"]).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_no_match(self, spark):
        postings = build_postings(_docs(spark))
        assert conjunctive_search(postings, ["spark", "merge"]).count() == 0

    def test_term_probe_pushes_down_on_clustered_index(self, spark, tmp_path):
        """Persisted token-clustered postings: the query-term filter
        must reach the parquet scan as an In predicate (the footer-
        pruned index probe the module docstring promises)."""
        from dbm_nca_ph_etl_spark.sinks.maintenance import write_sorted_parquet

        dest = str(tmp_path / "postings")
        write_sorted_parquet(build_postings(_docs(spark)), dest, ["token"], num_files=2)
        probe = conjunctive_search(spark.read.parquet(dest), ["hash", "join"])
        old = spark.conf.get("spark.sql.maxMetadataStringLength")
        spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
        try:
            plan = probe._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.maxMetadataStringLength", old)
        assert "PushedFilters: [In(token, [hash,join])" in plan
        assert {r["doc_id"] for r in probe.collect()} == {1, 4}
