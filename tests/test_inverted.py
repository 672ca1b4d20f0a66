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


class TestBM25:
    def test_ranking_and_idf_weighting(self, spark):
        import math

        from dbm_nca_ph_etl_spark.operators.inverted import (
            bm25_search,
            doc_lengths,
        )

        docs = _docs(spark)
        postings = build_postings(docs)
        rows = bm25_search(
            postings, doc_lengths(docs), ["hash", "merge"], topk=10
        ).collect()
        # ranks are 1..n, strictly score-descending with doc_id tiebreak
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert (a["score"], -a["doc_id"]) >= (b["score"], -b["doc_id"])
        by_doc = {r["doc_id"]: r for r in rows}
        # 'merge' (df=1) is rarer than 'hash' (df=3): doc2 (merge only,
        # short) must outrank doc3 (hash only, same length 2... doc3 has
        # len 2, doc2 len 3) — idf dominates
        assert by_doc[2]["score"] > by_doc[3]["score"]
        # every match is counted
        assert by_doc[1]["n_matched_terms"] == 1  # hash only
        assert by_doc[2]["n_matched_terms"] == 1  # merge only
        # hand-check doc3: tf=1, dl=2, N=5... empty doc5 has dl=0 but
        # still counts toward N and avgdl (doc-metadata semantics)
        n, df_hash = 5, 3
        avgdl = (4 + 3 + 2 + 3 + 0) / 5.0
        idf = math.log(1 + (n - df_hash + 0.5) / (df_hash + 0.5))
        exp = idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2 / avgdl))
        assert abs(by_doc[3]["score"] - round(exp, 6)) < 1e-9

    def test_topk_cuts_deterministically(self, spark):
        from dbm_nca_ph_etl_spark.operators.inverted import (
            bm25_search,
            doc_lengths,
        )

        docs = _docs(spark)
        got = bm25_search(
            build_postings(docs), doc_lengths(docs), ["hash"], topk=2
        ).collect()
        assert len(got) == 2
        assert got[0]["rank"] == 1 and got[1]["rank"] == 2


class TestUnigramNLL:
    def test_rare_tokens_raise_nll(self, spark):
        from dbm_nca_ph_etl_spark.operators.text_analysis import unigram_nll

        docs = spark.createDataFrame(
            [
                (1, "the the the the"),      # all common
                (2, "the zyxwv"),            # one hapax
                (3, ""),                     # no tokens -> dropped
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in unigram_nll(docs).collect()}
        assert set(rows) == {1, 2}
        assert rows[1]["n_tokens"] == 4
        assert rows[2]["avg_nll"] > rows[1]["avg_nll"]
        # NLL is bounded by the hapax ceiling ln(T+V)
        import math

        assert 0 < rows[2]["avg_nll"] < math.log(6 + 2) + 1e-9


class TestPhraseSearch:
    def _pp(self, spark, rows):
        from dbm_nca_ph_etl_spark.operators.inverted import (
            build_positional_postings,
        )

        d = spark.createDataFrame(rows, "doc_id long, text string")
        return build_positional_postings(d)

    def test_exact_phrase_and_positions(self, spark):
        from dbm_nca_ph_etl_spark.operators.inverted import phrase_search

        pp = self._pp(
            spark,
            [
                (1, "the quick brown fox"),
                (2, "quick brown shoes and quick brown boots"),
                (3, "brown quick"),  # reversed: no match
            ],
        )
        got = {
            r.doc_id: (r.n_occurrences, r.first_pos)
            for r in phrase_search(pp, ["quick", "brown"]).collect()
        }
        assert got == {1: (1, 2), 2: (2, 1)}

    def test_repeated_term_phrase_overlaps(self, spark):
        from dbm_nca_ph_etl_spark.operators.inverted import phrase_search

        pp = self._pp(spark, [(1, "go go go stop go go")])
        got = phrase_search(pp, ["go", "go"]).collect()
        # "go go go" has 2 overlapping starts + 1 in the tail
        assert [(r.n_occurrences, r.first_pos) for r in got] == [(3, 1)]

    def test_three_token_phrase(self, spark):
        from dbm_nca_ph_etl_spark.operators.inverted import phrase_search

        pp = self._pp(
            spark, [(1, "a b c d"), (2, "a b x c"), (3, "x a b c")]
        )
        got = {r.doc_id: r.first_pos for r in phrase_search(pp, ["a", "b", "c"]).collect()}
        assert got == {1: 1, 3: 2}

    def test_empty_phrase_raises(self, spark):
        from dbm_nca_ph_etl_spark.operators.inverted import phrase_search

        import pytest as _pt

        with _pt.raises(ValueError):
            phrase_search(self._pp(spark, [(1, "a")]), [])


class TestMoreLikeThis:
    def _corpus(self, spark):
        # docs 1 and 2 are near-identical; 3 shares one rare token
        # with 1; 4 is disjoint; "the" appears in every doc (df=N)
        # so the df cap must prune it from all vectors.
        return spark.createDataFrame(
            [
                (1, "the quick brown fox jumps"),
                (2, "the quick brown fox leaps"),
                (3, "the lazy fox sleeps"),
                (4, "the numeric vector table"),
            ],
            "doc_id long, text string",
        )

    def test_near_identical_doc_ranks_first(self, spark):
        from dbm_nca_ph_etl_spark.operators.inverted import (
            build_postings,
            more_like_this,
        )

        # cap at 0.8: "fox" (df 3/4) survives, "the" (df 4/4) pruned
        got = more_like_this(
            build_postings(self._corpus(spark)), query_ids=[1], topk=3,
            max_df_ratio=0.8,
        ).collect()
        by_rank = {r.rank: r for r in got}
        assert by_rank[1].doc_id == 2  # 3 shared informative tokens
        assert by_rank[2].doc_id == 3  # 1 shared token ("fox")
        # doc 4 shares only the df-pruned "the": no candidate row at all
        assert {r.doc_id for r in got} == {2, 3}
        # self-match excluded everywhere
        assert all(r.doc_id != 1 for r in got)
        assert by_rank[1].cos_ppm > by_rank[2].cos_ppm

    def test_exact_duplicate_scores_unit_cosine(self, spark):
        from dbm_nca_ph_etl_spark.operators.inverted import (
            build_postings,
            more_like_this,
        )

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta")],
            "doc_id long, text string",
        )
        got = more_like_this(
            build_postings(docs), query_ids=[1], topk=2, max_df_ratio=0.7
        ).collect()
        assert got[0].doc_id == 2 and got[0].cos_ppm == 1_000_000

    def test_empty_query_set_refused(self, spark):
        import pytest

        from dbm_nca_ph_etl_spark.operators.inverted import (
            build_postings,
            more_like_this,
        )

        with pytest.raises(ValueError):
            more_like_this(build_postings(self._corpus(spark)), query_ids=[])


class TestBigramNLL:
    def test_differential_vs_pure_python(self, spark):
        import math

        from dbm_nca_ph_etl_spark.operators.text_analysis import bigram_nll

        texts = [
            (1, "a b a b a b"),           # predictable transitions
            (2, "a b c d e f"),           # every transition unique
            (3, "solo"),                  # < 2 tokens: drops out
        ]
        got = {
            r.doc_id: r
            for r in bigram_nll(
                spark.createDataFrame(texts, "doc_id long, text string")
            ).collect()
        }
        assert 3 not in got

        # pure-Python replay of the exact micro-nat algebra
        occ, c12, c1 = {}, {}, {}
        for d, t in texts:
            toks = t.split()
            for w1, w2 in zip(toks, toks[1:]):
                occ[(d, w1, w2)] = occ.get((d, w1, w2), 0) + 1
                c12[(w1, w2)] = c12.get((w1, w2), 0) + 1
        for (w1, _), c in c12.items():
            c1[w1] = c1.get(w1, 0) + c
        vocab = {w for p in c12 for w in p}
        nm = {
            p: math.floor(
                (math.log(c1[p[0]] + len(vocab)) - math.log(c + 1)) * 1e6 + 0.5
            )
            for p, c in c12.items()
        }
        for d in (1, 2):
            n = sum(v for (dd, *_), v in occ.items() if dd == d)
            nll = sum(
                v * nm[(w1, w2)] for (dd, w1, w2), v in occ.items() if dd == d
            )
            assert got[d].n_bigrams == n
            assert got[d].nll_micro == nll

        # word salad is more perplexing than the predictable doc
        assert got[2].avg_nll_micro > got[1].avg_nll_micro
        assert got[2].ppl > got[1].ppl


class TestLinearClassifierTrain:
    def test_learns_separable_vocab(self, spark):
        from dbm_nca_ph_etl_spark.operators.text_analysis import (
            hashed_features,
            linear_classifier_train,
        )

        # two disjoint vocabularies -> perfectly separable
        spam = ["buy cheap pills now", "cheap pills buy", "now buy cheap"]
        ham = ["meeting agenda minutes", "minutes agenda", "agenda meeting notes"]
        rows = [(i, t) for i, t in enumerate(spam)] + [
            (i + 10, t) for i, t in enumerate(ham)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        feats = hashed_features(docs, dim=64)
        labels = docs.select(
            "doc_id", (F.col("doc_id") < 10).cast("int").alias("y")
        )
        w = linear_classifier_train(feats, labels, dim=64, iters=8, lr=64.0)
        scored = (
            feats.join(labels, "doc_id")
            .join(F.broadcast(w), "bucket")
            .groupBy("doc_id", "y")
            .agg(F.sum(F.col("btf") * F.col("w_micro")).alias("s"))
            .collect()
        )
        assert all((r.s >= 0) == (r.y == 1) for r in scored)  # 100% train acc

    def test_iteration_guard(self, spark):
        import pytest

        from dbm_nca_ph_etl_spark.operators.text_analysis import (
            hashed_features,
            linear_classifier_train,
        )

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        feats = hashed_features(docs, dim=8)
        labels = docs.select("doc_id", F.lit(1).alias("y"))
        with pytest.raises(ValueError):
            linear_classifier_train(feats, labels, dim=8, iters=100, max_iters=64)

    def test_no_labeled_docs_refused(self, spark):
        import pytest

        from dbm_nca_ph_etl_spark.operators.text_analysis import (
            hashed_features,
            linear_classifier_train,
        )

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        feats = hashed_features(docs, dim=8)
        labels = spark.createDataFrame([], "doc_id long, y int")
        with pytest.raises(ValueError):
            linear_classifier_train(feats, labels, dim=8, iters=1)
