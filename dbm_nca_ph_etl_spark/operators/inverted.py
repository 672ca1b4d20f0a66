"""Inverted index over a document corpus + posting-list retrieval.

The retrieval primitive every corpus tool leans on (grep-the-lake,
targeted decontamination, quality-rule debugging: "show me every
document containing all of these tokens") is an anti-pattern as a
text scan — 100 TB of substring matching per question. The index
form is relational and cheap:

- **postings**: one row per distinct (token, doc) with the term
  frequency — built by one explode + groupBy, written once per
  corpus snapshot. Laid out sort-clustered by token
  (sinks/maintenance.write_sorted_parquet), a term lookup prunes to
  the files whose footer range covers the token — O(posting list),
  not O(corpus).
- **conjunctive search**: filter postings to the query terms (the
  pushed-down predicate IS the index probe), then group by doc and
  keep docs matching all terms. Shuffles only the matched postings —
  lists for the query's terms — never the corpus.

The TF column doubles as a ranking signal (sum over matched terms
here; TF-IDF lives in the tfidf_top_terms query).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.operators.dedup import tokens


def build_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(token, doc id, tf) — the flat posting-list table."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def conjunctive_search(
    postings: DataFrame, terms: Sequence[str]
) -> DataFrame:
    """Documents containing ALL ``terms``; score = summed TF of the
    matched terms. The ``isin`` filter reaches the postings scan as a
    pushed-down ``In`` predicate — against a token-clustered layout
    that is a file-pruned index probe."""
    uniq = sorted(set(terms))
    return (
        postings.where(F.col("token").isin(uniq))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("_matched"),
            F.sum("tf").cast("long").alias("score"),
        )
        .where(F.col("_matched") == len(uniq))
        .select("doc_id", "score")
    )
