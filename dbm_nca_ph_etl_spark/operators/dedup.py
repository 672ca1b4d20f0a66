"""Deduplication operators (north-star extension surface).

Four strategies over a document table, all shuffle-conscious:

- :func:`exact_dedup` — hash-groupBy on a content digest. One
  shuffle on a uniformly-distributed md5 key; no skew by
  construction. The 100 TB workhorse.
- :func:`minhash_signatures` / :func:`minhash_lsh_pairs` /
  :func:`minhash_dedup` — MinHash + LSH banding. Shingle → seeded
  min-hash signature → band buckets → self-join *within buckets
  only* (never all-pairs), then exact Jaccard verification of
  candidates. The standard near-dup pipeline (cf. Broder '97 resemblance,
  as used by web-scale corpus dedup).
- :func:`simhash` — 60-bit sign-of-weighted-sum fingerprint;
  near-dups differ in few bits. Hamming-ball lookup via band keys.
- :func:`ngram_jaccard_pairs` — exact n-gram Jaccard on candidate
  pairs (used standalone for small sets, and as the verifier inside
  the LSH pipeline).

All hashes go through ``functions.scalars.hash64`` (md5-derived) so
the DuckDB oracle can replay signatures bit-for-bit — Spark-private
xxhash/murmur would make the correctness gate unverifiable.

Scale notes: LSH banding means the only quadratic work is within a
bucket. Degenerate buckets (boilerplate shingles) are capped by
``max_bucket`` salting guard; signature computation is
explode+groupBy (map-side combinable min aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.functions.scalars import hash64

DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4


def tokens(text: Column) -> Column:
    """Whitespace tokenization with empty-token filtering."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (space-joined) of a text column.

    Built with sequence+transform HOFs — stays in codegen; no UDF.
    """
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    shingle_at = lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))  # noqa: E731
    return F.array_distinct(
        F.when(F.size(toks) >= n, F.transform(idx, shingle_at)).otherwise(
            F.array(F.concat_ws(" ", toks))
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest-id row per content digest.

    groupBy(min) + semi-join back — two map-side-combinable shuffles
    on a uniform digest key; survivor choice is deterministic.
    """
    digest = F.md5(F.col(text_col).cast("binary")).alias("content_hash")
    keep = df.select(digest, F.col(id_col)).groupBy("content_hash").agg(
        F.min(id_col).alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document MinHash signature: for seed h, min over shingles
    of hash64(shingle || '#h'). Output: (id, h, minhash).

    Explode(shingles) × explode(seeds) then min-groupBy — the min is
    map-side combined, so the shuffle carries one row per (doc, h).
    """
    shingled = df.select(F.col(id_col), word_shingles(F.col(text_col), shingle_n).alias("shingle_arr"))
    exploded = shingled.select(
        id_col, F.explode("shingle_arr").alias("shingle")
    ).withColumn("h", F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))))
    hashed = exploded.select(
        id_col,
        "h",
        hash64(F.concat(F.col("shingle"), F.lit("#"), F.col("h").cast("string"))).alias("hv"),
    )
    return hashed.groupBy(id_col, "h").agg(F.min("hv").alias("minhash"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) sharing ≥1 LSH band bucket.

    Band key = md5 of the ordered concat of the band's minhashes; the
    self-join happens per bucket, so complexity is Σ bucket², not N².
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    banded = sigs.withColumn("band", (F.col("h") / rows_per_band).cast("int"))
    buckets = (
        banded.groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("h", "minhash"))),
                        lambda s: s["minhash"].cast("string"),
                    ),
                ).cast("binary")
            ).alias("bucket")
        )
    )
    a = buckets.select(F.col(id_col).alias("a"), "band", "bucket")
    b = buckets.select(F.col(id_col).alias("b"), "band", "bucket")
    return (
        a.join(b, on=["band", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def ngram_jaccard(text_a: Column, text_b: Column, n: int = 3) -> Column:
    """Exact Jaccard similarity of the two texts' n-word shingle sets."""
    sa, sb = word_shingles(text_a, n), word_shingles(text_b, n)
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(F.array_union(sa, sb)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Attach exact n-gram Jaccard to candidate (a, b) pairs.

    Two broadcast-or-shuffle hash joins against the docs table — the
    candidate set is tiny relative to the corpus, so AQE picks
    broadcast for the pairs side at scale.
    """
    da = docs.select(F.col(id_col).alias("a"), F.col(text_col).alias("_ta"))
    db = docs.select(F.col(id_col).alias("b"), F.col(text_col).alias("_tb"))
    return (
        pairs.join(da, "a")
        .join(db, "b")
        .select("a", "b", F.round(ngram_jaccard(F.col("_ta"), F.col("_tb"), n), 6).alias("jaccard"))
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-dup dedup: LSH candidates → exact-Jaccard verify →
    drop the higher id of each confirmed pair (connected via the
    lower-id survivor rule applied transitively one step — greedy,
    deterministic)."""
    cands = minhash_lsh_pairs(df, text_col, id_col, num_hashes, bands, shingle_n)
    verified = ngram_jaccard_pairs(cands, df, text_col, id_col, shingle_n).where(
        F.col("jaccard") >= threshold
    )
    losers = verified.select(F.col("b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def simhash(text: Column, bits: int = 32) -> Column:
    """SimHash fingerprint: bit b is the sign of Σ_tokens (±1) where
    the sign is bit b of hash64(token). Expressed entirely with
    array HOFs (aggregate over the token array) — no explode, no UDF;
    one pass per row inside codegen.
    """
    toks = tokens(text)
    hashes = F.transform(toks, lambda t: hash64(t))
    # bit loop unrolled in Python: shiftright/shiftleft take literal
    # shift amounts, so the per-bit expressions are built here and the
    # whole thing stays one codegen'd expression tree.
    bit_votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
                    for b in range(bits)
                ]
            ),
            lambda a, v: a + v,
        ),
    )
    # pack sign bits: 2^b weights are exact in double for bits <= 52,
    # which lets the bit position stay a column (shiftleft would need a
    # literal) while referencing bit_votes only once in the plan.
    assert bits <= 52, "double-exact packing bound"
    return F.aggregate(
        F.zip_with(
            bit_votes,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda vote, b: F.when(vote > 0, F.pow(F.lit(2.0), b.cast("double"))).otherwise(
                F.lit(0.0)
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ).cast("bigint")
