"""Streaming incremental near-dup dedup against a growing band index.

The streaming leg of the incremental-dedup story: documents arrive
as a stream; each micro-batch (1) PROBES the persisted MinHash band
index (``operators/dedup.lsh_probe_new`` with ``index=`` — cost
scales with the batch, the corpus is never re-signed), (2) records
one verdict row per arriving doc, and (3) folds only the NOVEL
documents' band rows and text back into the index/corpus tables, so
later batches dedup against everything that came before — the
standard dedup-at-ingest topology.

Exactly-once over the at-least-once checkpoint feed: every write is
a DYNAMIC PARTITION OVERWRITE of the epoch's own partition
(``epoch=<id>`` directory), so a replayed epoch rewrites its
partition byte-identically instead of appending duplicates — the
same replay-idempotence contract as MaterializedAgg.refresh /
NCAStore.load_batch (T6), expressed through Spark's native
``partitionOverwriteMode=dynamic`` instead of a version log.

Scope: batch-vs-corpus dedup. Duplicates WITHIN one micro-batch are
not folded (both copies probe the pre-batch index); compose with
``minhash_lsh_pairs`` on the batch when intra-batch dups matter —
at real ingest rates a micro-batch is small enough that either
choice is cheap.

The signature-parameter sidecar (``_band_meta.json``) is written on
first use and validated on every later run via ``load_band_index``
— a parameter drift between runs fails loudly instead of silently
missing every collision.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.operators.dedup import (
    DEFAULT_BANDS,
    DEFAULT_NUM_HASHES,
    band_buckets,
    load_band_index,
    lsh_probe_new,
)

VERDICT_SCHEMA = "doc_id long, matched_doc long, is_dup boolean, epoch long"


def _write_epoch(df: DataFrame, path: str, epoch_id: int) -> None:
    """Idempotent epoch write: dynamic overwrite of epoch=<id> only."""
    (
        df.withColumn("epoch", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(path)
    )


def stream_probe_dedup(
    docs_stream: DataFrame,
    index_path: str,
    corpus_path: str,
    verdicts_path: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_n: int = 3,
    verify_threshold: float | None = 0.5,
    available_now: bool = True,
) -> None:
    """Run the dedup-at-ingest stream. ``index_path`` /
    ``corpus_path`` / ``verdicts_path`` are epoch-partitioned
    parquet tables this function owns; they may start empty."""
    meta_path = os.path.join(index_path, "_band_meta.json")

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).localCheckpoint()
        # probe only when index DATA exists — the meta sidecar alone
        # (a crash between meta and first epoch write) must not send
        # us to an unreadable empty table
        has_index = os.path.exists(index_path) and any(
            d.startswith("epoch=") for d in os.listdir(index_path)
        )
        if has_index:
            idx = load_band_index(
                spark, index_path, num_hashes, bands, shingle_n
            )
            corpus = spark.read.parquet(corpus_path).select("doc_id", "text")
            verdicts = lsh_probe_new(
                corpus,
                batch,
                num_hashes=num_hashes,
                bands=bands,
                shingle_n=shingle_n,
                index=idx,
                verify_threshold=verify_threshold,
            )
        else:
            # first epoch: empty corpus, everything is novel
            os.makedirs(index_path, exist_ok=True)
            if not os.path.exists(meta_path):
                with open(meta_path, "w", encoding="utf-8") as fh:
                    json.dump(
                        {
                            "id_col": "doc_id",
                            "num_hashes": num_hashes,
                            "bands": bands,
                            "shingle_n": shingle_n,
                        },
                        fh,
                    )
            verdicts = batch.select(
                "doc_id",
                F.lit(None).cast("long").alias("matched_doc"),
                F.lit(False).alias("is_dup"),
            )
        verdicts = verdicts.localCheckpoint()  # probe once, fan to 3 writes
        _write_epoch(verdicts, verdicts_path, epoch_id)
        novel = batch.join(
            verdicts.where(~F.col("is_dup")).select("doc_id"), "doc_id"
        ).localCheckpoint()
        _write_epoch(
            band_buckets(novel, "text", "doc_id", num_hashes, bands, shingle_n),
            index_path,
            epoch_id,
        )
        _write_epoch(novel, corpus_path, epoch_id)

    writer = docs_stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:  # pragma: no cover - long-running mode
        writer.start()


def read_verdicts(spark, verdicts_path: str) -> DataFrame:
    """All verdict rows so far, ordered columns per VERDICT_SCHEMA."""
    return spark.read.parquet(verdicts_path).select(
        "doc_id", "matched_doc", "is_dup", "epoch"
    )
