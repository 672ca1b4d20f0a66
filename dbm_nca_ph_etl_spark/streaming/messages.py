"""Queue-message codec (SURVEY §2.1 S15/S16, §2.8 F12).

The reference serializes Pydantic models to JSON SQS bodies
(sqs_queue.py:17-26) and handlers parse them back
(handlers/orchestrator.py:34-39, worker.py:51-57). The engine's
equivalent is a struct⇄JSON column codec: ``to_json(struct(*))`` on
the send side, ``from_json(body, schema)`` on the receive side — both
codegen'd JVM expressions, valid on batch AND streaming DataFrames
(a Kafka sink/source deployment uses exactly these two lines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RELEASE_MSG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("page_count", T.IntegerType()),
        T.StructField("file_meta_created_at", T.StringType()),
        T.StructField("file_meta_modified_at", T.StringType()),
    ]
)

# ReleaseBatch nests its Release (release_batch.py:5-10)
RELEASE_BATCH_MSG_SCHEMA = T.StructType(
    [
        T.StructField("batch_num", T.IntegerType()),
        T.StructField("release", RELEASE_MSG_SCHEMA),
        T.StructField("start_page_num", T.IntegerType()),
        T.StructField("end_page_num", T.IntegerType()),
    ]
)


def encode_messages(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """rows → one-column ``body`` JSON frame (queue send side)."""
    struct = F.struct(*cols) if cols else F.struct(*df.columns)
    return df.select(F.to_json(struct).alias("body"))


def decode_messages(df: DataFrame, schema: T.StructType) -> DataFrame:
    """``body`` JSON frame → typed rows (queue receive side)."""
    return df.select(F.from_json(F.col("body"), schema).alias("m")).select("m.*")
