"""XML lake IO (Spark 4 native XML — spark-xml merged upstream).

Feeds/registries still arrive as XML (vendor catalogs, sitemap dumps,
PubMed/arXiv metadata). Spark 4 ships the former Databricks spark-xml
as a built-in ``format("xml")``; this seam pins the engine's usage
conventions so every caller gets the scale-safe shape:

- **Explicit schema, always.** XML inference reads and parses the
  whole dataset once just to guess types — a full extra 100 TB pass,
  and inferred types drift with the sample (a column of "01" infers
  BIGINT until a "01A" appears in some other shard). Callers pass the
  schema; the reader fails loudly without one.
- **Integer-safe payloads.** XML is text; floats round-trip through
  decimal formatting, which is NOT bit-stable across writers. The
  convention (as everywhere in this repo): money/ratios travel as
  integer micro-units, never as formatted doubles.
- **One row element per record** (``rowTag``): the streaming XML
  tokenizer then splits records without loading a document DOM —
  files chunk by row boundaries like any text source, so a single
  giant file still parallelizes across tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_xml(df: DataFrame, path: str, row_tag: str = "row") -> None:
    """Write ``df`` as XML, one ``<row_tag>`` element per record."""
    (
        df.write.mode("overwrite")
        .format("xml")
        .option("rootTag", row_tag + "s")
        .option("rowTag", row_tag)
        .save(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    row_tag: str = "row",
) -> DataFrame:
    """Read XML with a REQUIRED explicit schema (no inference pass)."""
    if schema is None:  # pragma: no cover - signature guard
        raise ValueError("read_xml requires an explicit schema")
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .schema(schema)
        .load(path)
    )
