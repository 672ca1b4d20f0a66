"""Text-format sources/sinks: CSV and JSONL (newline-delimited JSON).

The reference ingests HTML/PDF and emits rows to Postgres; a lake
engine additionally needs the interchange formats ETL actually moves:
CSV (header, quoted, escaped) and JSONL (one document per line — the
lingua franca of LLM corpus pipelines).

Conventions:
- **Explicit schema always** (`schema=` required on read). Schema
  inference is a full extra pass over the data at 100 TB and can
  silently flip a column's type between loads; production reads pin
  the contract. (`infer=True` exists for exploration only.)
- Writes are directory-style (one part file per task) — the same
  layout every Spark sink uses, so a 1000-executor write needs no
  driver funnel. Readers accept the directory.
- JSONL: `lineSep="\n"`, UTF-8, `ignoreNullFields=False` on write so
  null columns survive the round trip (dropped null keys read back
  as missing → schema drift).
- CSV: `header=True`, RFC-4180 quoting (`escape='"'`), explicit
  `nullValue=""` symmetry on both sides, timestamps as ISO-8601
  (`timestampNTZFormat`) so values survive independent of session
  timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_CSV_OPTS = {
    "header": "true",
    "escape": '"',
    "nullValue": "",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
}

_JSON_OPTS = {
    "lineSep": "\n",
    "ignoreNullFields": "false",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
}


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).options(**_CSV_OPTS).csv(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str | None = None, *, infer: bool = False
) -> DataFrame:
    if schema is None and not infer:
        raise ValueError("read_csv requires an explicit schema (or infer=True for exploration)")
    # multiLine: quoted fields may embed newlines (RFC 4180); without
    # it the parser treats every physical line as a record. Cost: a
    # multiLine file can't be split mid-file — at 100 TB keep many
    # part files (the directory layout already does) so parallelism
    # comes from file count, not intra-file splits.
    reader = spark.read.options(**_CSV_OPTS).option("multiLine", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).options(**_JSON_OPTS).json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str | None = None, *, infer: bool = False
) -> DataFrame:
    if schema is None and not infer:
        raise ValueError("read_jsonl requires an explicit schema (or infer=True for exploration)")
    reader = spark.read.options(**_JSON_OPTS)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


_ORC_OPTS = {
    # zlib is ORC's universal default; snappy/zstd are drop-ins
    "compression": "zlib",
}


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (columnar interchange with the Hive/Trino world).

    Same directory-style layout as the parquet sinks; ORC carries
    min/max/bloom indexes per stripe, so downstream predicate
    pushdown works like parquet row-group pruning. Binary and
    TIMESTAMP_NTZ columns round-trip losslessly (tested) — relevant
    for multimodal payload interchange.
    """
    df.write.mode(mode).options(**_ORC_OPTS).orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """ORC source. Schema optional: unlike CSV/JSON, ORC files embed
    their exact types, so reading without a schema is not an inference
    pass — but passing one still pins the contract against drift."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
