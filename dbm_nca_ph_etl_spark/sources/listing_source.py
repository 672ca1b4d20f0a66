"""``nca_listing`` — a Spark Python DataSource for release discovery.

The reference's scraper stage (bs4_scraper.py:18-37: GET the listing
page, select ``<a>`` tags whose href matches the NCA-PDF pattern) is
a *source*, not a transform — so the engine exposes it through
Spark 4's Python DataSource API as a first-class pluggable format:

    spark.dataSource.register(NCAListingDataSource)
    links = (spark.read.format("nca_listing")
             .option("path", "/lake/listings")   # dir or one file
             .load())                            # (title, url, page_file)

The source emits RAW anchor links; derivation + year filtering stay
in ``releases.derive_releases`` (same split as the reference: scrape
then ``_create_release``). Reading is partition-parallel — one input
partition per listing file, so a crawl with thousands of archived
listing snapshots fans out across the cluster instead of parsing on
the driver (the reference parses one page in one Lambda).

Storage: paths resolve through the ``sources/lakefs`` seam — bare
paths enumerate/read via the stdlib (local mode, NFS), URI paths
(``s3://``, ``gs://``, ``hdfs://``, ``file://``) via ``pyarrow.fs``,
which is available inside executor Python workers (the JVM Hadoop
``FileSystem`` is driver-only — no py4j bridge exists where
``read()`` runs). Enumeration happens once on the driver in
``partitions()``; each task re-resolves its one file from the path
string, so nothing stateful is pickled. This mirrors the
reference's storage-adapter split (s3_storage.py:25-38 vs
local_storage.py:19-26) and keeps the partition-per-file fan-out on
real lake storage.

Anchors are parsed with a conservative regex over ``<a ... href>``
tags (the fixture-friendly subset of what bs4 accepts); the fetch
itself is out of scope (SURVEY S3 — listings are staged to the lake
first, same pattern as the PDF blobs).
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from dbm_nca_ph_etl_spark.sources.lakefs import get_fs

_ANCHOR = re.compile(
    r"<a\b[^>]*\bhref\s*=\s*[\"']([^\"']+)[\"'][^>]*>(.*?)</a>",
    re.IGNORECASE | re.DOTALL,
)
_TAGS = re.compile(r"<[^>]+>")

LISTING_SCHEMA = "title string, url string, page_file string"


class _ListingPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class NCAListingDataSource(DataSource):
    """Format name ``nca_listing``; option ``path`` points at one
    HTML file or a directory of them (``*.html`` / ``*.htm``)."""

    @classmethod
    def name(cls) -> str:
        return "nca_listing"

    def schema(self) -> str:
        return LISTING_SCHEMA

    def reader(self, schema) -> "NCAListingReader":
        return NCAListingReader(self.options)


class NCAListingReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("nca_listing requires the 'path' option")
        self._path = path

    def partitions(self):
        files = get_fs(self._path).ls(self._path, suffixes=(".html", ".htm"))
        return [_ListingPartition(f) for f in files]

    def read(self, partition: _ListingPartition) -> Iterator[tuple]:
        # executor side: re-resolve the filesystem from the path
        # string (pyarrow for URIs — the JVM Hadoop FS has no py4j
        # bridge here)
        html = get_fs(partition.path).read_bytes(partition.path).decode(
            "utf-8", errors="replace"
        )
        for href, inner in _ANCHOR.findall(html):
            title = re.sub(r"\s+", " ", _TAGS.sub("", inner)).strip()
            yield (title, href.strip(), partition.path)
