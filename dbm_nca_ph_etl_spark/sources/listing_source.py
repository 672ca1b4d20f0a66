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

Storage constraint: paths are enumerated with ``os.listdir`` on the
driver and opened with plain ``open()`` on executors, so ``path``
must be a LOCAL or SHARED-POSIX directory (local mode, NFS mount) —
object-store / HDFS URIs are NOT resolved. For lake storage, either
stage listing snapshots onto a mounted filesystem first (the same
staging pattern as the PDFs, ``sources/staging.py``) or read the
HTML through ``spark.read.format("binaryFile")`` and parse with a
``mapInPandas`` variant; the partition-per-file fan-out claim holds
only under that shared-filesystem assumption.

Anchors are parsed with a conservative regex over ``<a ... href>``
tags (the fixture-friendly subset of what bs4 accepts); the fetch
itself is out of scope (SURVEY S3 — listings are staged to the lake
first, same pattern as the PDF blobs).
"""

from __future__ import annotations

import os
import re
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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
        p = self._path
        if os.path.isdir(p):
            files = sorted(
                os.path.join(p, f)
                for f in os.listdir(p)
                if f.lower().endswith((".html", ".htm"))
            )
        else:
            files = [p]
        return [_ListingPartition(f) for f in files]

    def read(self, partition: _ListingPartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8", errors="replace") as fh:
            html = fh.read()
        for href, inner in _ANCHOR.findall(html):
            title = re.sub(r"\s+", " ", _TAGS.sub("", inner)).strip()
            yield (title, href.strip(), partition.path)
