"""Release discovery & derivation transforms (ingestion edge).

Reference parity:
- link filter  — bs4_scraper.py:18-37 (case-insensitive ``.*NCA.*\\.pdf$``)
- derivation   — bs4_scraper.py:44-63 (filename/year/id columns,
  ``UPDATED``→current year, drop null-year)
- year filter  — bs4_scraper.py:33-34 (``year >= oldest_year``)
- sort         — bs4_scraper.py:36 (year ascending)
- page batching — release_batcher.py:14-46 + constants.py:9
  (``BATCH_SIZE=10`` page ranges, ``batch_num`` starting at 1)

All pure column expressions — a 100 TB crawl manifest (billions of
candidate links) runs this as one codegen'd projection+filter with
zero shuffles; the sort only happens if the caller asks for it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NCA_PDF_PATTERN = r"(?i).*NCA.*\.pdf$"
DEFAULT_BATCH_SIZE = 10  # reference constants.py:9


def filter_nca_links(links: DataFrame, url_col: str = "url") -> DataFrame:
    """Keep only links that look like NCA PDF releases
    (bs4_scraper.py:25 — case-insensitive regex on the href)."""
    return links.filter(F.col(url_col).rlike(NCA_PDF_PATTERN))


def derive_releases(
    links: DataFrame,
    *,
    current_year: int | Column | None = None,
    oldest_year: int = 2024,
) -> DataFrame:
    """(url, title) → release rows, replicating bs4_scraper.py:44-63.

    ``current_year`` stamps ``UPDATED`` files; pass an int for
    deterministic replays (tests/oracles), default is
    ``year(current_date())`` like the reference's ``datetime.now()``.
    """
    if current_year is None:
        current_year = F.year(F.current_date())
    cy = F.lit(current_year) if isinstance(current_year, int) else current_year

    filename = F.element_at(F.split(F.col("url"), "/"), -1)
    year_match = F.regexp_extract(filename, r"(\d{4})", 1)
    year = (
        F.when(F.upper(filename).contains("UPDATED"), cy)
        .when(year_match != "", year_match.cast("int"))
        .otherwise(F.lit(None).cast("int"))
    )
    return (
        filter_nca_links(links)
        .select(
            F.col("title"),
            F.col("url"),
            filename.alias("filename"),
            year.alias("year"),
        )
        .filter(F.col("year").isNotNull())
        .filter(F.col("year") >= F.lit(oldest_year))
        .withColumn("id", F.concat(F.lit("id_"), F.col("year").cast("string")))
    )


def plan_page_batches(
    releases: DataFrame,
    batch_size: int = DEFAULT_BATCH_SIZE,
    page_count_col: str = "page_count",
) -> DataFrame:
    """Fan a release out into page-range batch descriptors
    (release_batcher.py:21-31): ranges ``[start, min(start+size-1, n)]``
    with 1-based ``batch_num``.

    ``explode(sequence(...))`` — the task fan-out the reference does
    with SQS messages becomes partition fan-out: at 100 TB each
    (release, page-range) row is one Spark task's worth of extraction
    work, scheduled by Spark instead of Lambda.
    """
    n = F.col(page_count_col)
    start = F.col("start_page_num")
    return (
        releases.filter(n >= 1)
        .withColumn(
            "start_page_num",
            F.explode(F.sequence(F.lit(1), n, F.lit(batch_size))),
        )
        .withColumn(
            "end_page_num", F.least(start + F.lit(batch_size - 1), n)
        )
        .withColumn(
            "batch_num",
            ((start - 1) / F.lit(batch_size)).cast("int") + F.lit(1),
        )
    )
