"""PDF table source — the engine's one genuine Python-UDF scan.

Reference parity (the extraction stage of the pipeline):
- S8 table extraction   — pdf_parser.py:52-72 (pdfplumber
  ``extract_table`` per page → rows of nullable strings)
- S9 adaptive columns   — pdf_parser.py:79-96 (vertical lines from
  header-word x-positions on page 0, constant fallback)
- S5 metadata scan      — pdf_parser.py:23-32 (/CreationDate, /ModDate)
- S6 page count         — pdf_parser.py:34-36
- S7 page split         — pdf_parser.py:38-50 (dead code in the
  reference; here subsumed by per-page extraction)
- T2 page-batch fan-out — release_batcher.py:14-46 via
  ``sources.releases.plan_page_batches``

Architecture (Spark-first, NOT the reference's Lambda topology):
``spark.read.format("binaryFile")`` (or any DataFrame carrying
``(release_id, content: binary)``) → a page-count pass → explode into
(release_id, page-range) batch rows → ``mapInPandas`` extraction,
Arrow-batched, emitting the engine's line-ordered RAW_CELLS_SCHEMA
``(release_id, page_num, row_idx, cells)``. Each batch row is one
task-sized unit of work — Spark's scheduler replaces SQS fan-out, and
``repartition`` on the batch rows spreads a skewed 10k-page PDF
across the cluster exactly like the reference's 10-page Lambda
batches (BATCH_SIZE=10, constants.py:9).

The parser itself is pluggable (the reference's ``ParserProvider``
Protocol, src/core/interfaces/parser.py:7-27):

- :class:`~dbm_nca_ph_etl_spark.sources.minipdf.MiniPdfParser` — the
  real parser: a dependency-free stdlib PDF reader implementing the
  reference's exact geometry (explicit vertical cuts from header-word
  x0s + text-derived rows, :func:`pdfplumber_table_settings`),
  golden-tested on the reference's own ``UPDATED_NCA.PDF`` fixture.
- :class:`FakeTableParser` — deterministic parser of the engine's own
  trivial ``FAKEPDF`` byte format, used by tests to exercise ALL the
  Spark-side plumbing (schemas, page batching, Arrow batch shapes,
  order preservation) with zero native deps.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Protocol

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbm_nca_ph_etl_spark.nca.schemas import RAW_CELLS_SCHEMA, TABLE_COLUMNS
from dbm_nca_ph_etl_spark.sources.releases import (
    DEFAULT_BATCH_SIZE,
    plan_page_batches,
)

# -----------------------------------------------------------------------
# Parser providers
# -----------------------------------------------------------------------


class TableParser(Protocol):
    """The engine's ParserProvider (reference parser.py:7-27)."""

    def page_count(self, content: bytes) -> int: ...

    def metadata(self, content: bytes) -> tuple[str | None, str | None]:
        """(created_at, modified_at) strings, None when absent."""
        ...

    def extract_page(self, content: bytes, page_num: int) -> list[list[str | None]]:
        """1-based page -> rows of nullable cell strings."""
        ...


# Reference constants.py:12-22 — measured column x-positions of the
# DBM NCA listing layout. In the reference this constant is dead
# config (table_settings starts with [] and page-0 detection always
# overwrites it, pdf_parser.py:13-20,96); we keep it as the fallback
# when a PDF yields NO header words at all, a documented divergence:
# the reference would hand pdfplumber a single right-edge line and
# emit a one-column table, which downstream cleaning can do nothing
# with.
REFERENCE_VERT_LINES = [
    19.439992224,
    133.439946624,
    182.159927136,
    275.9998896,
    389.15984433600005,
    500.159799936,
    638.159744736,
    737.9997048,
    1100.00000,
]


def detect_vert_lines(
    words: list[dict], page_width: float
) -> list[float]:
    """Adaptive column detection — straight port of reference
    pdf_parser.py:79-96 semantics, pure-Python so it is unit-testable
    without pdfplumber:

    - for each TABLE_COLUMNS phrase, scan the page-0 word stream for
      the underscore-joined lowercase match and take the FIRST word's
      exact ``x0`` (the reference uses ``x0``, not ``x0 - 1``);
    - keep however many phrases were found (partial headers are used
      as-is, no all-or-nothing reset);
    - always append ``page_width - 1`` as the right edge.

    Only when zero phrases match do we fall back to the reference's
    measured REFERENCE_VERT_LINES (see its docstring for why this
    diverges).
    """
    texts = [w["text"] for w in words]
    vert_lines: list[float] = []
    for phrase in TABLE_COLUMNS:
        phrase_words = phrase.lower().split("_")
        n = len(phrase_words)
        for i in range(len(texts) - n + 1):
            if "_".join(texts[i : i + n]).lower() == phrase:
                vert_lines.append(words[i]["x0"])
                break
    if not vert_lines:
        return list(REFERENCE_VERT_LINES)
    vert_lines.append(page_width - 1)
    return vert_lines


class LayoutCache:
    """Per-FILE layout memo for parser instances reused across a task.

    A ``mapInPandas`` extract function closes over ONE parser
    instance, which then sees every PDF its task processes; caching
    detection in an instance attribute (the round-2 bug) silently
    applied the first file's column x-positions to all later files.
    The reference re-detects on page 0 of EVERY extract call
    (pdf_parser.py:58-60) — this cache keys by content digest so we
    keep that per-file semantics while still detecting once per file
    instead of once per page.
    """

    def __init__(self, max_entries: int = 8):
        self._max = max_entries
        self._layouts: dict[bytes, list[float]] = {}
        self.detect_calls = 0  # test observability

    def get(self, content: bytes, compute) -> list[float]:
        import hashlib

        key = hashlib.md5(content).digest()
        if key not in self._layouts:
            self.detect_calls += 1
            self._layouts[key] = compute()
            while len(self._layouts) > self._max:
                self._layouts.pop(next(iter(self._layouts)))
        return self._layouts[key]


def pdfplumber_table_settings(vert_lines: list[float]) -> dict:
    """The exact ``extract_table`` settings the reference feeds
    pdfplumber (pdf_parser.py:58-66), kept as the EXTRACTION CONTRACT
    this engine implements: ``minipdf`` realizes the same semantics
    natively (explicit vertical cuts + text-derived horizontal rows,
    ``snap_y_tolerance`` line grouping), golden-tested on the
    reference's own fixture. Pinned by tests so the contract can't
    silently drift from what the reference measured."""
    return {
        "vertical_strategy": "explicit",
        "explicit_vertical_lines": vert_lines,
        "horizontal_strategy": "text",
        "intersection_tolerance": 1000,
        "snap_y_tolerance": 3,
    }


FAKE_MAGIC = b"FAKEPDF\n"
_PAGE_SEP = "\x0c"  # form feed between pages
_CELL_SEP = "|"
_NULL_CELL = "\\N"


def make_fake_pdf(
    pages: list[list[list[str | None]]],
    created_at: str | None = None,
    modified_at: str | None = None,
) -> bytes:
    """Serialize page->rows->cells into the FAKEPDF byte format
    (tests' stand-in for a real PDF binary)."""
    header = f"meta:{created_at or ''},{modified_at or ''}\n"
    body = _PAGE_SEP.join(
        "\n".join(
            _CELL_SEP.join(_NULL_CELL if c is None else c for c in row) for row in page
        )
        for page in pages
    )
    return FAKE_MAGIC + header.encode() + body.encode()


class FakeTableParser:
    """Deterministic TableParser over the FAKEPDF format."""

    def _pages(self, content: bytes) -> list[str]:
        if not content.startswith(FAKE_MAGIC):
            raise ValueError("not a FAKEPDF blob")
        body = content[len(FAKE_MAGIC) :].decode()
        return body.split("\n", 1)[1].split(_PAGE_SEP) if "\n" in body else []

    def page_count(self, content: bytes) -> int:
        return len(self._pages(content))

    def metadata(self, content: bytes) -> tuple[str | None, str | None]:
        meta_line = content[len(FAKE_MAGIC) :].decode().split("\n", 1)[0]
        created, _, modified = meta_line.removeprefix("meta:").partition(",")
        return created or None, modified or None

    def extract_page(self, content: bytes, page_num: int) -> list[list[str | None]]:
        page = self._pages(content)[page_num - 1]
        if not page:
            return []
        return [
            [None if c == _NULL_CELL else c for c in line.split(_CELL_SEP)]
            for line in page.split("\n")
        ]


class SniffingParser:
    """Per-blob dispatch: FAKEPDF blobs → :class:`FakeTableParser`,
    real ``%PDF`` blobs → the dependency-free
    :class:`~dbm_nca_ph_etl_spark.sources.minipdf.MiniPdfParser`.
    Lets one ``extract_raw_cells`` pass handle a mixed lake and makes
    ``auto`` mode actually parse real PDFs in this container."""

    def __init__(self) -> None:
        self._fake = FakeTableParser()
        self._real: TableParser | None = None

    def _for(self, content: bytes) -> TableParser:
        if content.startswith(FAKE_MAGIC):
            return self._fake
        if self._real is None:
            from dbm_nca_ph_etl_spark.sources.minipdf import MiniPdfParser

            self._real = MiniPdfParser()
        return self._real

    def page_count(self, content: bytes) -> int:
        return self._for(content).page_count(content)

    def metadata(self, content: bytes) -> tuple[str | None, str | None]:
        return self._for(content).metadata(content)

    def extract_page(self, content: bytes, page_num: int) -> list[list[str | None]]:
        return self._for(content).extract_page(content, page_num)


def get_parser(name: str = "auto") -> TableParser:
    """'minipdf' | 'fake' | 'auto' (per-blob sniffing: FAKEPDF →
    fake; real PDFs → the stdlib-only minipdf extractor)."""
    if name == "fake":
        return FakeTableParser()
    if name == "minipdf":
        from dbm_nca_ph_etl_spark.sources.minipdf import MiniPdfParser

        return MiniPdfParser()
    return SniffingParser()


# -----------------------------------------------------------------------
# DataFrame-level source operators
# -----------------------------------------------------------------------


def read_pdf_binaries(spark, path_glob: str, release_id_from_name: bool = True) -> DataFrame:
    """S3/S4 — scan a lake directory of PDFs as binary rows.

    ``binaryFile`` gives (path, modificationTime, length, content);
    the filename (sans extension) becomes release_id, matching the
    reference's filename-keyed storage (local_storage.py:19-34).
    """
    df = spark.read.format("binaryFile").load(path_glob)
    rid = F.regexp_replace(
        F.element_at(F.split(F.col("path"), "/"), -1), r"\.[^.]*$", ""
    )
    if release_id_from_name:
        df = df.withColumn("release_id", rid)
    return df


def with_pdf_info(files: DataFrame, parser: TableParser) -> DataFrame:
    """S5/S6 — add page_count + file metadata via one Arrow-batched
    pass over the binary column (pdf_parser.py:23-36)."""

    def info(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = b.drop(columns=["content"])
            out["page_count"] = [parser.page_count(c) for c in b["content"]]
            metas = [parser.metadata(c) for c in b["content"]]
            out["file_meta_created_at"] = [m[0] for m in metas]
            out["file_meta_modified_at"] = [m[1] for m in metas]
            yield out

    base = [f for f in files.schema.fields if f.name != "content"]
    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in base)
        + ", page_count int, file_meta_created_at string, file_meta_modified_at string"
    )
    return files.mapInPandas(info, schema=schema)


def with_parse_status(files: DataFrame, parser: TableParser) -> DataFrame:
    """Triage scan: (release_id, parse_ok, parse_error) per blob.

    The reference's failure route is per-Lambda: a worker that throws
    sends its batch to the DLQ for redrive (worker.py + SQS redrive
    policy). The batch-engine twin is this cheap classification pass —
    run it first, send the failed rows to a quarantine table (the DLQ),
    and extract the ok rows with the default strict mode.
    """

    def status(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ok, err = [], []
            for c in b["content"]:
                try:
                    parser.page_count(bytes(c))
                    ok.append(True)
                    err.append(None)
                except Exception as e:  # noqa: BLE001 - classification pass
                    ok.append(False)
                    err.append(f"{type(e).__name__}: {e}")
            out = b.drop(columns=["content"])
            out["parse_ok"] = ok
            out["parse_error"] = err
            yield out

    base = [f for f in files.schema.fields if f.name != "content"]
    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in base)
        + ", parse_ok boolean, parse_error string"
    )
    return files.mapInPandas(status, schema=schema)


def extract_raw_cells(
    files: DataFrame,
    parser: TableParser,
    batch_size: int = DEFAULT_BATCH_SIZE,
    on_error: str = "fail",
) -> DataFrame:
    """S8/T2 — (release_id, content) → line-ordered RAW_CELLS_SCHEMA.

    Two-stage plan: a page-count pass, then explode into page-range
    batch rows (the reference's SQS fan-out unit), repartitioned so a
    single huge PDF spreads across executors, then per-batch
    ``mapInPandas`` extraction. row_idx is the 0-based line index
    within its page; document order is (page_num, row_idx) — the
    engine's explicit-order convention (SURVEY §2.6 O5).

    Scale note: ``content`` is duplicated per batch row through the
    explode (same bytes the reference re-downloads per Lambda) —
    fine for small in-memory blobs (tests, streaming payloads). For
    lake deployments use :func:`extract_raw_cells_from_paths`, which
    ships only paths through the shuffle and re-reads blobs
    task-side.

    ``on_error``: ``"fail"`` (default) propagates parser exceptions —
    one corrupt blob fails the job, correctness-first; ``"skip"``
    drops unparseable files (and pages that throw) silently — pair it
    with :func:`with_parse_status` to quarantine the bad blobs first
    (the reference's DLQ redrive, T1).
    """
    _check_on_error(on_error)
    if "page_count" in files.columns:
        # caller already ran the metadata pass (with_pdf_info) — don't
        # parse every blob a second time just to count pages
        with_count = files.select("release_id", "content", "page_count")
    else:
        with_count = files.select("release_id", "content").mapInPandas(
            _page_count_fn(parser, on_error),
            schema="release_id string, content binary, page_count int",
        )
    if on_error == "skip":
        with_count = with_count.where(F.col("page_count") >= 0)
    batches = plan_page_batches(with_count, batch_size=batch_size)
    skip = on_error == "skip"

    def extract(batches_iter: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches_iter:
            out: list[tuple[str, int, int, list[str | None]]] = []
            for rid, content, start, end in zip(
                b["release_id"], b["content"], b["start_page_num"], b["end_page_num"]
            ):
                try:
                    for page_num in range(int(start), int(end) + 1):
                        for row_idx, cells in enumerate(
                            parser.extract_page(bytes(content), page_num)
                        ):
                            out.append((rid, page_num, row_idx, cells))
                except Exception:  # noqa: BLE001
                    if not skip:
                        raise
            yield pd.DataFrame(
                out, columns=["release_id", "page_num", "row_idx", "cells"]
            )

    return (
        batches.repartition("release_id", "batch_num")
        .mapInPandas(extract, schema=RAW_CELLS_SCHEMA)
    )


def _check_on_error(on_error: str) -> None:
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")


def _page_count_fn(parser: TableParser, on_error: str = "fail"):
    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            b = b.copy()
            counts = []
            for c in b["content"]:
                try:
                    counts.append(parser.page_count(bytes(c)))
                except Exception:  # noqa: BLE001
                    if on_error != "skip":
                        raise
                    counts.append(-1)  # sentinel: filtered out upstream
            b["page_count"] = counts
            yield b

    return fn


def local_file_loader(path: str) -> bytes:
    """Default blob loader for :func:`extract_raw_cells_from_paths` —
    handles the ``file:`` scheme ``binaryFile`` puts on local paths.
    Swap in an object-store client for lake deployments (the
    reference's Storage Protocol, src/core/interfaces/storage.py)."""
    if path.startswith("file://"):
        path = path[7:]
    elif path.startswith("file:"):
        path = path[5:]
    with open(path, "rb") as f:
        return f.read()


def extract_raw_cells_from_paths(
    files: DataFrame,
    parser: TableParser,
    batch_size: int = DEFAULT_BATCH_SIZE,
    loader=local_file_loader,
) -> DataFrame:
    """S8/T2, path-loading variant — the 100 TB shape of
    :func:`extract_raw_cells`.

    ``extract_raw_cells`` ships the PDF ``content`` bytes through the
    batch explode + repartition exchange once per page-range row — a
    10 GB PDF in 100 batches moves 1 TB through the shuffle. Here
    batch rows carry only ``(release_id, path, page range)`` (bytes
    per row, like the reference's SQS messages, release_batch.py:5-10)
    and each task re-reads the blob from storage via ``loader`` — the
    same trade the reference makes per Lambda (handlers/worker.py:
    60-62). A per-task memo keeps the last few blobs so the ~⌈pages/
    batch_size⌉ batches of one file landing in one task re-read it
    once (the reference's FileBytesMemoLoader, S17,
    file_stream_memo_loader.py:13-26).

    Input needs (release_id, path) — ``read_pdf_binaries`` output
    qualifies; ``content`` is pruned away (the plan test asserts no
    binary column crosses the exchange).
    """

    def count_pages(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            b = b.copy()
            b["page_count"] = [
                parser.page_count(loader(p)) for p in b["path"]
            ]
            yield b

    if "page_count" in files.columns:
        with_count = files.select("release_id", "path", "page_count")
    else:
        with_count = files.select("release_id", "path").mapInPandas(
            count_pages, schema="release_id string, path string, page_count int"
        )
    batches = plan_page_batches(with_count, batch_size=batch_size)

    def extract(batches_iter: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, bytes] = {}

        def blob(path: str) -> bytes:
            if path not in memo:
                while len(memo) >= 4:
                    memo.pop(next(iter(memo)))
                memo[path] = loader(path)
            return memo[path]

        for b in batches_iter:
            out: list[tuple[str, int, int, list[str | None]]] = []
            for rid, path, start, end in zip(
                b["release_id"], b["path"], b["start_page_num"], b["end_page_num"]
            ):
                content = blob(path)
                for page_num in range(int(start), int(end) + 1):
                    for row_idx, cells in enumerate(
                        parser.extract_page(content, page_num)
                    ):
                        out.append((rid, page_num, row_idx, cells))
            yield pd.DataFrame(
                out, columns=["release_id", "page_num", "row_idx", "cells"]
            )

    return (
        batches.repartition("release_id", "batch_num")
        .mapInPandas(extract, schema=RAW_CELLS_SCHEMA)
    )
