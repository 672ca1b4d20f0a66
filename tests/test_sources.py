"""Ingestion-edge tests: release derivation (S1/S2), page batching
(T2/F13), and the PDF table source plumbing (S5-S9) via the
deterministic FAKEPDF parser.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from dbm_nca_ph_etl_spark.nca import clean_raw_rows, promote_header
from dbm_nca_ph_etl_spark.sources.pdf_source import (
    REFERENCE_VERT_LINES,
    FakeTableParser,
    LayoutCache,
    detect_vert_lines,
    extract_raw_cells,
    get_parser,
    make_fake_pdf,
    with_pdf_info,
)
from dbm_nca_ph_etl_spark.sources.releases import (
    derive_releases,
    plan_page_batches,
)

LINKS = [
    ("NCA 2024 listing", "https://dbm.gov.example/releases/NCA_2024.pdf"),
    ("NCA 2023 listing", "https://dbm.gov.example/releases/NCA_2023.pdf"),
    ("Updated NCA", "https://dbm.gov.example/releases/UPDATED_NCA.PDF"),
    ("no year", "https://dbm.gov.example/releases/NCA_LATEST.pdf"),
    ("not a pdf", "https://dbm.gov.example/releases/NCA_2024.html"),
    ("not NCA", "https://dbm.gov.example/releases/budget_2024.pdf"),
    ("lowercase ok", "https://dbm.gov.example/r/nca_2025.pdf"),
]


def links_df(spark):
    return spark.createDataFrame(
        [Row(title=t, url=u) for t, u in LINKS], "title string, url string"
    )


class TestDeriveReleases:
    def test_derivation(self, spark):
        out = derive_releases(
            links_df(spark), current_year=2026, oldest_year=2024
        ).collect()
        by_file = {r.filename: r for r in out}
        # kept: NCA_2024.pdf (2024), UPDATED (→2026), nca_2025.pdf
        assert set(by_file) == {"NCA_2024.pdf", "UPDATED_NCA.PDF", "nca_2025.pdf"}
        assert by_file["NCA_2024.pdf"].year == 2024
        assert by_file["NCA_2024.pdf"].id == "id_2024"
        assert by_file["UPDATED_NCA.PDF"].year == 2026
        assert by_file["nca_2025.pdf"].id == "id_2025"

    def test_oldest_year_filter(self, spark):
        years = {
            r.year
            for r in derive_releases(
                links_df(spark), current_year=2026, oldest_year=2023
            ).collect()
        }
        assert years == {2023, 2024, 2025, 2026}


class TestPlanPageBatches:
    def test_ranges(self, spark):
        rel = spark.createDataFrame(
            [Row(id="a", page_count=23), Row(id="b", page_count=10), Row(id="c", page_count=0)]
        )
        out = plan_page_batches(rel, batch_size=10).collect()
        got = sorted((r.id, r.batch_num, r.start_page_num, r.end_page_num) for r in out)
        assert got == [
            ("a", 1, 1, 10),
            ("a", 2, 11, 20),
            ("a", 3, 21, 23),
            ("b", 1, 1, 10),
        ]


PAGE1 = [
    ["NCA Number", "NCA Type", "Released Date"],
    ["NCA-1", "Regular", "01/15/2024"],
    [None, "wrapped", None],
]
PAGE2 = [
    ["NCA-2", "Special", "02/20/2024"],
]


class TestFakePdf:
    def test_roundtrip(self):
        blob = make_fake_pdf([PAGE1, PAGE2], created_at="D:2024", modified_at="D:2025")
        p = FakeTableParser()
        assert p.page_count(blob) == 2
        assert p.metadata(blob) == ("D:2024", "D:2025")
        assert p.extract_page(blob, 1) == PAGE1
        assert p.extract_page(blob, 2) == PAGE2

    def test_get_parser_sniffs_per_blob(self):
        # auto dispatches per blob: FAKEPDF -> fake codec; real %PDF
        # -> pdfplumber when installed, else the stdlib minipdf
        from dbm_nca_ph_etl_spark.sources.minipdf import MiniPdfParser
        from dbm_nca_ph_etl_spark.sources.pdf_source import SniffingParser

        p = get_parser("auto")
        assert isinstance(p, SniffingParser)
        fake_blob = make_fake_pdf([[["a"]]])
        assert isinstance(p._for(fake_blob), FakeTableParser)
        assert p.page_count(fake_blob) == 1
        assert isinstance(get_parser("minipdf"), MiniPdfParser)


class TestExtractRawCells:
    def files(self, spark):
        rows = [
            Row(release_id="id_2024", content=make_fake_pdf([PAGE1, PAGE2])),
            Row(release_id="id_2025", content=make_fake_pdf([[["only", "row"]]])),
        ]
        return spark.createDataFrame(rows, "release_id string, content binary")

    def test_order_and_content(self, spark):
        out = extract_raw_cells(self.files(spark), FakeTableParser(), batch_size=1)
        got = sorted(
            (r.release_id, r.page_num, r.row_idx, list(r.cells)) for r in out.collect()
        )
        assert got == [
            ("id_2024", 1, 0, PAGE1[0]),
            ("id_2024", 1, 1, PAGE1[1]),
            ("id_2024", 1, 2, PAGE1[2]),
            ("id_2024", 2, 0, PAGE2[0]),
            ("id_2025", 1, 0, [["only", "row"]][0]),
        ]

    def test_with_pdf_info(self, spark):
        out = with_pdf_info(
            spark.createDataFrame(
                [Row(release_id="x", content=make_fake_pdf([PAGE1], "c", "m"))],
                "release_id string, content binary",
            ),
            FakeTableParser(),
        ).collect()[0]
        assert (out.page_count, out.file_meta_created_at, out.file_meta_modified_at) == (
            1,
            "c",
            "m",
        )


class TestEndToEndIngestion:
    def test_pdf_to_clean(self, spark):
        """binary → raw cells → promote_header → cleaner: the whole
        reference worker path (handlers/worker.py:48-117) in one plan."""
        doc = [
            [
                "NCA Number", "NCA Type", "Released Date", "Department",
                "Agency", "Operating Unit", "Amount", "Purpose",
            ],
            ["NCA-7", "Regular", "01/15/2024", "DepEd", None, None, None, "To cover"],
            [None, None, None, None, "AG-1", "OU-1", "1,000.50", None],
            [None, None, None, None, None, None, None, None],
            [None, None, None, None, "AG-2", "OU-2", "2000", None],
        ]
        files = spark.createDataFrame(
            [Row(release_id="id_2024", content=make_fake_pdf([doc]))],
            "release_id string, content binary",
        )
        cells = extract_raw_cells(files, FakeTableParser())
        records, allocations = clean_raw_rows(promote_header(cells))
        rec = records.collect()
        assert len(rec) == 1 and rec[0].nca_number == "NCA-7"
        assert rec[0].released_date == "2024-01-15T00:00:00"
        allocs = sorted(
            (a.agency, a.operating_unit, a.amount) for a in allocations.collect()
        )
        assert allocs == [("AG-1", "OU-1", 1000.5), ("AG-2", "OU-2", 2000.0)]


class TestTextFormats:
    """CSV/JSONL round trips preserve schema, values, and nulls —
    the interchange contract for corpus pipelines."""

    def _sample(self, spark):
        from pyspark.sql import functions as F

        return spark.createDataFrame(
            [
                Row(doc_id=1, text='say "hi",\nnewline', score=1.5, tag=None),
                Row(doc_id=2, text=None, score=None, tag="ok"),
                Row(doc_id=3, text="plain", score=-0.25, tag="x,y"),
            ]
        ).withColumn("ts", F.lit("2024-03-01 10:20:30.123456").cast("timestamp_ntz"))

    def test_csv_roundtrip(self, spark, tmp_path):
        from dbm_nca_ph_etl_spark.sources.formats import read_csv, write_csv

        df = self._sample(spark)
        path = str(tmp_path / "docs_csv")
        write_csv(df, path)
        back = read_csv(spark, path, schema=df.schema)
        assert back.schema == df.schema
        key = lambda r: r.doc_id
        assert sorted(back.collect(), key=key) == sorted(df.collect(), key=key)

    def test_jsonl_roundtrip(self, spark, tmp_path):
        from dbm_nca_ph_etl_spark.sources.formats import read_jsonl, write_jsonl

        df = self._sample(spark)
        path = str(tmp_path / "docs_jsonl")
        write_jsonl(df, path)
        back = read_jsonl(spark, path, schema=df.schema)
        assert back.schema == df.schema
        key = lambda r: r.doc_id
        assert sorted(back.collect(), key=key) == sorted(df.collect(), key=key)

    def test_explicit_schema_required(self, spark, tmp_path):
        import pytest as _pytest

        from dbm_nca_ph_etl_spark.sources.formats import read_csv, read_jsonl

        with _pytest.raises(ValueError):
            read_csv(spark, str(tmp_path))
        with _pytest.raises(ValueError):
            read_jsonl(spark, str(tmp_path))


class TestListingDataSource:
    """The scraper stage as a Spark 4 Python DataSource (S1 —
    bs4_scraper.py:18-37): listing HTML files become a partition-
    parallel relational source; derivation stays in derive_releases."""

    FIXTURE_A = """
    <html><body>
      <ul>
        <li><a href="https://dbm.example/files/NCA_2024.pdf">NCA <b>2024</b></a></li>
        <li><a href='https://dbm.example/files/nca_2023.PDF'>nca 2023</a></li>
        <li><a href="https://dbm.example/files/UPDATED_NCA.pdf">Updated   NCA</a></li>
        <li><a href="https://dbm.example/files/budget_2024.pdf">not an NCA</a></li>
        <li><a href="https://dbm.example/about">about page</a></li>
      </ul>
    </body></html>
    """
    FIXTURE_B = """
    <p><a class="x" href="https://dbm.example/files/NCA_2025.pdf">NCA 2025</a></p>
    """

    @pytest.fixture()
    def listing_dir(self, tmp_path):
        d = tmp_path / "listings"
        d.mkdir()
        (d / "a.html").write_text(self.FIXTURE_A)
        (d / "b.html").write_text(self.FIXTURE_B)
        return str(d)

    def test_reads_anchors_partition_per_file(self, spark, listing_dir):
        from dbm_nca_ph_etl_spark.sources.listing_source import (
            NCAListingDataSource,
        )

        spark.dataSource.register(NCAListingDataSource)
        df = spark.read.format("nca_listing").option("path", listing_dir).load()
        rows = df.collect()
        assert len(rows) == 6  # every anchor, both files
        assert df.rdd.getNumPartitions() == 2  # one per listing file
        by_title = {r.title: r.url for r in rows}
        assert by_title["NCA 2024"] == "https://dbm.example/files/NCA_2024.pdf"
        assert by_title["Updated NCA"].endswith("UPDATED_NCA.pdf")  # ws collapsed

    def test_composes_with_derive_releases(self, spark, listing_dir):
        from dbm_nca_ph_etl_spark.sources.listing_source import (
            NCAListingDataSource,
        )
        from dbm_nca_ph_etl_spark.sources.releases import derive_releases

        spark.dataSource.register(NCAListingDataSource)
        links = (
            spark.read.format("nca_listing").option("path", listing_dir).load()
        )
        rel = derive_releases(links, current_year=2026, oldest_year=2024)
        got = {r.filename: (r.year, r.id) for r in rel.collect()}
        # nca_2023.PDF dropped by year filter; budget/about dropped by
        # the NCA-pdf pattern; UPDATED stamped with current_year
        assert got == {
            "NCA_2024.pdf": (2024, "id_2024"),
            "UPDATED_NCA.pdf": (2026, "id_2026"),
            "NCA_2025.pdf": (2025, "id_2025"),
        }


def _layout_sensitive_parser():
    """Fake parser mimicking MiniPdfParser's per-file adaptive
    layout: 'detected layout' = first cell of the file's page-1
    header row, memoized through the same LayoutCache, and every
    emitted cell is tagged with the layout that was applied — so a
    cross-file cache leak (the round-2 bug) shows up as a wrong tag.
    (Class is defined locally so cloudpickle ships it by value to
    Spark workers, which cannot import the test module.)
    """

    class _LayoutSensitiveParser(FakeTableParser):
        def __init__(self):
            self.cache = LayoutCache()

        def extract_page(self, content, page_num):
            content = bytes(content)
            layout = self.cache.get(
                content, lambda: FakeTableParser.extract_page(self, content, 1)[0][0]
            )
            rows = FakeTableParser.extract_page(self, content, page_num)
            return [
                [None if c is None else f"{c}@{layout}" for c in row] for row in rows
            ]

    return _LayoutSensitiveParser()


class TestAdaptiveLayout:
    """S9 parity: reference pdf_parser.py:79-96 semantics + the
    per-file re-detection contract (pdf_parser.py:58-60)."""

    def test_detect_exact_x0_partial_headers_right_edge(self):
        words = [
            {"text": "NCA", "x0": 19.5},
            {"text": "Number", "x0": 40.0},
            {"text": "NCA", "x0": 133.4},
            {"text": "Type", "x0": 150.0},
            {"text": "Amount", "x0": 638.2},
        ]
        lines = detect_vert_lines(words, page_width=1101.0)
        # exact x0 (no -1), partial header set kept as-is, right edge
        # page_width-1 appended — reference pdf_parser.py:90-96
        assert lines == [19.5, 133.4, 638.2, 1100.0]

    def test_zero_match_falls_back_to_reference_constants(self):
        assert detect_vert_lines([], 500.0) == REFERENCE_VERT_LINES
        assert (
            detect_vert_lines([{"text": "unrelated", "x0": 1.0}], 500.0)
            == REFERENCE_VERT_LINES
        )

    def test_pdfplumber_settings_match_reference(self):
        """pdf_parser.py:13-19 settings, digit-for-digit — the
        optional pdfplumber branch calls the public API with exactly
        this tested dict, so the dead-in-container branch can't
        drift silently."""
        from dbm_nca_ph_etl_spark.sources.pdf_source import (
            pdfplumber_table_settings,
        )

        lines = [19.5, 1100.0]
        assert pdfplumber_table_settings(lines) == {
            "vertical_strategy": "explicit",
            "explicit_vertical_lines": lines,
            "horizontal_strategy": "text",
            "intersection_tolerance": 1000,
            "snap_y_tolerance": 3,
        }

    def test_layout_cache_keys_by_content(self):
        cache = LayoutCache(max_entries=2)
        a = cache.get(b"file-a", lambda: [1.0])
        b = cache.get(b"file-b", lambda: [2.0])
        again = cache.get(b"file-a", lambda: [99.0])
        assert (a, b, again) == ([1.0], [2.0], [1.0])
        assert cache.detect_calls == 2
        cache.get(b"file-c", lambda: [3.0])  # evicts the oldest entry
        assert cache.get(b"file-a", lambda: [4.0]) == [4.0]
        assert cache.detect_calls == 4

    def test_one_parser_instance_two_files(self):
        """One parser instance (as closed over by a mapInPandas task)
        must apply each file's OWN layout — the round-2 instance-attr
        cache applied file A's layout to file B."""
        p = _layout_sensitive_parser()
        pdf_a = make_fake_pdf([[["HA", "r1"], ["a", "b"]], [["a2", None]]])
        pdf_b = make_fake_pdf([[["HB", "r1"], ["c", "d"]]])
        assert p.extract_page(pdf_a, 1)[1][0] == "a@HA"
        assert p.extract_page(pdf_b, 1)[1][0] == "c@HB"
        assert p.extract_page(pdf_a, 2)[0][0] == "a2@HA"  # cached, not re-detected
        assert p.extract_page(pdf_a, 2)[0][1] is None  # nulls untouched
        assert p.cache.detect_calls == 2

    def test_extract_raw_cells_per_file_layouts(self, spark):
        files = spark.createDataFrame(
            [
                Row(
                    release_id="id_a",
                    content=make_fake_pdf([[["HA", "x"], ["1", "2"]], [["3", "4"]]]),
                ),
                Row(release_id="id_b", content=make_fake_pdf([[["HB", "y"], ["5", "6"]]])),
            ],
            "release_id string, content binary",
        ).coalesce(1)
        out = extract_raw_cells(files, _layout_sensitive_parser(), batch_size=1)
        tags = {
            (r.release_id, r.page_num, r.row_idx): [c for c in r.cells]
            for r in out.collect()
        }
        assert tags[("id_a", 1, 1)] == ["1@HA", "2@HA"]
        assert tags[("id_a", 2, 0)] == ["3@HA", "4@HA"]
        assert tags[("id_b", 1, 1)] == ["5@HB", "6@HB"]


class TestStageReleases:
    """S3/S4 — derive → stage (fake HTTP) → read_pdf_binaries round
    trip (reference bs4_scraper.py:39-42 + s3_storage.py:25-38)."""

    def _releases(self, spark):
        links = spark.createDataFrame(
            [
                Row(title="NCA 2024", url="https://dbm.example/f/NCA_2024.pdf"),
                Row(title="NCA 2025", url="https://dbm.example/f/NCA_2025.pdf"),
            ],
            "title string, url string",
        )
        return derive_releases(links, current_year=2026, oldest_year=2024)

    def test_stage_then_scan_round_trip(self, spark, tmp_path):
        from dbm_nca_ph_etl_spark.sources.pdf_source import read_pdf_binaries
        from dbm_nca_ph_etl_spark.sources.staging import stage_releases

        def fake_fetch(url):
            # deterministic per-URL FAKEPDF payload
            name = url.rsplit("/", 1)[-1]
            return make_fake_pdf([[[name, "row"]]], created_at="D:2024")

        dest = str(tmp_path / "lake" / "pdfs")
        status = stage_releases(self._releases(spark), dest, fetcher=fake_fetch)
        got = {r.filename: r for r in status.collect()}
        assert set(got) == {"NCA_2024.pdf", "NCA_2025.pdf"}
        assert all(r.staged and r.error is None and r.n_bytes > 0 for r in got.values())
        assert got["NCA_2024.pdf"].release_id == "id_2024"

        files = read_pdf_binaries(spark, dest)
        parsed = {
            r.release_id: FakeTableParser().extract_page(bytes(r.content), 1)
            for r in files.collect()
        }
        assert parsed == {
            "NCA_2024": [["NCA_2024.pdf", "row"]],
            "NCA_2025": [["NCA_2025.pdf", "row"]],
        }

    def test_idempotent_replay_and_error_capture(self, spark, tmp_path):
        from dbm_nca_ph_etl_spark.sources.staging import stage_releases

        calls = []

        def flaky_fetch(url):
            calls.append(url)
            if "2025" in url:
                raise OSError("boom")
            return make_fake_pdf([[["x"]]])

        dest = str(tmp_path / "lake2")
        first = {
            r.filename: r
            for r in stage_releases(
                self._releases(spark), dest, fetcher=flaky_fetch
            ).collect()
        }
        assert first["NCA_2024.pdf"].staged
        assert not first["NCA_2025.pdf"].staged
        assert "OSError" in first["NCA_2025.pdf"].error

        # replay: staged file skipped (no refetch), failed one retried
        def ok_fetch(url):
            return make_fake_pdf([[["y"]]])

        second = {
            r.filename: r
            for r in stage_releases(
                self._releases(spark), dest, fetcher=ok_fetch
            ).collect()
        }
        assert not second["NCA_2024.pdf"].staged  # skip, already present
        assert second["NCA_2024.pdf"].n_bytes == first["NCA_2024.pdf"].n_bytes
        assert second["NCA_2025.pdf"].staged and second["NCA_2025.pdf"].error is None


class TestExtractFromPaths:
    """Path-loading extract (the 100 TB shape): batch rows carry
    (release_id, path, page range); blobs re-read task-side."""

    def _lake(self, spark, tmp_path):
        lake = tmp_path / "pdf_lake"
        lake.mkdir()
        (lake / "id_2024.pdf").write_bytes(make_fake_pdf([PAGE1, PAGE2]))
        (lake / "id_2025.pdf").write_bytes(make_fake_pdf([[["only", "row"]]]))
        from dbm_nca_ph_etl_spark.sources.pdf_source import read_pdf_binaries

        return read_pdf_binaries(spark, str(lake))

    def test_matches_bytes_variant(self, spark, tmp_path):
        from dbm_nca_ph_etl_spark.sources.pdf_source import (
            extract_raw_cells_from_paths,
        )

        files = self._lake(spark, tmp_path)
        by_path = extract_raw_cells_from_paths(
            files, FakeTableParser(), batch_size=1
        )
        by_bytes = extract_raw_cells(
            files.select("release_id", "content"), FakeTableParser(), batch_size=1
        )
        key = lambda r: (r.release_id, r.page_num, r.row_idx, list(r.cells))
        assert sorted(map(key, by_path.collect())) == sorted(
            map(key, by_bytes.collect())
        )

    def test_no_binary_crosses_the_exchange(self, spark, tmp_path):
        """The whole point: the executed plan must never carry the
        PDF content column — only (release_id, path, page range)
        rows move through the shuffle."""
        from dbm_nca_ph_etl_spark.sources.pdf_source import (
            extract_raw_cells_from_paths,
        )

        out = extract_raw_cells_from_paths(
            self._lake(spark, tmp_path), FakeTableParser(), batch_size=1
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan  # the batch repartition is there
        assert "content" not in plan  # ...but the binary column never is


class TestPageCountReuse:
    def test_precounted_files_skip_reparse(self, spark):
        """A files frame that already carries page_count (with_pdf_info
        output) must not be re-parsed for counting — the parser sees
        each blob only during extraction."""

        def refusing_parser():
            # raises if the count path runs at all — executor-side, so
            # any re-parse fails the whole job, not just an assertion
            class P(FakeTableParser):
                def page_count(self, content):
                    raise AssertionError("page_count re-parsed a pre-counted file")

            return P()

        files = spark.createDataFrame(
            [Row(release_id="id_1", content=make_fake_pdf([PAGE1, PAGE2]), page_count=2)],
            "release_id string, content binary, page_count int",
        )
        out = extract_raw_cells(files, refusing_parser(), batch_size=1)
        assert out.count() == 4  # 3 rows page1 + 1 row page2


class TestQueueDataSink:
    """The queue sink as a Spark 4 Python DataSource writer (S15 —
    sqs_queue.py:17-26): JSONL message files published by two-phase
    commit (task temp files → atomic rename on driver commit)."""

    def _register(self, spark):
        from dbm_nca_ph_etl_spark.sources.queue_sink import NCAQueueDataSource

        spark.dataSource.register(NCAQueueDataSource)

    def test_round_trip_and_atomic_publish(self, spark, tmp_path):
        import os

        self._register(spark)
        q = str(tmp_path / "queue")
        df = spark.createDataFrame(
            [(1, "id_2024", "NCA_2024.pdf"), (2, "id_2025", "UPDATED_NCA.pdf")],
            "batch_num int, release_id string, filename string",
        )
        df.repartition(2).write.format("nca_queue").option("path", q).mode(
            "append"
        ).save()
        files = sorted(os.listdir(q))
        assert files and all(f.startswith("msg-") and f.endswith(".jsonl") for f in files)
        back = spark.read.schema(
            "batch_num int, release_id string, filename string"
        ).json(q)
        got = {tuple(r) for r in back.collect()}
        assert got == {
            (1, "id_2024", "NCA_2024.pdf"),
            (2, "id_2025", "UPDATED_NCA.pdf"),
        }

    def test_second_batch_appends_new_messages(self, spark, tmp_path):
        import os

        self._register(spark)
        q = str(tmp_path / "queue2")
        one = spark.createDataFrame([(1, "a")], "n int, s string")
        two = spark.createDataFrame([(2, "b")], "n int, s string")
        one.write.format("nca_queue").option("path", q).mode("append").save()
        first = set(os.listdir(q))
        two.write.format("nca_queue").option("path", q).mode("append").save()
        assert first < set(os.listdir(q)), "append must not clobber prior messages"
        assert spark.read.schema("n int, s string").json(q).count() == 2

    def test_empty_partitions_publish_nothing(self, spark, tmp_path):
        import os

        self._register(spark)
        q = str(tmp_path / "queue3")
        df = spark.createDataFrame([(1, "a")], "n int, s string").repartition(8)
        df.write.format("nca_queue").option("path", q).mode("append").save()
        files = os.listdir(q)
        assert len(files) == 1, f"empty tasks must not emit message files: {files}"
        assert not any(f.startswith(".tmp") for f in files)

    def test_overwrite_mode_refused(self, spark, tmp_path):
        self._register(spark)
        df = spark.createDataFrame([(1, "a")], "n int, s string")
        with pytest.raises(Exception, match="append-only"):
            df.write.format("nca_queue").option(
                "path", str(tmp_path / "queue4")
            ).mode("overwrite").save()

    def test_feeds_streaming_consumer(self, spark, tmp_path):
        """A batch producer's messages drive a streaming consumer —
        the release-queue topology (T1) with the DataFrame writer as
        the producer."""
        self._register(spark)
        q = str(tmp_path / "queue5")
        spark.createDataFrame(
            [(1, "id_2024"), (2, "id_2025")], "batch_num int, release_id string"
        ).write.format("nca_queue").option("path", q).mode("append").save()
        stream = (
            spark.readStream.schema("batch_num int, release_id string").json(q)
        )
        out = (
            stream.groupBy("release_id").count()
            .writeStream.format("memory").queryName("queue_consume")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        out.awaitTermination()
        got = {
            (r.release_id, r["count"])
            for r in spark.sql("SELECT * FROM queue_consume").collect()
        }
        assert got == {("id_2024", 1), ("id_2025", 1)}

    def test_induced_task_failure_publishes_nothing_then_retry_once(
        self, spark, tmp_path
    ):
        """Kill a task mid-write (exception after rows already hit the
        temp file): no partial message may ever become visible, temps
        are reaped by abort(), and the retry publishes exactly once."""
        import os

        from pyspark.sql import functions as F

        self._register(spark)
        q = str(tmp_path / "queue6")

        @F.udf("int")
        def boom(n):
            if n == 3:
                raise ValueError("induced task failure")
            return n

        poisoned = (
            spark.createDataFrame([(1,), (2,), (3,)], "n int")
            .coalesce(1)
            .withColumn("n", boom("n"))
        )
        with pytest.raises(Exception):
            poisoned.write.format("nca_queue").option("path", q).mode(
                "append"
            ).save()
        leftovers = os.listdir(q)
        assert not any(f.startswith("msg-") for f in leftovers), leftovers
        assert not any(f.startswith(".tmp-") for f in leftovers), leftovers
        assert not any(f.startswith(".manifest-") for f in leftovers), leftovers

        spark.createDataFrame([(1,), (2,), (3,)], "n int").coalesce(1).write.format(
            "nca_queue"
        ).option("path", q).mode("append").save()
        got = [r.n for r in spark.read.schema("n int").json(q).collect()]
        assert sorted(got) == [1, 2, 3], "retry must publish exactly once"

    def test_recover_rolls_interrupted_commit_forward(self, tmp_path):
        """A driver crash between the manifest rename (the commit
        decision) and the last temp rename leaves a half-published
        batch; recover_queue_dir must finish the redo idempotently."""
        import json
        import os

        from dbm_nca_ph_etl_spark.sources.queue_sink import recover_queue_dir

        q = tmp_path / "queue7"
        q.mkdir()
        # rename [0] never ran; rename [1] already completed pre-crash
        (q / ".tmp-deadjob-aaa.jsonl").write_text('{"n": 1}\n')
        (q / "msg-c1-00001.jsonl").write_text('{"n": 2}\n')
        # an orphan temp from a job that died BEFORE its commit
        # decision: recovery must leave it alone
        (q / ".tmp-otherjob-zzz.jsonl").write_text('{"n": 9}\n')
        (q / ".manifest-c1.json").write_text(
            json.dumps(
                {
                    "renames": [
                        [".tmp-deadjob-aaa.jsonl", "msg-c1-00000.jsonl"],
                        [".tmp-deadjob-bbb.jsonl", "msg-c1-00001.jsonl"],
                    ]
                }
            )
        )
        assert recover_queue_dir(str(q)) == 1
        assert sorted(os.listdir(q)) == [
            ".tmp-otherjob-zzz.jsonl",
            "msg-c1-00000.jsonl",
            "msg-c1-00001.jsonl",
        ]
        assert (q / "msg-c1-00000.jsonl").read_text() == '{"n": 1}\n'
        # second recovery pass is a no-op
        assert recover_queue_dir(str(q)) == 0

    def test_recover_raises_on_genuine_data_loss(self, tmp_path):
        """Manifest promises a message whose temp vanished and whose
        visible twin never appeared — that is data loss, not a state
        to silently skip."""
        import json

        from dbm_nca_ph_etl_spark.sources.queue_sink import recover_queue_dir

        q = tmp_path / "queue8"
        q.mkdir()
        (q / ".manifest-c2.json").write_text(
            json.dumps({"renames": [[".tmp-gone.jsonl", "msg-c2-00000.jsonl"]]})
        )
        with pytest.raises(FileNotFoundError):
            recover_queue_dir(str(q))
