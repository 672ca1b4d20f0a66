"""The lakefs seam: stdlib fast path, pyarrow URI path, and adapter
injection through the staging/listing call sites.

The ArrowLakeFS tests run against ``file://`` URIs — same code path
(`pyarrow.fs.FileSystem.from_uri` → FileInfo / streams) as
``s3://``/``gs://``, no bucket required. The injection test proves
every byte of staging IO flows through the injected adapter (the
files land under the fake's root, not the advertised dest_dir) even
across the mapInPandas pickle boundary.
"""

import os

import pytest

from dbm_nca_ph_etl_spark.sources.lakefs import (
    ArrowLakeFS,
    LakeFS,
    PosixLakeFS,
    get_fs,
    join,
)


class TestPosix:
    def test_roundtrip_ls_size(self, tmp_path):
        fs = PosixLakeFS()
        d = str(tmp_path / "lake")
        fs.mkdirs(d)
        fs.write_bytes(os.path.join(d, "a.html"), b"<a href='x'>x</a>")
        fs.write_bytes(os.path.join(d, "b.txt"), b"nope")
        assert fs.exists(os.path.join(d, "a.html"))
        assert fs.size(os.path.join(d, "b.txt")) == 4
        assert fs.ls(d, suffixes=(".html",)) == [os.path.join(d, "a.html")]
        assert fs.read_bytes(os.path.join(d, "a.html")).startswith(b"<a ")
        # atomic publish: no tmp residue
        assert not [f for f in os.listdir(d) if ".tmp." in f]

    def test_ls_single_file(self, tmp_path):
        f = tmp_path / "one.html"
        f.write_text("x")
        assert PosixLakeFS().ls(str(f)) == [str(f)]

    def test_ls_missing_path_is_empty_not_phantom(self, tmp_path):
        # a typo'd table dir must list as [], never as a phantom
        # single entry that a downstream spark.read would choke on
        assert PosixLakeFS().ls(str(tmp_path / "nope")) == []
        assert ArrowLakeFS().ls(f"file://{tmp_path}/nope") == []

    def test_ls_single_file_respects_suffix_filter(self, tmp_path):
        f = tmp_path / "one.html"
        f.write_text("x")
        assert PosixLakeFS().ls(str(f), suffixes=(".pdf",)) == []
        assert PosixLakeFS().ls(str(f), suffixes=(".html",)) == [str(f)]
        uri = f"file://{tmp_path}/one.html"
        assert ArrowLakeFS().ls(uri, suffixes=(".pdf",)) == []
        assert ArrowLakeFS().ls(uri, suffixes=(".html",)) == [uri]


class TestArrowUri:
    def test_roundtrip_over_file_uri(self, tmp_path):
        fs = ArrowLakeFS()
        base = f"file://{tmp_path}/bucket"
        fs.mkdirs(base)
        fs.write_bytes(join(base, "doc.pdf"), b"%PDF-1.4 fake")
        assert fs.exists(join(base, "doc.pdf"))
        assert not fs.exists(join(base, "missing.pdf"))
        assert fs.size(join(base, "doc.pdf")) == 13
        assert fs.read_bytes(join(base, "doc.pdf")) == b"%PDF-1.4 fake"
        # listings come back as full URIs, suffix-filtered, sorted
        fs.write_bytes(join(base, "page.html"), b"<html></html>")
        got = fs.ls(base, suffixes=(".html",))
        assert got == [f"file://{tmp_path}/bucket/page.html"]
        assert not fs.is_dir(join(base, "doc.pdf")) and fs.is_dir(base)

    def test_ls_roundtrips_bucket_in_path_uris(self, tmp_path):
        """For s3://-style stores, from_uri returns paths that ALREADY
        include the bucket ('bucket/dir/file'); ls must not re-attach
        scheme://bucket in front of them (s3://bucket/bucket/...).
        Simulated with a SubTree resolver whose resolved paths carry
        the bucket segment, exactly like pyarrow's S3/GCS handlers."""
        from pyarrow import fs as pafs

        (tmp_path / "bucket" / "dir").mkdir(parents=True)
        (tmp_path / "bucket" / "dir" / "a.pdf").write_bytes(b"%PDF a")
        (tmp_path / "bucket" / "dir" / "b.pdf").write_bytes(b"%PDF b")

        class _BucketStyleFS(ArrowLakeFS):
            def _resolve(self, path):
                # mock://bucket/dir -> (subtree fs, "bucket/dir"):
                # the bucket stays IN the resolved path, as with S3
                assert path.startswith("mock://")
                return (
                    pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem()),
                    path[len("mock://"):],
                )

        fs = _BucketStyleFS()
        got = fs.ls("mock://bucket/dir", suffixes=(".pdf",))
        assert got == ["mock://bucket/dir/a.pdf", "mock://bucket/dir/b.pdf"]
        # the listing round-trips: each URI is readable as returned
        assert fs.read_bytes(got[0]) == b"%PDF a"
        assert fs.size(got[1]) == 6

    def test_resolution_and_join(self):
        assert isinstance(get_fs("/plain/path"), PosixLakeFS)
        assert isinstance(get_fs("s3://bucket/key"), ArrowLakeFS)
        override = PosixLakeFS()
        assert get_fs("s3://bucket/key", override) is override
        assert join("s3://b/prefix", "f.pdf") == "s3://b/prefix/f.pdf"


class _RerootedFS(LakeFS):
    """Picklable fake adapter: maps every path under its own root —
    if staging bytes appear there, every IO call went through the
    injected seam, across the executor pickle boundary."""

    def __init__(self, root: str):
        self.root = root
        self._inner = PosixLakeFS()

    def _map(self, path: str) -> str:
        return os.path.join(self.root, path.replace("/", "_"))

    def ls(self, path, suffixes=None):
        return self._inner.ls(self._map(path), suffixes)

    def is_dir(self, path):
        return True

    def read_bytes(self, path):
        return self._inner.read_bytes(self._map(path))

    def write_bytes(self, path, data):
        self._inner.write_bytes(self._map(path), data)

    def exists(self, path):
        return self._inner.exists(self._map(path))

    def size(self, path):
        return self._inner.size(self._map(path))

    def mkdirs(self, path):
        os.makedirs(self.root, exist_ok=True)


class TestStagingInjection:
    def test_staging_writes_flow_through_injected_adapter(self, spark, tmp_path):
        import sys

        from pyspark import cloudpickle
        from dbm_nca_ph_etl_spark.sources.staging import stage_releases

        # the fake class lives in this test module, which executor
        # workers can't import — ship it by value instead
        cloudpickle.register_pickle_by_value(sys.modules[__name__])

        fake_root = str(tmp_path / "fakefs")
        fake = _RerootedFS(fake_root)
        releases = spark.createDataFrame(
            [("id_1", "mem://a.pdf", "a.pdf"), ("id_2", "mem://b.pdf", "b.pdf")],
            "id string, url string, filename string",
        )
        status = stage_releases(
            releases,
            "s3://lake/pdfs",  # never touched: the adapter reroots it
            fetcher=lambda url: b"PDF:" + url.encode(),
            filesystem=fake,
        ).collect()
        assert {(r.release_id, r.staged) for r in status} == {
            ("id_1", True),
            ("id_2", True),
        }
        staged = sorted(os.listdir(fake_root))
        assert staged == ["s3:__lake_pdfs_a.pdf", "s3:__lake_pdfs_b.pdf"]
        # replay skips: adapter-reported size, no second write
        again = stage_releases(
            releases,
            "s3://lake/pdfs",
            fetcher=lambda url: (_ for _ in ()).throw(AssertionError("refetched")),
            filesystem=fake,
        ).collect()
        assert all(not r.staged and r.error is None for r in again)
        assert all(r.n_bytes > 0 for r in again)


class TestListingOverUri:
    def test_listing_source_reads_file_uri(self, spark, tmp_path):
        from dbm_nca_ph_etl_spark.sources.listing_source import NCAListingDataSource

        d = tmp_path / "listings"
        d.mkdir()
        (d / "page1.html").write_text(
            '<a href="files/NCA_2024.pdf">NCA 2024</a>'
        )
        (d / "ignore.txt").write_text("not html")
        spark.dataSource.register(NCAListingDataSource)
        rows = (
            spark.read.format("nca_listing")
            .option("path", f"file://{d}")
            .load()
            .collect()
        )
        assert len(rows) == 1
        assert rows[0].url == "files/NCA_2024.pdf"
        assert rows[0].page_file.startswith("file://")
