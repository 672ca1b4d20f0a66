"""Release staging — S3 (PDF download) + S4 (blob store write).

Reference parity: ``download_release`` (bs4_scraper.py:39-42, HTTP
GET → bytes) and ``save_file`` (s3_storage.py:25-38 / local_storage
.py:19-26, filename-keyed write under a base path). The reference
runs this per release inside the scraper Lambda; here it is one
distributed pass: the release manifest DataFrame fans out across
executors, each task fetches its partition's URLs and writes the
bytes into the lake directory that :func:`~dbm_nca_ph_etl_spark.
sources.pdf_source.read_pdf_binaries` scans — closing the
scrape → stage → extract loop end-to-end.

Storage resolves through the ``sources/lakefs`` seam (same as
``nca_listing``): a bare ``dest_dir`` writes via the stdlib (local
mode, NFS), a URI ``dest_dir`` (``s3://``, ``gs://``, ``hdfs://``)
via ``pyarrow.fs`` — which runs inside executor Python workers,
where the staging writes actually happen (the JVM Hadoop
``FileSystem`` is driver-only). This is the reference's S3Storage /
LocalStorage adapter split (s3_storage.py:25-38,
local_storage.py:19-26) as one injectable seam: pass
``filesystem=`` to substitute any adapter (tests inject an
in-memory fake).

The default ``fetcher`` uses stdlib ``urllib`` (no extra deps); tests
inject a deterministic fake. Fetch failures don't kill the job — the
status row records the error (the reference's DLQ-after-1-attempt
semantics, initialize_aws.py:216-218, as data instead of queue
plumbing).
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

from dbm_nca_ph_etl_spark.sources.lakefs import LakeFS, get_fs, join

STAGE_STATUS_SCHEMA = (
    "release_id string, filename string, dest_path string, "
    "staged boolean, n_bytes long, error string"
)


def http_fetch(url: str, timeout: int = 60) -> bytes:
    """Default fetcher — stdlib HTTP GET (bs4_scraper.py:39-42)."""
    from urllib.request import urlopen

    with urlopen(url, timeout=timeout) as resp:  # noqa: S310 - caller-supplied manifest
        return resp.read()


def stage_releases(
    releases: DataFrame,
    dest_dir: str,
    fetcher: Callable[[str], bytes] = http_fetch,
    overwrite: bool = False,
    filesystem: LakeFS | None = None,
) -> DataFrame:
    """Fetch every release's PDF and write it to ``dest_dir`` named
    ``<filename>`` (the reference's filename-keyed storage). Returns
    a status DataFrame (STAGE_STATUS_SCHEMA): one row per release
    with staged / skipped / error outcome — an action on it (count,
    write) runs the stage.

    Idempotent by default: an already-present file is skipped
    (``staged=false, error=null``), so replays after partial failure
    only fetch the gaps — the at-least-once contract of the
    reference's SQS redrive, without the duplicate side effects.
    Writes publish atomically (tmp + rename on POSIX, single PUT on
    object stores — ``lakefs.write_bytes``) so a killed task never
    leaves a torn PDF for the downstream scan.

    ``filesystem`` overrides path-based resolution with any
    ``LakeFS`` adapter (the reference's injectable storage seam);
    the object must be picklable — it ships inside the task closure.
    """

    def stage(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fs = get_fs(dest_dir, filesystem)
        fs.mkdirs(dest_dir)
        for b in batches:
            out = []
            for rid, url, filename in zip(b["id"], b["url"], b["filename"]):
                dest = join(dest_dir, filename)
                if not overwrite and fs.exists(dest):
                    out.append((rid, filename, dest, False, fs.size(dest), None))
                    continue
                try:
                    data = fetcher(url)
                    fs.write_bytes(dest, data)
                    out.append((rid, filename, dest, True, len(data), None))
                except Exception as e:  # noqa: BLE001 - recorded, not raised
                    out.append((rid, filename, dest, False, 0, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(
                out,
                columns=[
                    "release_id", "filename", "dest_path",
                    "staged", "n_bytes", "error",
                ],
            )

    return releases.select("id", "url", "filename").mapInPandas(
        stage, schema=STAGE_STATUS_SCHEMA
    )
