"""``nca_queue`` — a Spark Python DataSource SINK for durable queue
publish (the writer-side twin of ``nca_listing``).

The reference's queue sink (sqs_queue.py:17-26: JSON-dump a model,
``send_message`` to SQS — SURVEY S15) re-expressed through Spark 4's
Python DataSource writer API as a first-class pluggable format:

    spark.dataSource.register(NCAQueueDataSource)
    (df.write.format("nca_queue")
       .option("path", "/lake/queues/releases")
       .mode("append").save())

Message files are JSON-lines, one file per write task, published with
the classic TWO-PHASE COMMIT every lake sink needs:

- executors write to dot-hidden temp files (``.tmp-*``) and return
  the temp name + row count as their commit message;
- the driver's ``commit()`` renames every temp to a visible
  ``msg-<commit uuid>-<task idx>.jsonl`` — rename is atomic on a
  POSIX filesystem, so a consumer (``spark.read[Stream].json`` with
  the default ``pathGlobFilter`` ignoring dotfiles) never observes a
  torn message and a failed job publishes NOTHING;
- ``abort()`` deletes the temps.

This is exactly the contract SQS gave the reference (all-or-nothing
visibility per message) generalized to a batch: at-least-once
delivery composes with the engine's idempotent loaders
(sinks/merge.py NCAStore, sinks/matview.py) for effectively-once.

JSON field order follows the DataFrame schema, timestamps serialize
ISO-8601 — the same wire format streaming/messages.py encodes, so
queue producers and consumers can mix DataFrame writers and
foreachBatch senders freely.

Same storage constraint as ``nca_listing`` (documented there): the
queue directory must be local/shared-POSIX; object stores without
atomic rename need a manifest-commit variant instead.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class _QueueCommit(WriterCommitMessage):
    tmp_name: str
    n_rows: int


class NCAQueueDataSource(DataSource):
    """Format name ``nca_queue``; option ``path`` is the queue
    directory (created if absent)."""

    @classmethod
    def name(cls) -> str:
        return "nca_queue"

    def writer(self, schema: StructType, overwrite: bool) -> "NCAQueueWriter":
        if overwrite:
            raise ValueError(
                "nca_queue is append-only (a queue has no overwrite); "
                "use mode('append')"
            )
        path = self.options.get("path")
        if not path:
            raise ValueError("nca_queue requires the 'path' option")
        return NCAQueueWriter(path, [f.name for f in schema.fields])


def _json_default(v):
    # timestamps/dates/decimals → ISO / string (messages.py wire format)
    return v.isoformat() if hasattr(v, "isoformat") else str(v)


class NCAQueueWriter(DataSourceWriter):
    def __init__(self, path: str, field_names: list[str]):
        self._path = path
        self._fields = field_names
        # job-scoped temp prefix (minted on the driver, pickled to
        # executors): lets commit/abort reap THIS job's failed or
        # speculative attempts — whose temps never reach a commit
        # message — without ever touching a concurrent job's in-flight
        # temps
        self._job = uuid.uuid4().hex[:12]
        os.makedirs(path, exist_ok=True)

    # -- executor side ------------------------------------------------------
    def write(self, iterator: Iterator) -> _QueueCommit:
        tmp = f".tmp-{self._job}-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self._path, tmp), "w", encoding="utf-8") as fh:
            for row in iterator:
                d = row.asDict()
                fh.write(
                    json.dumps(
                        {k: d[k] for k in self._fields},
                        default=_json_default,
                        ensure_ascii=False,
                    )
                )
                fh.write("\n")
                n += 1
        return _QueueCommit(tmp_name=tmp, n_rows=n)

    # -- driver side --------------------------------------------------------
    def commit(self, messages: List[Optional[_QueueCommit]]) -> None:
        commit_id = uuid.uuid4().hex[:12]
        for i, m in enumerate(m for m in messages if m is not None):
            src = os.path.join(self._path, m.tmp_name)
            if m.n_rows == 0:
                os.remove(src)  # empty partitions publish nothing
                continue
            os.rename(src, os.path.join(self._path, f"msg-{commit_id}-{i:05d}.jsonl"))
        self._reap_job_temps()

    def abort(self, messages: List[Optional[_QueueCommit]]) -> None:
        self._reap_job_temps()

    def _reap_job_temps(self) -> None:
        # failed/speculative attempts wrote temps that never reached a
        # commit message; after rename/abort anything left under this
        # job's prefix is an orphan
        prefix = f".tmp-{self._job}-"
        for f in os.listdir(self._path):
            if f.startswith(prefix):
                try:
                    os.remove(os.path.join(self._path, f))
                except FileNotFoundError:
                    pass
