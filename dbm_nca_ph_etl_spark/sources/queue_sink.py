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
- the driver's ``commit()`` first publishes a dot-hidden MANIFEST
  (``.manifest-<commit>.json``, itself temp-written then atomically
  renamed) recording every intended temp→visible rename — that
  single rename IS the commit decision — then renames every temp to
  a visible ``msg-<commit uuid>-<task idx>.jsonl`` and removes the
  manifest;
- ``abort()`` deletes the temps (no manifest is ever written for an
  aborted job, so an aborted job publishes NOTHING).

Atomicity contract, stated precisely: each MESSAGE file appears
atomically (POSIX rename — a consumer doing plain
``spark.read[Stream].json`` never observes a torn message, and
dotfiles are invisible to it). JOB-level all-or-nothing is the
write-ahead-manifest protocol: before the manifest rename, nothing
is visible; after it, the commit is durable and a driver crash
mid-rename leaves a prefix of the batch visible only until
:func:`recover_queue_dir` rolls the recorded renames FORWARD —
run it on queue-directory open (consumers or the next producer) and
the batch is eventually all-visible, never partially-forever.

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
        renames: list[list[str]] = []
        for i, m in enumerate(m for m in messages if m is not None):
            if m.n_rows == 0:
                os.remove(os.path.join(self._path, m.tmp_name))
                continue  # empty partitions publish nothing
            renames.append([m.tmp_name, f"msg-{commit_id}-{i:05d}.jsonl"])
        if renames:
            # WRITE-AHEAD MANIFEST: the atomic rename below is the
            # commit decision. Crash before it → nothing visible;
            # crash after it → recover_queue_dir rolls forward.
            manifest = os.path.join(self._path, f".manifest-{commit_id}.json")
            tmp_manifest = manifest + ".tmp"
            with open(tmp_manifest, "w", encoding="utf-8") as fh:
                json.dump({"renames": renames}, fh)
            os.replace(tmp_manifest, manifest)
            _apply_manifest(self._path, manifest, {"renames": renames})
        self._reap_job_temps()

    def abort(self, messages: List[Optional[_QueueCommit]]) -> None:
        self._reap_job_temps()

    def _reap_job_temps(self) -> None:
        _reap_prefix(self._path, f".tmp-{self._job}-")


def _apply_manifest(path: str, manifest: str, plan: dict) -> None:
    """Redo phase shared by commit() and recovery: apply every
    recorded rename (idempotently — a rename already applied, whether
    by a crashed commit or a concurrent recoverer, is skipped), then
    retire the manifest."""
    for src, dst in plan["renames"]:
        try:
            os.replace(os.path.join(path, src), os.path.join(path, dst))
        except FileNotFoundError:
            if not os.path.exists(os.path.join(path, dst)):
                raise  # neither temp nor published file: data loss, surface it
    try:
        os.remove(manifest)
    except FileNotFoundError:
        pass


def recover_queue_dir(path: str) -> int:
    """Roll FORWARD any commit a crashed driver left half-published.

    A ``.manifest-*.json`` in the queue dir means a job reached its
    commit decision (the manifest rename is the atomic commit point)
    but may have died before finishing the temp→visible renames.
    Recovery is pure redo: re-apply the recorded renames (idempotent)
    and retire the manifest. Call on queue-directory open — the next
    producer run or a consumer's startup — to restore the job-level
    all-or-nothing guarantee after a crash. Returns the number of
    manifests completed. Orphan ``.tmp-*`` files from jobs that died
    BEFORE their commit decision are not touched (they are dot-hidden
    and might belong to a live concurrent job); they are reaped by
    their own job's commit/abort when it runs.
    """
    done = 0
    for f in sorted(os.listdir(path)):
        if f.startswith(".manifest-") and f.endswith(".json"):
            manifest = os.path.join(path, f)
            try:
                with open(manifest, encoding="utf-8") as fh:
                    plan = json.load(fh)
            except FileNotFoundError:
                continue  # a concurrent recoverer finished it
            _apply_manifest(path, manifest, plan)
            done += 1
    return done


def _reap_prefix(path: str, prefix: str) -> None:
    # failed/speculative attempts wrote temps that never reached a
    # commit message; after rename/abort anything left under the
    # owning job's prefix is an orphan
    for f in os.listdir(path):
        if f.startswith(prefix):
            try:
                os.remove(os.path.join(path, f))
            except FileNotFoundError:
                pass
