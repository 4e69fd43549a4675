"""Custom Python DataSource WRITERS (Spark 4 ``pyspark.sql.datasource``
write API): a manifest-committed JSON-lines sink, batch + streaming.

Completes the Python-connector surface next to the batch reader and
``SimpleDataSourceStreamReader`` in python_datasource.py: `writer()`
covers ``DataSourceArrowWriter`` (executors receive Arrow RecordBatches
— the fast boundary) and `streamWriter()` covers
``DataSourceStreamWriter`` (row iterator per micro-batch task;
``DataSourceStreamArrowWriter`` is the same shape over RecordBatches).

Exactly-once visibility is the FileStreamSink manifest design
re-expressed at the Python boundary:

- each write task streams its partition to ``.tmp-<uuid>.jsonl`` and
  returns the path in its WriterCommitMessage — task output is
  invisible until the driver commits;
- ``commit()`` renames every task file to a DETERMINISTIC name
  (``part-<batch>-<seq>.jsonl``) and then atomically publishes a
  manifest (``_manifest-<batch>.json``) listing exactly the committed
  files — ``os.replace`` on both steps, so a micro-batch REPLAY after
  a crash overwrites the same names and republishes the same manifest
  instead of duplicating data;
- ``abort()`` deletes the attempt's temp files; temp files orphaned by
  a crashed driver are simply never named in any manifest;
- readers go through ``committed_files()`` — manifests only, so
  orphans and in-flight attempts are structurally invisible.

At 100 TB the same layout holds: task files are written once and
renamed (no data rewrite on commit), the manifest is O(files) driver
metadata, and a reader lists manifests, not the directory.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamWriter,
    WriterCommitMessage,
)


@dataclass
class JsonlCommitMessage(WriterCommitMessage):
    files: list = field(default_factory=list)
    rows: int = 0


def _task_file(path: str) -> str:
    return os.path.join(path, f".tmp-{uuid.uuid4().hex}.jsonl")


def _publish(path: str, messages, batch: str, clear_previous: bool) -> None:
    """Driver-side two-phase commit: deterministic renames, then one
    atomic manifest replace. Idempotent per `batch` label."""
    if clear_previous:
        for name in os.listdir(path):
            if name.startswith(("part-", "_manifest-")):
                os.remove(os.path.join(path, name))
    committed, total = [], 0
    seq = 0
    for m in messages:
        if m is None:
            continue
        for tmp in m.files:
            final = os.path.join(path, f"part-{batch}-{seq:05d}.jsonl")
            os.replace(tmp, final)
            committed.append(os.path.basename(final))
            seq += 1
        total += m.rows
    tmp_manifest = os.path.join(path, f".tmp-manifest-{uuid.uuid4().hex}")
    with open(tmp_manifest, "w") as f:
        json.dump({"files": committed, "rows": total}, f)
    os.replace(tmp_manifest, os.path.join(path, f"_manifest-{batch}.json"))


def _abort(messages) -> None:
    for m in messages:
        if m is None:
            continue
        for tmp in m.files:
            try:
                os.remove(tmp)
            except FileNotFoundError:
                pass


def committed_files(path: str) -> list[str]:
    """Every file named by a manifest — the ONLY sanctioned read path;
    orphan temp files and uncommitted attempts never appear."""
    out: list[str] = []
    for name in sorted(os.listdir(path)):
        if name.startswith("_manifest-") and name.endswith(".json"):
            with open(os.path.join(path, name)) as f:
                out.extend(
                    os.path.join(path, b) for b in json.load(f)["files"]
                )
    return out


class JsonlArrowWriter(DataSourceArrowWriter):
    """Batch writer over the Arrow boundary: each task serializes its
    RecordBatches straight out of the Arrow buffers."""

    def __init__(self, path: str, overwrite: bool) -> None:
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator: Iterator) -> JsonlCommitMessage:
        tmp, rows = _task_file(self.path), 0
        wrote = False
        with open(tmp, "w") as f:
            for batch in iterator:
                for rec in batch.to_pylist():
                    f.write(json.dumps(rec, separators=(",", ":")) + "\n")
                    rows += 1
                wrote = True
        if not wrote:
            os.remove(tmp)
            return JsonlCommitMessage(files=[], rows=0)
        return JsonlCommitMessage(files=[tmp], rows=rows)

    def commit(self, messages) -> None:
        _publish(self.path, messages, "b", clear_previous=self.overwrite)

    def abort(self, messages) -> None:
        _abort(messages)


class JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming writer (row-iterator API): the epoch id in the
    deterministic names + per-epoch manifest is what makes a replayed
    micro-batch overwrite itself instead of appending twice."""

    def __init__(self, path: str) -> None:
        self.path = path

    def write(self, iterator: Iterator) -> JsonlCommitMessage:
        tmp, rows = _task_file(self.path), 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), separators=(",", ":")) + "\n")
                rows += 1
        if rows == 0:
            os.remove(tmp)
            return JsonlCommitMessage(files=[], rows=0)
        return JsonlCommitMessage(files=[tmp], rows=rows)

    def commit(self, messages, batchId: int) -> None:
        _publish(self.path, messages, str(batchId), clear_previous=False)

    def abort(self, messages, batchId: int) -> None:
        _abort(messages)


class JsonlCommitDataSource(DataSource):
    """``df.write.format("jsonl_commit").option("path", dir)`` and
    ``df.writeStream.format("jsonl_commit")`` — write-only source (no
    reader; reads go through ``committed_files`` + spark.read.json)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_commit"

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_commit requires .option('path', dir)")
        os.makedirs(path, exist_ok=True)
        return path

    def writer(self, schema, overwrite: bool) -> JsonlArrowWriter:
        return JsonlArrowWriter(self._path(), overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonlStreamWriter:
        return JsonlStreamWriter(self._path())


def register(spark) -> None:
    """Ship by value, same rationale as python_datasource.register:
    executor workers can't import the engine package by name when the
    driver loaded it from a plain checkout."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(JsonlCommitDataSource)
