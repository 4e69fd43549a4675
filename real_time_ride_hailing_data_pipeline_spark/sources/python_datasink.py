"""Custom Python DataSource WRITERS (Spark 4 ``pyspark.sql.datasource``
write API): a manifest-committed JSON-lines sink, batch + streaming.

Completes the Python-connector surface next to the batch reader and
``SimpleDataSourceStreamReader`` in python_datasource.py: `writer()`
covers ``DataSourceArrowWriter`` (executors receive Arrow RecordBatches
— the fast boundary) and `streamWriter()` covers
``DataSourceStreamArrowWriter`` (the 4.1 Arrow form of the micro-batch
write task; the row-iterator ``DataSourceStreamWriter`` is the same
protocol over pickled Rows — r13 moved this sink off it per the
optimization guide §4, keeping row-level sink coverage in the
``streaming_foreach_row_sink`` registry entry).

Exactly-once visibility is the FileStreamSink manifest design
re-expressed at the Python boundary:

- each write task streams its partition to ``.tmp-<uuid>.jsonl`` and
  returns the path in its WriterCommitMessage — task output is
  invisible until the driver commits;
- ``commit()`` renames every task file to a DETERMINISTIC name
  (``part-<generation>-<seq>.jsonl``) and then atomically publishes a
  manifest (``_manifest-<generation>.json``) naming exactly the
  committed files — ``os.replace`` on both steps;
- generations are zero-padded integers: stream commits use the EPOCH
  ID (so a replayed micro-batch overwrites its own names and
  republishes the same manifest instead of duplicating data), batch
  commits allocate the next free generation (so successive append
  writes coexist instead of colliding);
- an OVERWRITE commit publishes its manifest with ``replace: true``
  and only THEN garbage-collects older generations — readers that
  race (or a crash mid-GC) still resolve a correct snapshot, because
  ``committed_files()`` discards everything before the newest replace
  manifest; the destructive step happens strictly after the atomic
  publish;
- ``abort()`` deletes the attempt's temp files; temp files orphaned by
  a crashed driver are simply never named in any manifest.

At 100 TB the same layout holds: task files are written once and
renamed (no data rewrite on commit), the manifest is O(files) driver
metadata, and a reader lists manifests, not the directory. Batch and
stream writes share one generation number line, so interleaving both
modes into one directory is not a supported pattern (use one sink dir
per writer, as FileStreamSink does).
"""

from __future__ import annotations

import base64
import datetime as dt
import decimal
import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

_GEN_WIDTH = 10  # zero-padded generation -> lexical order == numeric


@dataclass
class JsonlCommitMessage(WriterCommitMessage):
    files: list = field(default_factory=list)
    rows: int = 0


def _json_default(v):
    """JSON-encode the column types Spark rows can carry beyond the
    JSON-native ones; without this every task of a timestamp-bearing
    write dies with 'Object of type datetime is not JSON serializable'."""
    if isinstance(v, (dt.datetime, dt.date, dt.time)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    raise TypeError(f"jsonl_commit cannot encode {type(v).__name__}")


def _dumps(rec: dict) -> str:
    return json.dumps(rec, separators=(",", ":"), default=_json_default)


def _task_file(path: str) -> str:
    return os.path.join(path, f".tmp-{uuid.uuid4().hex}.jsonl")


def _manifest_name(gen: int) -> str:
    return f"_manifest-{gen:0{_GEN_WIDTH}d}.json"


def _gen_of(manifest: str) -> int:
    return int(manifest[len("_manifest-") : -len(".json")])


def _manifests(path: str) -> list[str]:
    return sorted(
        n
        for n in os.listdir(path)
        if n.startswith("_manifest-") and n.endswith(".json")
    )


def _next_generation(path: str) -> int:
    existing = _manifests(path)
    return (_gen_of(existing[-1]) + 1) if existing else 0


def _publish(path: str, messages, gen: int, replace: bool) -> None:
    """Driver-side two-phase commit: deterministic renames, then ONE
    atomic manifest replace. Idempotent per generation. For replace
    commits the garbage collection of older generations runs strictly
    AFTER the publish — a crash anywhere leaves either the old
    snapshot (manifest not yet replaced) or the new one (GC pending,
    dead files ignored by readers), never neither."""
    committed, total, seq = [], 0, 0
    for m in messages:
        if m is None:
            continue
        for tmp in m.files:
            final = os.path.join(
                path, f"part-{gen:0{_GEN_WIDTH}d}-{seq:05d}.jsonl"
            )
            os.replace(tmp, final)
            committed.append(os.path.basename(final))
            seq += 1
        total += m.rows
    tmp_manifest = os.path.join(path, f".tmp-manifest-{uuid.uuid4().hex}")
    with open(tmp_manifest, "w") as f:
        json.dump({"files": committed, "rows": total, "replace": replace}, f)
    os.replace(tmp_manifest, os.path.join(path, _manifest_name(gen)))
    if replace:
        # GC strictly after the atomic publish: older manifests first
        # (each unlink atomic, readers discard pre-replace state
        # anyway), then their now-unreferenced part files
        keep = set(committed)
        for name in _manifests(path):
            if _gen_of(name) != gen:
                os.remove(os.path.join(path, name))
        for name in os.listdir(path):
            if name.startswith("part-") and name not in keep:
                os.remove(os.path.join(path, name))


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
    orphan temp files and uncommitted attempts never appear. A
    ``replace: true`` manifest starts the snapshot over: everything
    published before it is dead, whether or not GC has removed it."""
    out: list[str] = []
    for name in _manifests(path):
        with open(os.path.join(path, name)) as f:
            m = json.load(f)
        if m.get("replace"):
            out = []
        out.extend(os.path.join(path, b) for b in m["files"])
    return out


class JsonlArrowWriter(DataSourceArrowWriter):
    """Batch writer over the Arrow boundary: each task serializes its
    RecordBatches straight out of the Arrow buffers. Every batch
    commit allocates a fresh generation, so append mode appends."""

    def __init__(self, path: str, overwrite: bool) -> None:
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator: Iterator) -> JsonlCommitMessage:
        tmp, rows = _task_file(self.path), 0
        with open(tmp, "w") as f:
            for batch in iterator:
                for rec in batch.to_pylist():
                    f.write(_dumps(rec) + "\n")
                    rows += 1
        if rows == 0:
            os.remove(tmp)
            return JsonlCommitMessage(files=[], rows=0)
        return JsonlCommitMessage(files=[tmp], rows=rows)

    def commit(self, messages) -> None:
        _publish(
            self.path,
            messages,
            _next_generation(self.path),
            replace=self.overwrite,
        )

    def abort(self, messages) -> None:
        _abort(messages)


class JsonlStreamWriter(DataSourceStreamArrowWriter):
    """Streaming writer over the ARROW boundary (r13, guide §4: the
    row-iterator ``DataSourceStreamWriter`` ships every micro-batch
    row as a pickled Row — the slow boundary; the 4.1 Arrow form hands
    each task whole RecordBatches). Emitted JSONL records are
    identical: ``batch.to_pylist()`` yields the same field order and
    Python values (datetime/Decimal/bytes all land in
    ``_json_default``) the Row path produced. The epoch id IS the
    generation, so deterministic names + the per-epoch manifest make a
    replayed micro-batch overwrite itself instead of appending twice.
    (Row-at-a-time sink coverage lives on in the registry's
    ``streaming_foreach_row_sink`` ForeachWriter entry.)"""

    def __init__(self, path: str) -> None:
        self.path = path

    def write(self, iterator: Iterator) -> JsonlCommitMessage:
        tmp, rows = _task_file(self.path), 0
        with open(tmp, "w") as f:
            for batch in iterator:
                for rec in batch.to_pylist():
                    f.write(_dumps(rec) + "\n")
                    rows += 1
        if rows == 0:
            os.remove(tmp)
            return JsonlCommitMessage(files=[], rows=0)
        return JsonlCommitMessage(files=[tmp], rows=rows)

    def commit(self, messages, batchId: int) -> None:
        _publish(self.path, messages, int(batchId), replace=False)

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
