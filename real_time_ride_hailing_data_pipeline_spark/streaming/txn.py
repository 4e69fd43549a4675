"""Multi-table atomic commits over upsert-sink tables — the
Iceberg/Nessie CATALOG-COMMIT design: each table keeps its own
snapshot transaction log; a transaction writes every member table
(each internally crash-safe and idempotent), then publishes ONE
atomic catalog manifest pinning each table's version. Readers resolve
versions exclusively through the catalog, so they can never observe
table A at transaction N together with table B at N-1 — the torn
state a pair of independent tables exposes the moment a consumer
joins them mid-update.

Crash contract: the catalog publish (one atomic JSON rename) is the
ONLY commit point. A crash anywhere before it leaves some member
tables with committed-but-unreferenced versions — invisible through
the catalog — and re-running ``commit(txn_id, batches)`` replays each
table's epoch (the sinks are idempotent per epoch: an already-applied
batch is a no-op) and then publishes. A crash after it changes
nothing: the transaction is durable.

Scale posture: the catalog manifest is O(tables) metadata; per-table
write cost is the sink's own O(touched partitions); catalog reads are
one tiny JSON plus the sink's manifest-composed ``read_at``. On an
object store the atomic rename becomes a conditional PUT — the same
primitive every Iceberg REST catalog ultimately relies on.

Reference capability anchor: the reference writes a single Postgres
table with no versioning (streaming_job.py:26-44); this completes the
lakehouse story for pipelines that must publish several derived
tables in lock-step (fact + rollup, table + index).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from real_time_ride_hailing_data_pipeline_spark.streaming.sinks import (
    ParquetUpsertSink,
)


class MultiTableTransaction:
    def __init__(
        self, catalog_dir: str, sinks: dict[str, ParquetUpsertSink]
    ) -> None:
        if not sinks:
            raise ValueError("a transaction needs at least one table")
        for name, sink in sinks.items():
            if sink.snapshot_dir is None:
                raise ValueError(
                    f"table {name!r} has no snapshot log — catalog reads "
                    f"resolve versions via read_at and need one"
                )
        self.catalog_dir = catalog_dir
        self.sinks = dict(sinks)
        os.makedirs(catalog_dir, exist_ok=True)

    def _txn_path(self, txn_id: int) -> str:
        return os.path.join(self.catalog_dir, f"txn={txn_id}.json")

    def commits(self) -> list[int]:
        """Published transaction ids, ascending."""
        return sorted(
            int(n[len("txn=") : -len(".json")])
            for n in os.listdir(self.catalog_dir)
            if n.startswith("txn=") and n.endswith(".json")
        )

    def commit(self, txn_id: int, batches: dict[str, DataFrame]) -> None:
        """Apply each table's batch at epoch ``txn_id`` (tables absent
        from ``batches`` are pinned at their newest version ≤ txn_id —
        a transaction may touch a subset), then publish the catalog
        manifest LAST. Idempotent: replaying a crashed or duplicate
        transaction re-applies no data and republishes identical
        pins."""
        unknown = set(batches) - set(self.sinks)
        if unknown:
            raise ValueError(f"unknown table(s) {sorted(unknown)}")
        published = self.commits()
        if published and txn_id < published[-1]:
            raise ValueError(
                f"txn {txn_id} precedes the newest published txn "
                f"{published[-1]} — transactions are monotonic"
            )
        for name in sorted(batches):
            self.sinks[name].write_batch(batches[name], txn_id)
        versions: dict[str, int] = {}
        for name, sink in self.sinks.items():
            eligible = [e for e in sink.snapshots() if e <= txn_id]
            if not eligible:
                raise ValueError(
                    f"table {name!r} has no committed version at or below "
                    f"txn {txn_id} — every member table needs a baseline"
                )
            versions[name] = eligible[-1]
        # THE commit point: one atomic rename
        ParquetUpsertSink._atomic_json_write(
            self._txn_path(txn_id),
            {"tables": versions, "committed_at": time.time()},
        )

    def _resolve(self, txn_id: int | None) -> dict[str, int]:
        published = self.commits()
        if not published:
            raise ValueError("no published transaction")
        if txn_id is None:
            tid = published[-1]
        else:
            eligible = [t for t in published if t <= txn_id]
            if not eligible:
                raise ValueError(
                    f"no transaction at or before {txn_id} "
                    f"(published: {published})"
                )
            tid = eligible[-1]
        with open(self._txn_path(tid)) as fh:
            return json.load(fh)["tables"]

    def read(
        self, spark: SparkSession, name: str, txn_id: int | None = None
    ) -> DataFrame:
        """Read table ``name`` AS OF the (newest ≤ ``txn_id``, default
        newest) published transaction — never the live table, so a
        member table's committed-but-unreferenced epoch (a transaction
        torn before its catalog publish) is invisible, and any pair of
        reads at the same txn_id is mutually consistent."""
        return self.sinks[name].read_at(spark, self._resolve(txn_id)[name])
