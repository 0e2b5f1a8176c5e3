"""Structured Streaming source over an Iceberg table's append tail.

``IcebergTable.read_tail`` (sources/iceberg.py) answers "what was
appended since snapshot X" as a BATCH; this module turns the same
snapshot-diff contract into a first-class streaming source
(``spark.readStream.format("iceberg_tail")``) through the Spark 4
Python Data Source API — the shape real lakehouse CDC ingestion uses:
every append snapshot becomes part of exactly one micro-batch, offsets
are snapshot sequence numbers, and replay after failure is
deterministic because Iceberg metadata is immutable once committed.

This is the FULL ``DataSourceStreamReader`` API, not the Simple one
(contrast ``pysource.py``'s queue-poll source): ``partitions(start,
end)`` lists the files added by the snapshots in the offset range —
driver-side METADATA work, O(files) — and ``read(partition)`` parses
one parquet file on an EXECUTOR, yielding Arrow record batches. Rows
never touch the driver, and a micro-batch spanning N files reads with
N-way parallelism.

Offset contract: ``{"seq": <last consumed sequence-number>}`` over the
MAIN ancestry only (branch snapshots join the stream when a
fast-forward publishes them, exactly like the batch tail). Non-append
snapshots in a consumed range refuse loudly — a replace/delete is not
representable as inserts, the same stance as ``read_tail``.

Every row carries ``_commit_snapshot`` (the snapshot that committed
it), mirroring the batch tail's tagging, so downstream operators can
window or dedup by commit.

Honest limits: primitive top-level columns only (long/int/double/float/
string/boolean — what Arrow hands Spark without timezone or nesting
ambiguity); everything else refuses at stream start, loudly.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from data_etl_pipeline_spark.sources.iceberg import (
    IcebergError,
    _load_table_metadata,
    _local,
    _schema_by_id,
)
from data_etl_pipeline_spark.sources.avro_ocf import read_ocf

_STREAMABLE = {
    "long": "bigint",
    "int": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
}


def _table_ddl(table_dir: str) -> str:
    meta = _load_table_metadata(table_dir)
    schema = _schema_by_id(meta)
    cols = []
    for f in schema["fields"]:
        t = f["type"]
        if not isinstance(t, str) or t not in _STREAMABLE:
            raise IcebergError(
                f"column {f['name']!r} has type {t!r} — the streaming tail "
                f"source supports {sorted(_STREAMABLE)} only"
            )
        cols.append(f"{f['name']} {_STREAMABLE[t]}")
    cols.append("_commit_snapshot bigint")
    return ", ".join(cols)


def _main_ancestry(meta: dict) -> list[dict]:
    """Snapshots on the main time line, oldest first (parent walk from
    the current snapshot; pre-ref snapshots without a parent key are
    main-line by construction)."""
    by_id = {s["snapshot-id"]: s for s in meta["snapshots"]}
    ancestry: set[int] = set()
    walk = meta["current-snapshot-id"]
    while walk is not None and walk in by_id and walk not in ancestry:
        ancestry.add(walk)
        walk = by_id[walk].get("parent-snapshot-id")
    return sorted(
        (
            s
            for s in meta["snapshots"]
            if "parent-snapshot-id" not in s or s["snapshot-id"] in ancestry
        ),
        key=lambda s: s.get("sequence-number", 0),
    )


class _FilePartition(InputPartition):
    def __init__(self, path: str, snapshot_id: int, columns: list[str]):
        self.path = path
        self.snapshot_id = snapshot_id
        self.columns = columns


class IcebergTailStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.table_dir = options.get("path")
        if not self.table_dir:
            raise IcebergError(
                "iceberg_tail stream requires .option('path', <table dir>)"
            )
        # data columns in read order (the DDL minus _commit_snapshot)
        meta = _load_table_metadata(self.table_dir)
        self.columns = [f["name"] for f in _schema_by_id(meta)["fields"]]

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def latestOffset(self) -> dict:
        meta = _load_table_metadata(self.table_dir)
        snaps = _main_ancestry(meta)
        return {"seq": max((s.get("sequence-number", 0) for s in snaps), default=0)}

    def partitions(self, start: dict, end: dict) -> list[_FilePartition]:
        meta = _load_table_metadata(self.table_dir)
        lo, hi = start.get("seq", 0), end.get("seq", 0)
        parts: list[_FilePartition] = []
        for s in _main_ancestry(meta):
            seq = s.get("sequence-number", 0)
            if not (lo < seq <= hi):
                continue
            op = s.get("summary", {}).get("operation", "append")
            if op == "replace" and "manifests-rewritten" in s.get("summary", {}):
                continue  # metadata-only manifest compaction: adds no rows
            if op != "append":
                raise IcebergError(
                    f"snapshot {s['snapshot-id']} is a {op!r} snapshot — the "
                    "streaming tail covers append-only ranges (restart the "
                    "stream from a later offset after a rewrite)"
                )
            manifests, _ = read_ocf(_local(s["manifest-list"], self.table_dir))
            for m in manifests:
                if m["added_snapshot_id"] != s["snapshot-id"]:
                    continue  # carried forward by reference: already streamed
                if m.get("content", 0) != 0:
                    raise IcebergError(
                        "append snapshot carries a delete manifest "
                        "(malformed table)"
                    )
                for e in read_ocf(_local(m["manifest_path"], self.table_dir))[0]:
                    if e["status"] == 1 and e.get("snapshot_id") == s["snapshot-id"]:
                        parts.append(
                            _FilePartition(
                                _local(e["data_file"]["file_path"], self.table_dir),
                                s["snapshot-id"],
                                self.columns,
                            )
                        )
        return parts

    def read(self, partition: _FilePartition):
        # executor-side: one parquet file -> Arrow batches with the
        # commit tag appended; column order pinned to the declared DDL
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path, columns=partition.columns)
        tag = pa.array(
            [partition.snapshot_id] * table.num_rows, type=pa.int64()
        )
        table = table.append_column("_commit_snapshot", tag)
        yield from table.to_batches()

    def commit(self, end: dict) -> None:
        pass  # metadata is immutable; nothing to release


class IcebergTailDataSource(DataSource):
    """``spark.readStream.format("iceberg_tail").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_tail"

    def schema(self) -> str:
        return _table_ddl(self.options.get("path"))

    def streamReader(self, schema) -> IcebergTailStreamReader:
        return IcebergTailStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the iceberg_tail format."""
    spark.dataSource.register(IcebergTailDataSource)
