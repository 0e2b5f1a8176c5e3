"""Minimal Delta Lake TRANSACTION-LOG READER (interop, read-only).

The Delta log protocol is public (delta.io PROTOCOL.md): a table is a
directory of parquet data files plus ``_delta_log/%020d.json`` commits,
each a line-delimited list of actions — ``metaData`` (schemaString = a
Spark JSON schema, partitionColumns), ``add`` (path, partitionValues,
dataChange) and ``remove`` (path).  A snapshot at version N is the replay
of actions 0..N: the last metaData wins and files = adds minus removes.

This reader reconstructs snapshots and time travel for tables written by
real Delta writers WITHOUT the delta-spark package — the interop seam for
"point the engine at an existing lakehouse":

  * version listing / ``read(version=)`` time travel;
  * partitioned tables: ``partitionValues`` are re-attached as literal
    columns cast through the table schema (Delta stores them in the path
    and the log, not the parquet files);
  * unsupported protocol features fail loudly: checkpoints (``*.checkpoint
    .parquet`` — larger tables; replay would be wrong without them) and
    deletion vectors (``add.deletionVector``) raise instead of silently
    returning resurrected rows.

Write support intentionally does not exist here: the engine's own
VersionedTable covers the write path; writing a foreign table's log
without its full protocol (invariants, DVs, column mapping) would corrupt
it.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DeltaProtocolError(RuntimeError):
    """The table uses a protocol feature this minimal reader cannot honor."""


class DeltaLogReader:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self._log_dir = os.path.join(self.path, "_delta_log")

    def versions(self) -> list[int]:
        if not os.path.isdir(self._log_dir):
            raise ValueError(f"no _delta_log at {self.path}")
        out = []
        for f in os.listdir(self._log_dir):
            if f.endswith(".checkpoint.parquet") or f == "_last_checkpoint":
                raise DeltaProtocolError(
                    "checkpointed Delta log: replay from JSON alone would be "
                    "incomplete; this minimal reader supports JSON-only logs"
                )
            if len(f) == 25 and f.endswith(".json") and f[:20].isdigit():
                out.append(int(f[:20]))
        return sorted(out)

    def _replay(self, version: int | None):
        versions = self.versions()
        if not versions:
            raise ValueError(f"empty _delta_log at {self.path}")
        target = versions[-1] if version is None else version
        if target not in versions:
            raise ValueError(f"no Delta version {version!r} at {self.path}")
        meta = None
        files: dict[str, dict] = {}
        for v in versions:
            if v > target:
                break
            with open(os.path.join(self._log_dir, f"{v:020d}.json")) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    action = json.loads(line)
                    if "protocol" in action:
                        proto = action["protocol"]
                        if proto.get("minReaderVersion", 1) > 1 or proto.get(
                            "readerFeatures"
                        ):
                            # reader-version >= 2 implies features (column
                            # mapping, DVs, ...) that change how data files
                            # must be interpreted; reading anyway would
                            # return silently-wrong rows (e.g. all-NULL
                            # under column mapping) — the protocol REQUIRES
                            # refusal here
                            raise DeltaProtocolError(
                                f"table requires Delta reader protocol {proto}; "
                                "this minimal reader supports minReaderVersion 1"
                            )
                    elif "metaData" in action:
                        meta = action["metaData"]
                    elif "add" in action:
                        add = action["add"]
                        if add.get("deletionVector"):
                            raise DeltaProtocolError(
                                "table uses deletion vectors; reading without "
                                "applying them would resurrect deleted rows"
                            )
                        files[add["path"]] = add
                    elif "remove" in action:
                        files.pop(action["remove"]["path"], None)
        if meta is None:
            raise DeltaProtocolError("log contains no metaData action")
        return meta, list(files.values())

    def read(self, version: int | None = None) -> DataFrame:
        meta, adds = self._replay(version)
        schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
        part_cols = meta.get("partitionColumns") or []
        file_schema = T.StructType(
            [f for f in schema.fields if f.name not in part_cols]
        )
        if not adds:
            return self.spark.createDataFrame([], schema)
        # group files by their partition assignment; each group reads with
        # the file schema and re-attaches the partition literals, cast
        # through the table schema (Delta stores them only in the log)
        from urllib.parse import unquote

        groups: dict[tuple, list[str]] = {}
        for add in adds:
            pv = add.get("partitionValues") or {}
            key = tuple(pv.get(c) for c in part_cols)
            # the protocol stores add.path RFC 2396 percent-encoded (spaces,
            # colons in partition dirs); join the DECODED form or valid
            # tables fail with path-not-found
            groups.setdefault(key, []).append(
                os.path.join(self.path, unquote(add["path"]))
            )
        out = None
        types = {f.name: f.dataType for f in schema.fields}
        for key, paths in sorted(groups.items(), key=lambda kv: repr(kv[0])):
            df = self.spark.read.schema(file_schema).parquet(*paths)
            for c, raw in zip(part_cols, key):
                df = df.withColumn(c, F.lit(raw).cast(types[c]))
            df = df.select(*[f.name for f in schema.fields])
            out = df if out is None else out.unionByName(df)
        return out
