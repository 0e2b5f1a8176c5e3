"""Delta-format SNAPSHOT EXPORT — the write half of lakehouse interop.

``sources/delta_reader.py`` reads foreign Delta tables; this module hands
a DataFrame BACK to the lakehouse as a brand-new, protocol-correct Delta
table (delta.io PROTOCOL.md): parquet data files plus a single
``_delta_log/00000000000000000000.json`` commit carrying ``protocol``
(minReaderVersion 1 — the export uses no optional feature, so every Delta
reader ever shipped can open it), ``metaData`` (schemaString, partition
columns) and one ``add`` per data file with real size/modificationTime.

This intentionally creates NEW tables only. Appending to or rewriting an
EXISTING foreign table's log is refused — honoring a foreign table's full
protocol (invariants, DVs, column mapping, writer features) is a Delta
writer's job, and a partial writer corrupts; the engine's own
VersionedTable covers the mutable-table write path, and a user promotes
its snapshots to the lakehouse through this export.

Partitioned export writes the standard Hive layout (``col=value/part-*``)
with partition values carried in the log, NOT in the data files — exactly
how real Delta writers lay tables out, so partition pruning works for any
downstream reader.
"""

from __future__ import annotations

import hashlib
import json
import os
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame


class DeltaExportError(RuntimeError):
    pass


def export_delta(
    df: DataFrame, dest: str, partition_by: list[str] | None = None
) -> dict:
    """Write ``df`` as a new single-commit Delta table at ``dest``.

    Returns {"n_files": ..., "bytes": ...} accounting. One distributed
    parquet write; the log commit is a driver-side listing of the written
    files (bounded by file count, never rows).
    """
    dest = dest.rstrip("/")
    log_dir = os.path.join(dest, "_delta_log")
    if os.path.isdir(log_dir):
        raise DeltaExportError(
            f"{dest} already has a _delta_log; refusing to touch an "
            "existing Delta table's log (export creates NEW tables only)"
        )
    partition_by = list(partition_by or [])
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dest)

    # enumerate data files exactly as written; partition values come from
    # the Hive path segments (the percent-encoded form Delta stores)
    adds = []
    total = 0
    for root, _dirs, files in os.walk(dest):
        if "_delta_log" in root:
            continue
        for f in files:
            if not f.endswith(".parquet"):
                continue
            full = os.path.join(root, f)
            rel = os.path.relpath(full, dest)
            pv = {}
            for seg in rel.split(os.sep)[:-1]:
                if "=" in seg:
                    k, v = seg.split("=", 1)
                    pv[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
            st = os.stat(full)
            total += st.st_size
            adds.append(
                {
                    "add": {
                        "path": quote(rel.replace(os.sep, "/")),
                        "partitionValues": pv,
                        "size": st.st_size,
                        "modificationTime": int(st.st_mtime * 1000),
                        "dataChange": True,
                    }
                }
            )
    adds.sort(key=lambda a: a["add"]["path"])
    os.makedirs(log_dir)
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "export-" + hashlib.md5(dest.encode()).hexdigest()[:12],
                "format": {"provider": "parquet", "options": {}},
                "schemaString": df.schema.json(),
                "partitionColumns": partition_by,
                "configuration": {},
                "createdTime": int(os.stat(dest).st_mtime * 1000),
            }
        },
        *adds,
    ]
    commit = os.path.join(log_dir, f"{0:020d}.json")
    tmp = commit + ".tmp"
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    os.rename(tmp, commit)
    return {"n_files": len(adds), "bytes": total}
