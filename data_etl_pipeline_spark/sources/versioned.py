"""Versioned table layer: MERGE / DELETE WHERE / replaceWhere / time travel
over plain parquet (SURVEY §1.4 mappings: S4 S3-version lineage -> time
travel, ST2 idempotent upsert -> MERGE, S13 ``DELETE WHERE STRSTARTS`` ->
delete_where; reference graph_db_manufacturer_service.py:10-33 and
s3_util.py version checks).

Delta/Iceberg are the production implementations of this seam — neither is
installable in this sandbox, so the layer reproduces their SEMANTICS over
parquet snapshots plus a JSON commit log:

    <path>/_log/v{N}.json       {"version", "op", "num_rows", "detail"}
    <path>/v{N}/part-*.parquet  full snapshot for version N

Every operation is copy-on-write: it reads the latest snapshot, applies the
change as a DataFrame plan (join/filter/union — all executor-side), and
writes the next snapshot atomically-enough for a single writer (the log
entry is written only after the snapshot commit succeeds; readers resolve
the latest version FROM THE LOG, so a torn snapshot write is invisible).

Scale notes, explicit because this is the part Delta does better:
  * MERGE here rewrites the full table; Delta/Iceberg prune to touched
    files. The API (merge keys, condition pushdown) is identical, so
    swapping the backend does not change callers.
  * Snapshots store full copies; table formats store deltas + manifests.
  * Concurrent writers need the format's optimistic log protocol — out of
    scope for the sandbox layer, same single-writer model as the
    reference's Mongo upserts.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class VersionedTable:
    """A keyed, versioned parquet table with table-format semantics."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self._log_dir = os.path.join(self.path, "_log")

    # ---- log -------------------------------------------------------------

    def _versions(self) -> list[int]:
        if not os.path.isdir(self._log_dir):
            return []
        out = []
        for f in os.listdir(self._log_dir):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def history(self) -> list[dict]:
        """Commit log, oldest first (the time-travel index)."""
        entries = []
        for v in self._versions():
            with open(os.path.join(self._log_dir, f"v{v}.json")) as fh:
                entries.append(json.load(fh))
        return entries

    def _commit(self, df: DataFrame, op: str, detail: str) -> int:
        version = (self.latest_version() + 1) if self._versions() else 0
        snap = os.path.join(self.path, f"v{version}")
        df.write.mode("overwrite").parquet(snap)
        n = self.spark.read.parquet(snap).count()
        os.makedirs(self._log_dir, exist_ok=True)
        entry = {
            "version": version,
            "op": op,
            "num_rows": n,
            "detail": detail,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        # the log entry IS the commit: written last, so readers never see
        # a half-written snapshot as latest
        with open(os.path.join(self._log_dir, f"v{version}.json"), "w") as fh:
            json.dump(entry, fh)
        return version

    # ---- operations ------------------------------------------------------

    def write(self, df: DataFrame) -> int:
        """Create the table (version 0) or replace it wholesale."""
        return self._commit(df, "write", "full snapshot")

    def read(self, version: int | None = None) -> DataFrame:
        """Latest snapshot, or time-travel to an older version."""
        v = self.latest_version() if version is None else version
        if v is None or v not in self._versions():
            raise ValueError(f"no version {version!r} at {self.path}")
        return self.spark.read.parquet(os.path.join(self.path, f"v{v}"))

    def merge(self, updates: DataFrame, keys: list[str]) -> int:
        """Upsert: rows matching on ``keys`` are replaced by ``updates``,
        unmatched update rows are inserted (Delta ``MERGE WHEN MATCHED
        UPDATE SET * WHEN NOT MATCHED INSERT *``). Executor-side plan:
        anti-join current state against the update keys, union the
        updates. Re-merging the same batch is a no-op state change —
        ST2's idempotent at-least-once contract."""
        cur = self.read()
        kept = cur.join(updates.select(*keys).distinct(), on=keys, how="left_anti")
        merged = kept.unionByName(updates.select(*cur.columns))
        return self._commit(merged, "merge", f"keys={keys}")

    def delete_where(self, cond: Column | str) -> int:
        """DELETE WHERE: drop matching rows (S13 prefix-delete shape).
        Rows where the predicate is NULL are kept, matching SQL DELETE."""
        cond = F.expr(cond) if isinstance(cond, str) else cond
        keep = ~F.coalesce(cond, F.lit(False))
        return self._commit(self.read().where(keep), "delete", str(cond))

    def replace_where(self, df: DataFrame, cond: Column | str) -> int:
        """Delta ``replaceWhere``: atomically swap the partition(s)
        selected by ``cond`` with ``df`` (which must satisfy ``cond``)."""
        cond = F.expr(cond) if isinstance(cond, str) else cond
        kept = self.read().where(~F.coalesce(cond, F.lit(False)))
        return self._commit(kept.unionByName(df.where(cond)), "replace_where", str(cond))
