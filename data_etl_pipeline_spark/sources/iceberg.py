"""Apache Iceberg table-format v2 interop: snapshot exporter + reader.

Iceberg is the second half of the lakehouse world next to the Delta
interop pair (``delta_export.py`` / ``delta_reader.py``); its on-disk
contract (https://iceberg.apache.org/spec/) is

    table/metadata/vN.metadata.json      table metadata + snapshot log
    table/metadata/snap-*.avro           manifest LIST (one per snapshot)
    table/metadata/*-m*.avro             manifest files (data-file entries)
    table/data/...                       parquet data files

All Avro framing goes through the from-spec pure-Python OCF codec in
``avro_ocf.py`` (no Avro runtime exists in this container). The exporter
publishes engine DataFrames as spec-correct v2 tables — field-id'd
schema, per-file column bounds in the manifests (serialized with
Iceberg's single-value binary forms), optional IDENTITY partitioning
(typed partition tuples in the manifest entries; the partition column
stays in the data files, as the spec requires — partitioning is
metadata, not Hive dirs), append snapshots that carry prior manifests
forward BY REFERENCE in the new manifest list — and the
reader plays the protocol back independently: version-hint ->
metadata.json -> current (or time-travelled) snapshot -> manifest list
-> manifests -> live data files, with min/max file pruning from the
manifest bounds, so a planner scans only the files whose stats box
intersects the predicate (the same skipping contract as the
VersionedTable manifest and Delta stats, expressed in Iceberg's format).

Scale: every metadata file is bounded by FILE COUNT, not row count — the
driver-side work is O(files); data bytes move only through the
distributed parquet scan of the selected files.

Reference parity: the reference ships no lakehouse writer (its storage
is an operational document DB); this extends the engine's export surface
the way SURVEY.md §2.11 E63+ did for Delta.

Honest limits (loud, not silent):
  * delete files (``content`` != 0) raise — the exporter never writes
    them, and masking foreign positional/equality deletes is out of
    scope (same stance as the Delta reader's file-DV refusal);
  * nested schemas refuse at export (field-id mapping for nested types
    is not implemented);
  * partition transforms other than identity refuse (bucket/truncate/
    time transforms are not implemented), as do NULL partition values
    and unbounded-cardinality partition columns (capped at 64 distinct
    values per commit);
  * codecs other than null/deflate raise inside the Avro layer.
"""

from __future__ import annotations

import glob
import json
import os
import struct
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from data_etl_pipeline_spark.sources.avro_ocf import read_ocf, write_ocf


class IcebergError(ValueError):
    pass


# ---------------------------------------------------------------------------
# schema: Spark <-> Iceberg (primitive fields, ids assigned 1..n)
# ---------------------------------------------------------------------------

_SPARK_TO_ICEBERG = {
    "long": "long",
    "bigint": "long",
    "int": "int",
    "integer": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    # Spark's session-tz timestamp is Iceberg's timestamptz; the
    # zone-less NTZ type is Iceberg's plain timestamp
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
}


def _iceberg_schema(df: DataFrame) -> dict:
    fields = []
    for i, f in enumerate(df.schema.fields, start=1):
        t = f.dataType.simpleString()
        if t.startswith("decimal"):
            ice = t.replace(",", ", ")
        elif t in _SPARK_TO_ICEBERG:
            ice = _SPARK_TO_ICEBERG[t]
        else:
            raise IcebergError(
                f"unsupported column type {t!r} for Iceberg export "
                "(primitive columns only; nested field-id mapping not implemented)"
            )
        fields.append(
            {"id": i, "name": f.name, "required": False, "type": ice}
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}


# Iceberg single-value binary serialization (spec appendix D) for the
# bounds maps: little-endian fixed width numerics, UTF-8 strings.


def _encode_bound(value, ice_type: str) -> bytes | None:
    if value is None:
        return None
    if ice_type == "int" or ice_type == "date":
        return struct.pack("<i", int(value))
    if ice_type in ("long", "timestamp", "timestamptz"):
        return struct.pack("<q", int(value))
    if ice_type == "float":
        return struct.pack("<f", float(value))
    if ice_type == "double":
        return struct.pack("<d", float(value))
    if ice_type == "string":
        return value.encode("utf-8") if isinstance(value, str) else bytes(value)
    if ice_type == "boolean":
        return b"\x01" if value else b"\x00"
    return None  # decimals etc.: bounds omitted, never wrong


def _decode_bound(raw: bytes | None, ice_type: str):
    if raw is None:
        return None
    if ice_type == "int" or ice_type == "date":
        return struct.unpack("<i", raw)[0]
    if ice_type in ("long", "timestamp", "timestamptz"):
        return struct.unpack("<q", raw)[0]
    if ice_type == "float":
        return struct.unpack("<f", raw)[0]
    if ice_type == "double":
        return struct.unpack("<d", raw)[0]
    if ice_type == "string":
        return raw.decode("utf-8", errors="replace")
    if ice_type == "boolean":
        return raw == b"\x01"
    return None


# ---------------------------------------------------------------------------
# Avro schemas for the two metadata file kinds (v2 required fields; the
# int-keyed maps use the array<key_value> form real writers emit, since
# Avro maps are string-keyed)
# ---------------------------------------------------------------------------


def _kv_array(name: str, key_id: int, value_id: int) -> dict:
    return {
        "type": "array",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "key", "type": "int", "field-id": key_id},
                {"name": "value", "type": "bytes", "field-id": value_id},
            ],
        },
        "logicalType": "map",
    }


def _manifest_entry_schema(part_fields: list[tuple[str, str]]) -> dict:
    """Manifest-entry Avro schema; the ``partition`` record (field-id 102)
    carries one field per partition-spec field — empty for unpartitioned
    tables, typed identity values otherwise (real writers do the same:
    the r102 record's shape is per-table)."""
    partition_record = {
        "type": "record",
        "name": "r102",
        "fields": [
            {"name": n, "type": ["null", t], "default": None, "field-id": 1000 + i}
            for i, (n, t) in enumerate(part_fields)
        ],
    }
    return {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None, "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "default": None, "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"], "default": None, "field-id": 4},
        {
            "name": "data_file",
            "field-id": 2,
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string", "field-id": 101},
                    {
                        "name": "partition",
                        "field-id": 102,
                        "type": partition_record,
                    },
                    {"name": "record_count", "type": "long", "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                    {
                        "name": "value_counts",
                        "type": ["null", _kv_array("k119_v120", 119, 120)],
                        "default": None,
                        "field-id": 109,
                    },
                    {
                        "name": "null_value_counts",
                        "type": ["null", _kv_array("k121_v122", 121, 122)],
                        "default": None,
                        "field-id": 110,
                    },
                    {
                        "name": "lower_bounds",
                        "type": ["null", _kv_array("k126_v127", 126, 127)],
                        "default": None,
                        "field-id": 125,
                    },
                    {
                        "name": "upper_bounds",
                        "type": ["null", _kv_array("k129_v130", 129, 130)],
                        "default": None,
                        "field-id": 128,
                    },
                ],
            },
        },
    ],
    }


MANIFEST_ENTRY_SCHEMA = _manifest_entry_schema([])

MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}


# value counts for the bounds: int-keyed {field_id: bytes} <-> avro kv array


def _to_kv(d: dict[int, bytes] | None) -> list | None:
    if not d:
        return None
    return [{"key": k, "value": v} for k, v in sorted(d.items())]


def _from_kv(v) -> dict[int, bytes]:
    """Accept both the kv-array form we (and real writers) emit and a
    plain Avro map with stringified keys (permissive foreign decode)."""
    if v is None:
        return {}
    if isinstance(v, dict):
        return {int(k): val for k, val in v.items()}
    return {e["key"]: e["value"] for e in v}


# ---------------------------------------------------------------------------
# per-file stats from parquet footers (driver-side, O(files))
# ---------------------------------------------------------------------------


def _file_stats(local_path: str, names: list[str], ice_types: dict[str, str]):
    import pyarrow.parquet as pq

    f = pq.ParquetFile(local_path)
    md = f.metadata
    lowers: dict[int, bytes] = {}
    uppers: dict[int, bytes] = {}
    idx = {n: i + 1 for i, n in enumerate(names)}  # field ids are 1..n
    per_col: dict[str, tuple] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for c in range(g.num_columns):
            col = g.column(c)
            st = col.statistics
            name = col.path_in_schema
            if name not in idx or st is None or not st.has_min_max:
                continue
            mn, mx = st.min, st.max
            if name in per_col:
                omn, omx = per_col[name]
                mn = mn if mn < omn else omn
                mx = mx if mx > omx else omx
            per_col[name] = (mn, mx)
    for name, (mn, mx) in per_col.items():
        t = ice_types[name]
        if t in ("timestamp", "timestamptz"):  # pyarrow datetimes -> micros since epoch
            import datetime as dt

            def _us(v):
                if isinstance(v, dt.datetime):
                    epoch = dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
                    return int((v - epoch).total_seconds() * 1_000_000)
                return int(v)

            mn, mx = _us(mn), _us(mx)
        elif t == "date":  # pyarrow dates -> days since epoch
            import datetime as dt

            def _days(v):
                if isinstance(v, dt.date):
                    return (v - dt.date(1970, 1, 1)).days
                return int(v)

            mn, mx = _days(mn), _days(mx)
        lo, hi = _encode_bound(mn, t), _encode_bound(mx, t)
        if lo is not None and hi is not None:
            lowers[idx[name]] = lo
            uppers[idx[name]] = hi
    return md.num_rows, os.path.getsize(local_path), lowers, uppers


# ---------------------------------------------------------------------------
# exporter
# ---------------------------------------------------------------------------



# identity-partition value types the exporter supports (avro form)
_PARTITIONABLE = {"int": "int", "long": "long", "string": "string"}

def _write_data_files(
    df: DataFrame, table_dir: str, snapshot_n: int, n_files: int, range_by: str | None
) -> list[str]:
    out_dir = os.path.join(table_dir, "data", f"snap{snapshot_n}")
    shaped = (
        df.repartitionByRange(n_files, range_by)
        if range_by and n_files > 1
        else df.coalesce(1) if n_files == 1 else df.repartition(n_files)
    )
    shaped.write.mode("overwrite").parquet(out_dir)
    files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    if not files:
        raise IcebergError("data write produced no parquet files")
    return files


def export_iceberg(
    df: DataFrame,
    table_dir: str,
    n_files: int = 1,
    range_by: str | None = None,
    partition_by: str | None = None,
) -> int:
    """Create a new Iceberg v2 table at ``table_dir`` holding ``df`` as
    snapshot 1. ``range_by`` range-partitions the write so data files
    carry DISJOINT bounds on that column (the stats-skipping layout);
    ``partition_by`` identity-partitions the table instead — each data
    file holds exactly one partition value, recorded as a typed tuple in
    the manifest (the partition column stays IN the data files, as the
    Iceberg spec requires — partitioning is metadata, not Hive dirs).
    Returns the snapshot id."""
    return _commit_snapshot(df, table_dir, n_files, range_by, partition_by, first=True)


def append_iceberg(
    df: DataFrame,
    table_dir: str,
    n_files: int = 1,
    range_by: str | None = None,
) -> int:
    """Append ``df`` as a new snapshot: prior manifests are carried
    forward by reference in the new manifest list; only the new files
    get a new manifest. A partitioned table's spec is inherited from the
    table metadata. Returns the new snapshot id."""
    return _commit_snapshot(df, table_dir, n_files, range_by, None, first=False)


_MAX_PARTITIONS_PER_COMMIT = 64


def _commit_snapshot(
    df: DataFrame,
    table_dir: str,
    n_files: int,
    range_by: str | None,
    partition_by: str | None,
    first: bool,
) -> int:
    meta_dir = os.path.join(table_dir, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    if first:
        prev = None
        version = 1
        schema = _iceberg_schema(df)
        table_uuid = str(uuid.uuid4())
        prior_manifests: list[dict] = []
        snapshots: list[dict] = []
        spec_fields: list[dict] = []
        if partition_by is not None:
            fld = next(
                (f for f in schema["fields"] if f["name"] == partition_by), None
            )
            if fld is None:
                raise IcebergError(f"partition column {partition_by!r} not in schema")
            if fld["type"] not in _PARTITIONABLE:
                raise IcebergError(
                    f"identity partitioning supports {sorted(_PARTITIONABLE)} "
                    f"columns, not {fld['type']!r}"
                )
            spec_fields = [
                {
                    "name": partition_by,
                    "transform": "identity",
                    "source-id": fld["id"],
                    "field-id": 1000,
                }
            ]
    else:
        prev = _load_table_metadata(table_dir)
        version = prev["_version"] + 1
        schema = _schema_by_id(prev)
        if [f["name"] for f in schema["fields"]] != df.columns:
            raise IcebergError(
                "append schema mismatch: table columns "
                f"{[f['name'] for f in schema['fields']]} vs batch {df.columns}"
            )
        table_uuid = prev["table-uuid"]
        cur = next(
            s for s in prev["snapshots"] if s["snapshot-id"] == prev["current-snapshot-id"]
        )
        prior_manifests, _ = read_ocf(_local(cur["manifest-list"], table_dir))
        snapshots = prev["snapshots"]
        # the spec is table metadata: appends inherit it
        spec = next(
            sp
            for sp in prev["partition-specs"]
            if sp["spec-id"] == prev.get("default-spec-id", 0)
        )
        spec_fields = spec["fields"]
        for sf in spec_fields:
            if sf.get("transform") != "identity":
                raise IcebergError(
                    f"unsupported partition transform {sf.get('transform')!r} "
                    "(identity only)"
                )

    snapshot_id = version  # deterministic, monotone
    seq = version
    names = [f["name"] for f in schema["fields"]]
    ice_types = {f["name"]: f["type"] for f in schema["fields"]}
    id_by_name = {f["name"]: f["id"] for f in schema["fields"]}
    part_avro = [
        (
            sf["name"],
            _PARTITIONABLE[
                next(f["type"] for f in schema["fields"] if f["id"] == sf["source-id"])
            ],
        )
        for sf in spec_fields
    ]

    if spec_fields:
        # one (or more) data files per partition VALUE — every file holds
        # exactly one partition tuple, the invariant manifests encode.
        # Identity partitioning is for bounded-cardinality columns; the
        # distinct collect is capped, refusing silently-unbounded specs.
        pcol = spec_fields[0]["name"]
        from pyspark.sql import functions as F

        values = [
            r[0]
            for r in df.select(pcol).distinct().limit(
                _MAX_PARTITIONS_PER_COMMIT + 1
            ).collect()
        ]
        if len(values) > _MAX_PARTITIONS_PER_COMMIT:
            raise IcebergError(
                f"more than {_MAX_PARTITIONS_PER_COMMIT} distinct values of "
                f"{pcol!r} in one commit — identity partitioning is for "
                "bounded-cardinality columns; bucket or truncate first"
            )
        if any(v is None for v in values):
            raise IcebergError(
                f"NULL partition value in {pcol!r}: null partition tuples "
                "are not supported"
            )
        files_with_parts: list[tuple[str, dict]] = []
        for i, v in enumerate(sorted(values)):
            part_dir = os.path.join(table_dir, "data", f"snap{version}", f"p{i}")
            df.where(F.col(pcol) == v).coalesce(1).write.mode("overwrite").parquet(
                part_dir
            )
            for fp in sorted(glob.glob(os.path.join(part_dir, "*.parquet"))):
                files_with_parts.append((fp, {pcol: v}))
        if not files_with_parts:
            raise IcebergError("partitioned data write produced no parquet files")
    else:
        files_with_parts = [
            (p, {})
            for p in _write_data_files(df, table_dir, version, n_files, range_by)
        ]

    entries = []
    added_rows = 0
    for p, part_tuple in files_with_parts:
        n_rows, size, lowers, uppers = _file_stats(p, names, ice_types)
        added_rows += n_rows
        entries.append(
            {
                "status": 1,  # ADDED
                "snapshot_id": snapshot_id,
                "sequence_number": None,  # inherited from the manifest list
                "file_sequence_number": None,
                "data_file": {
                    "content": 0,
                    "file_path": p,
                    "file_format": "PARQUET",
                    "partition": part_tuple,
                    "record_count": n_rows,
                    "file_size_in_bytes": size,
                    "value_counts": None,
                    "null_value_counts": None,
                    "lower_bounds": _to_kv(lowers),
                    "upper_bounds": _to_kv(uppers),
                },
            }
        )
    manifest_path = os.path.join(meta_dir, f"m{version}.avro")
    write_ocf(manifest_path, entries, _manifest_entry_schema(part_avro))

    new_manifest = {
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": 0,
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(files_with_parts),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": added_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }
    list_path = os.path.join(meta_dir, f"snap-{snapshot_id}.avro")
    write_ocf(list_path, [new_manifest] + prior_manifests, MANIFEST_LIST_SCHEMA)

    now_ms = int(time.time() * 1000)
    snapshots = snapshots + [
        {
            "snapshot-id": snapshot_id,
            "sequence-number": seq,
            "timestamp-ms": now_ms,
            "summary": {"operation": "append", "added-records": str(added_rows)},
            "manifest-list": list_path,
            "schema-id": 0,
        }
    ]
    meta = {
        "format-version": 2,
        "table-uuid": table_uuid,
        "location": table_dir,
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "last-column-id": len(names),
        "current-schema-id": 0,
        "schemas": [schema],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "last-partition-id": 999 + len(spec_fields),
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": snapshot_id,
        "snapshots": snapshots,
        "snapshot-log": [
            {"snapshot-id": s["snapshot-id"], "timestamp-ms": s["timestamp-ms"]}
            for s in snapshots
        ],
        "metadata-log": [],
    }
    meta_path = os.path.join(meta_dir, f"v{version}.metadata.json")
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(meta_path + ".tmp", meta_path)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(version))
    return snapshot_id


def _schema_by_id(meta: dict) -> dict:
    """Schema matched by current-schema-id (ids need not be dense or
    positional); format-version 1 tables carry a single ``schema``."""
    schemas = meta.get("schemas")
    if schemas:
        sid = meta.get("current-schema-id", 0)
        for sc in schemas:
            if sc.get("schema-id", 0) == sid:
                return sc
        raise IcebergError(
            f"current-schema-id {sid} not present in schemas "
            f"(have {[sc.get('schema-id') for sc in schemas]})"
        )
    if "schema" in meta:  # format-version 1
        return meta["schema"]
    raise IcebergError("table metadata carries no schema")


def _local(path: str, table_dir: str) -> str:
    """Resolve a metadata-referenced path to a local filesystem path.

    Real Iceberg writers record absolute URIs (``file:///...``,
    ``s3://bucket/...``); this engine's exporter records plain absolute
    paths. Accept both local forms, refuse remote schemes loudly
    (fetching object stores is out of scope for the local reader)."""
    if path.startswith("file:"):
        rest = path[len("file:"):]
        # accept file:///p and Hadoop's single-slash file:/p -> /p;
        # file://host/p (remote-host authority) is not supported
        if rest.startswith("///"):
            return rest[2:]
        if rest.startswith("/") and not rest.startswith("//"):
            return rest
        raise IcebergError(f"unsupported file URI form: {path!r}")
    scheme = path.split("://", 1)[0] if "://" in path else None
    if scheme:
        raise IcebergError(
            f"remote path scheme {scheme!r} is not supported by the local "
            f"reader (path {path!r}); copy the table locally first"
        )
    return path if os.path.isabs(path) else os.path.join(table_dir, path)


def _load_table_metadata(table_dir: str) -> dict:
    meta_dir = os.path.join(table_dir, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            version = int(f.read().strip())
        path = os.path.join(meta_dir, f"v{version}.metadata.json")
    else:
        cands = sorted(
            glob.glob(os.path.join(meta_dir, "v*.metadata.json")),
            key=lambda p: int(os.path.basename(p)[1:].split(".")[0]),
        )
        if not cands:
            raise IcebergError(f"no Iceberg metadata under {meta_dir}")
        path = cands[-1]
        version = int(os.path.basename(path)[1:].split(".")[0])
    with open(path) as f:
        meta = json.load(f)
    if meta.get("format-version") not in (1, 2):
        raise IcebergError(
            f"unsupported Iceberg format-version {meta.get('format-version')!r}"
        )
    meta["_version"] = version
    return meta


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


class IcebergTable:
    """Independent protocol replay of an Iceberg v2 table directory."""

    def __init__(self, spark: SparkSession, table_dir: str):
        self.spark = spark
        self.table_dir = table_dir
        self.meta = _load_table_metadata(table_dir)

    def snapshots(self) -> DataFrame:
        rows = [
            (
                s["snapshot-id"],
                s.get("sequence-number", 0),
                s["timestamp-ms"],
                s.get("summary", {}).get("operation"),
            )
            for s in self.meta["snapshots"]
        ]
        return self.spark.createDataFrame(
            rows, "snapshot_id long, sequence_number long, timestamp_ms long, operation string"
        )

    def _current_schema(self) -> dict:
        return _schema_by_id(self.meta)

    def _snapshot(self, snapshot_id: int | None) -> dict:
        sid = snapshot_id if snapshot_id is not None else self.meta["current-snapshot-id"]
        for s in self.meta["snapshots"]:
            if s["snapshot-id"] == sid:
                return s
        raise IcebergError(f"snapshot {sid} not in table (have "
                           f"{[s['snapshot-id'] for s in self.meta['snapshots']]})")

    def data_files(self, snapshot_id: int | None = None) -> list[dict]:
        """Live data files of a snapshot, with decoded per-column bounds."""
        snap = self._snapshot(snapshot_id)
        manifests, _ = read_ocf(_local(snap["manifest-list"], self.table_dir))
        schema = self._current_schema()
        by_id = {f["id"]: (f["name"], f["type"]) for f in schema["fields"]}
        out = []
        for m in manifests:
            if m.get("content", 0) != 0:
                raise IcebergError(
                    "delete manifests (content != 0) are not supported — this "
                    "reader replays append-only tables; masking positional/"
                    "equality deletes is out of scope"
                )
            entries, _ = read_ocf(_local(m["manifest_path"], self.table_dir))
            for e in entries:
                if e["status"] == 2:  # DELETED
                    continue
                dfile = e["data_file"]
                if dfile.get("content", 0) != 0:
                    raise IcebergError("delete data files are not supported")
                if dfile.get("file_format", "PARQUET").upper() != "PARQUET":
                    raise IcebergError(
                        f"unsupported data file format {dfile.get('file_format')!r}"
                    )
                lowers = _from_kv(dfile.get("lower_bounds"))
                uppers = _from_kv(dfile.get("upper_bounds"))
                out.append(
                    {
                        "path": dfile["file_path"],
                        "partition": dfile.get("partition") or {},
                        "record_count": dfile["record_count"],
                        "file_size_in_bytes": dfile["file_size_in_bytes"],
                        "lower": {
                            by_id[k][0]: _decode_bound(v, by_id[k][1])
                            for k, v in lowers.items()
                            if k in by_id
                        },
                        "upper": {
                            by_id[k][0]: _decode_bound(v, by_id[k][1])
                            for k, v in uppers.items()
                            if k in by_id
                        },
                    }
                )
        return out

    def plan_files(
        self, column: str, lo, hi, snapshot_id: int | None = None
    ) -> tuple[list[dict], int]:
        """Manifest-stats pruning: files whose [lower, upper] box on
        ``column`` intersects [lo, hi]. Files with no bounds for the
        column are kept (pruning must never drop unknowable files).
        Returns (selected_files, total_file_count)."""
        files = self.data_files(snapshot_id)
        selected = []
        for f in files:
            fl, fu = f["lower"].get(column), f["upper"].get(column)
            if fl is None or fu is None or (fu >= lo and fl <= hi):
                selected.append(f)
        return selected, len(files)

    def plan_files_by_partition(
        self, column: str, values, snapshot_id: int | None = None
    ) -> tuple[list[dict], int]:
        """Partition pruning: files whose manifest partition tuple has
        ``column`` in ``values``. Files without that partition key are
        KEPT (pruning never drops unknowable files). Returns
        (selected_files, total_file_count)."""
        values = set(values)
        files = self.data_files(snapshot_id)
        selected = [
            f
            for f in files
            if column not in f["partition"] or f["partition"][column] in values
        ]
        return selected, len(files)

    def read(
        self, snapshot_id: int | None = None, files: list[dict] | None = None
    ) -> DataFrame:
        chosen = files if files is not None else self.data_files(snapshot_id)
        paths = [_local(f["path"], self.table_dir) for f in chosen]
        if not paths:
            raise IcebergError("snapshot has no live data files")
        return self.spark.read.parquet(*paths)
