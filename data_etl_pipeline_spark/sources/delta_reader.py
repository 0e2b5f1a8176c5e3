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
  * CHECKPOINTS: real tables checkpoint every ~10 commits and may vacuum
    the JSON commits the checkpoint covers. ``_replay`` starts from the
    newest classic checkpoint parquet at or below the target version
    (single-file ``%020d.checkpoint.parquet`` or multi-part
    ``%020d.checkpoint.%010d.%010d.parquet`` — the checkpoint is a
    parquet of the SAME actions, columnar) and replays only the JSON
    commits after it; time travel to a pre-checkpoint version falls back
    to pure-JSON replay when those commits still exist. UUID-named V2
    checkpoints (readerFeature ``v2Checkpoint``) fail loudly.
  * DELETION VECTORS, inline: an ``add.deletionVector`` with storageType
    ``"i"`` carries a Z85-encoded serialized RoaringBitmapArray of
    deleted row indexes; the reader decodes it and anti-joins the file's
    rows on ``_metadata.row_index`` so deleted rows stay dead. File-based
    DVs (storageType ``"u"``/``"p"`` — the large ones) fail loudly rather
    than resurrect rows. Inline DVs are small by protocol design, so
    materializing the (file, row_index) pairs driver-side for the
    broadcast anti-join is bounded.
  * remaining unsupported features keep failing loudly: column mapping /
    minReaderVersion 2, reader features beyond deletionVectors.

Write support intentionally does not exist here: the engine's own
VersionedTable covers the write path; writing a foreign table's log
without its full protocol (invariants, DVs, column mapping) would corrupt
it.  The Z85/roaring ENCODERS at the bottom exist to build
protocol-correct DV fixtures for tests and interop queries (and give the
decoder a symmetry check against hand-derived byte vectors).
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DeltaProtocolError(RuntimeError):
    """The table uses a protocol feature this minimal reader cannot honor."""


_CP_SINGLE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")
_CP_MULTI = re.compile(r"^(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet$")
_CP_V2 = re.compile(r"^(\d{20})\.checkpoint\.[0-9a-fA-F-]{36}\.(json|parquet)$")
_COMMIT = re.compile(r"^(\d{20})\.json$")


class DeltaLogReader:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self._log_dir = os.path.join(self.path, "_delta_log")

    # -- log directory scan -------------------------------------------------
    def _scan(self) -> tuple[list[int], dict[int, list[str]]]:
        """Returns (sorted JSON commit versions, {checkpoint version ->
        its parquet part files in order})."""
        if not os.path.isdir(self._log_dir):
            raise ValueError(f"no _delta_log at {self.path}")
        commits: list[int] = []
        cps: dict[int, list[tuple[int, str]]] = {}
        for f in os.listdir(self._log_dir):
            full = os.path.join(self._log_dir, f)
            if m := _COMMIT.match(f):
                commits.append(int(m.group(1)))
            elif m := _CP_SINGLE.match(f):
                cps.setdefault(int(m.group(1)), []).append((0, full))
            elif m := _CP_MULTI.match(f):
                v, part, total = int(m.group(1)), int(m.group(2)), int(m.group(3))
                cps.setdefault(v, []).append((part, full))
            elif _CP_V2.match(f):
                raise DeltaProtocolError(
                    "UUID-named V2 checkpoint found; this reader supports "
                    "classic checkpoints only (readerFeature v2Checkpoint)"
                )
        return sorted(commits), {
            v: [p for _, p in sorted(parts)] for v, parts in cps.items()
        }

    def versions(self) -> list[int]:
        """All version numbers the log knows about (JSON commits plus
        checkpoint versions — a checkpoint IS the state at its version, so
        it is readable even if its JSON commits were vacuumed)."""
        commits, cps = self._scan()
        out = sorted(set(commits) | set(cps))
        if not out:
            raise ValueError(f"empty _delta_log at {self.path}")
        return out

    # -- protocol/action handling ------------------------------------------
    @staticmethod
    def _check_protocol(proto: dict) -> None:
        mrv = proto.get("minReaderVersion", 1)
        feats = set(proto.get("readerFeatures") or [])
        if mrv == 1 and not feats:
            return
        if mrv == 2 and not feats:
            # column-mapping capability: honored for mode 'name'/'none';
            # mode 'id' refuses at metaData handling with a precise message
            return
        if mrv == 3 and feats <= {"deletionVectors", "columnMapping"}:
            return  # both features are honored (or refused per-file/mode)
        # unknown features change how data files must be interpreted —
        # reading anyway would return silently-wrong rows, so the protocol
        # REQUIRES refusal here
        raise DeltaProtocolError(
            f"table requires Delta reader protocol {proto}; this reader "
            "supports minReaderVersion 1, 2 (column mapping mode "
            "'name'/'none'), or 3 with readerFeatures [deletionVectors, "
            "columnMapping]"
        )

    def _load_checkpoint(self, paths: list[str]) -> tuple[dict | None, dict[str, dict]]:
        """State from a classic checkpoint parquet: protocol check, last
        metaData, and the complete add-file set (remove rows are vacuum
        tombstones — checkpoint state already excludes their files)."""
        meta = None
        files: dict[str, dict] = {}
        cp = self.spark.read.parquet(*paths)
        cols = set(cp.columns)
        for row in cp.collect():
            d = row.asDict(recursive=True)
            if "protocol" in cols and d.get("protocol") and d["protocol"].get("minReaderVersion") is not None:
                self._check_protocol({k: v for k, v in d["protocol"].items() if v is not None})
            if "metaData" in cols and d.get("metaData") and d["metaData"].get("schemaString"):
                meta = d["metaData"]
            if "add" in cols and d.get("add") and d["add"].get("path"):
                add = d["add"]
                files[add["path"]] = add
        return meta, files

    def _replay(self, version: int | None):
        commits, cps = self._scan()
        all_versions = sorted(set(commits) | set(cps))
        if not all_versions:
            raise ValueError(f"empty _delta_log at {self.path}")
        target = all_versions[-1] if version is None else version
        if target not in all_versions:
            raise ValueError(f"no Delta version {version!r} at {self.path}")
        commit_set = set(commits)
        # basis: newest checkpoint <= target whose follow-up JSON commits
        # all exist; else pure-JSON replay 0..target; else the log has a
        # vacuumed hole and replay would silently miss actions
        basis = None
        for cv in sorted(cps, reverse=True):
            if cv <= target and all(v in commit_set for v in range(cv + 1, target + 1)):
                basis = cv
                break
        meta: dict | None = None
        files: dict[str, dict] = {}
        if basis is not None:
            meta, files = self._load_checkpoint(cps[basis])
            replay_from = basis + 1
        else:
            if not all(v in commit_set for v in range(0, target + 1)):
                raise DeltaProtocolError(
                    f"cannot reconstruct version {target}: JSON commits are "
                    "missing (vacuumed?) and no usable checkpoint at or "
                    "below it exists"
                )
            replay_from = 0
        for v in range(replay_from, target + 1):
            with open(os.path.join(self._log_dir, f"{v:020d}.json")) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    action = json.loads(line)
                    if "protocol" in action:
                        self._check_protocol(action["protocol"])
                    elif "metaData" in action:
                        meta = action["metaData"]
                    elif "add" in action:
                        add = action["add"]
                        files[add["path"]] = add
                    elif "remove" in action:
                        files.pop(action["remove"]["path"], None)
        if meta is None:
            raise DeltaProtocolError("log contains no metaData action")
        return meta, list(files.values())

    # -- snapshot read ------------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        meta, adds = self._replay(version)
        schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
        part_cols = meta.get("partitionColumns") or []
        # COLUMN MAPPING (mode 'name'): data files and partitionValues use
        # PHYSICAL column names (schema-field metadata
        # delta.columnMapping.physicalName); the reader scans under the
        # physical schema and renames back to logical. Mode 'id' (parquet
        # field-id matching) refuses with a precise message rather than
        # returning all-NULL columns.
        config = meta.get("configuration") or {}
        cm_mode = config.get("delta.columnMapping.mode", "none")
        if cm_mode not in ("none", "name"):
            raise DeltaProtocolError(
                f"column mapping mode {cm_mode!r} is not supported; this "
                "reader handles 'name' and 'none' (field-id matching needs "
                "a parquet-level id-aware scan)"
            )
        if cm_mode == "name":
            phys = {}
            for f in schema.fields:
                pn = (f.metadata or {}).get("delta.columnMapping.physicalName")
                if not pn:
                    raise DeltaProtocolError(
                        "column mapping mode 'name' but field "
                        f"{f.name!r} carries no physicalName metadata"
                    )
                phys[f.name] = pn
        else:
            phys = {f.name: f.name for f in schema.fields}
        data_fields = [f for f in schema.fields if f.name not in part_cols]
        file_schema = T.StructType(
            [T.StructField(phys[f.name], f.dataType, f.nullable) for f in data_fields]
        )
        rename = [F.col(phys[f.name]).alias(f.name) for f in data_fields]
        if not adds:
            return self.spark.createDataFrame([], schema)
        # group files by their partition assignment; each group reads with
        # the file schema and re-attaches the partition literals, cast
        # through the table schema (Delta stores them only in the log)
        from urllib.parse import unquote

        # DV-bearing files are read INDIVIDUALLY with an anti-join on
        # row_index alone — never by matching reconstructed paths against
        # _metadata.file_path, whose URI encoding (percent-escapes for
        # spaces/colons) differs from the decoded on-disk path and would
        # silently resurrect deleted rows on any table with encodable
        # characters in its paths. One plan branch per DV file is bounded
        # by the snapshot's DV-carrying file count (a minority by
        # construction: rewrites purge DVs).
        groups: dict[tuple, list[str]] = {}  # plain files, batched per partition
        dv_reads: list[tuple[tuple, str, list[int]]] = []  # (key, path, indexes)
        for add in adds:
            pv = add.get("partitionValues") or {}
            # partitionValues are keyed by PHYSICAL names under column
            # mapping (identical to logical without it)
            key = tuple(pv.get(phys[c]) for c in part_cols)
            # the protocol stores add.path RFC 2396 percent-encoded (spaces,
            # colons in partition dirs); join the DECODED form or valid
            # tables fail with path-not-found
            full = os.path.join(self.path, unquote(add["path"]))
            dv = add.get("deletionVector")
            if not dv:
                groups.setdefault(key, []).append(full)
                continue
            if dv.get("storageType") != "i":
                raise DeltaProtocolError(
                    "file-based deletion vectors (storageType "
                    f"{dv.get('storageType')!r}) are not supported; this "
                    "reader applies inline ('i') deletion vectors only — "
                    "reading without applying them would resurrect "
                    "deleted rows"
                )
            idxs = decode_inline_dv(dv["pathOrInlineDv"])
            card = dv.get("cardinality")
            if card is not None and int(card) != len(idxs):
                raise DeltaProtocolError(
                    f"deletion vector cardinality mismatch on "
                    f"{add['path']}: declared {card}, decoded {len(idxs)}"
                )
            dv_reads.append((key, full, idxs))
        out = None
        types = {f.name: f.dataType for f in schema.fields}

        def attach(df: DataFrame, key: tuple) -> DataFrame:
            for c, raw in zip(part_cols, key):
                df = df.withColumn(c, F.lit(raw).cast(types[c]))
            return df.select(*[f.name for f in schema.fields])

        for key, paths in sorted(groups.items(), key=lambda kv: repr(kv[0])):
            df = self.spark.read.schema(file_schema).parquet(*paths).select(*rename)
            df = attach(df, key)
            out = df if out is None else out.unionByName(df)
        for key, path, idxs in sorted(dv_reads, key=lambda kv: kv[1]):
            df = self.spark.read.schema(file_schema).parquet(path).select(
                "*", F.col("_metadata.row_index").alias("__ri")
            )
            dv_df = self.spark.createDataFrame([(i,) for i in idxs], "__ri bigint")
            df = (
                df.join(F.broadcast(dv_df), "__ri", "left_anti")
                .drop("__ri")
                .select(*rename)
            )
            df = attach(df, key)
            out = df if out is None else out.unionByName(df)
        return out


# ---------------------------------------------------------------------------
# Inline deletion-vector codec (public formats: ZeroMQ Z85 and the
# RoaringFormatSpec portable serialization wrapped in Delta's 64-bit
# RoaringBitmapArray "portable" layout: uint32 LE magic 1681511377,
# int64 LE bitmap count, then each 32-bit roaring bitmap; array index =
# high 32 bits of the row index).
# ---------------------------------------------------------------------------
_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}
_RBA_MAGIC = 1681511377
_SERIAL_COOKIE = 12347
_SERIAL_COOKIE_NO_RUN = 12346


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError(f"Z85 length must be a multiple of 5, got {len(s)}")
    out = bytearray()
    for i in range(0, len(s), 5):
        acc = 0
        for ch in s[i : i + 5]:
            acc = acc * 85 + _Z85_INV[ch]
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"Z85 input must be a multiple of 4 bytes, got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, r = divmod(acc, 85)
            chunk.append(_Z85[r])
        out += reversed(chunk)
    return "".join(out)


def _roaring32_decode(data: bytes, pos: int) -> tuple[list[int], int]:
    cookie = int.from_bytes(data[pos : pos + 4], "little")
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        nrb = (size + 7) // 8
        runflags = data[pos + 4 : pos + 4 + nrb]
        p = pos + 4 + nrb
        has_offsets = size >= 4  # NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        runflags = bytes((size + 7) // 8)
        p = pos + 8
        has_offsets = True
    else:
        raise DeltaProtocolError(f"unrecognized roaring cookie {cookie}")
    keys, cards = [], []
    for _ in range(size):
        keys.append(int.from_bytes(data[p : p + 2], "little"))
        cards.append(int.from_bytes(data[p + 2 : p + 4], "little") + 1)
        p += 4
    if has_offsets:
        p += 4 * size
    vals: list[int] = []
    for i in range(size):
        key = keys[i] << 16
        if runflags[i // 8] & (1 << (i % 8)):
            nruns = int.from_bytes(data[p : p + 2], "little")
            p += 2
            for _ in range(nruns):
                start = int.from_bytes(data[p : p + 2], "little")
                length = int.from_bytes(data[p + 2 : p + 4], "little")
                p += 4
                vals.extend(key | v for v in range(start, start + length + 1))
        elif cards[i] <= 4096:
            for _ in range(cards[i]):
                vals.append(key | int.from_bytes(data[p : p + 2], "little"))
                p += 2
        else:  # bitmap container: 1024 uint64 words
            for wi in range(1024):
                w = int.from_bytes(data[p + wi * 8 : p + wi * 8 + 8], "little")
                base = key | (wi << 6)
                while w:
                    lsb = w & -w
                    vals.append(base | (lsb.bit_length() - 1))
                    w ^= lsb
            p += 8192
    return vals, p


def decode_rba(data: bytes) -> list[int]:
    """RoaringBitmapArray (Delta portable layout) -> sorted row indexes."""
    magic = int.from_bytes(data[0:4], "little")
    if magic != _RBA_MAGIC:
        raise DeltaProtocolError(f"bad RoaringBitmapArray magic {magic}")
    n = int.from_bytes(data[4:12], "little")
    pos = 12
    out: list[int] = []
    for hi in range(n):
        vals, pos = _roaring32_decode(data, pos)
        out.extend((hi << 32) | v for v in vals)
    return sorted(out)


def decode_inline_dv(encoded: str) -> list[int]:
    """Z85-decode + RBA-decode an add.deletionVector.pathOrInlineDv."""
    return decode_rba(z85_decode(encoded))


def _roaring32_encode(vals: list[int]) -> bytes:
    """32-bit roaring bitmap, portable format, array containers only —
    sufficient (and exact) for the small bitmaps inline DVs carry; the
    decoder handles the full container set for foreign tables."""
    by_key: dict[int, list[int]] = {}
    for v in sorted(set(vals)):
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    if any(len(c) > 4096 for c in by_key.values()):
        raise ValueError("encoder supports array containers (<=4096) only")
    size = len(by_key)
    out = bytearray()
    out += _SERIAL_COOKIE_NO_RUN.to_bytes(4, "little")
    out += size.to_bytes(4, "little")
    for key in sorted(by_key):
        out += key.to_bytes(2, "little")
        out += (len(by_key[key]) - 1).to_bytes(2, "little")
    off = 4 + 4 + 4 * size + 4 * size
    for key in sorted(by_key):
        out += off.to_bytes(4, "little")
        off += 2 * len(by_key[key])
    for key in sorted(by_key):
        for v in by_key[key]:
            out += v.to_bytes(2, "little")
    return bytes(out)


def encode_rba(vals: list[int]) -> bytes:
    by_hi: dict[int, list[int]] = {}
    for v in sorted(set(vals)):
        by_hi.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n = (max(by_hi) + 1) if by_hi else 0
    out = bytearray()
    out += _RBA_MAGIC.to_bytes(4, "little")
    out += n.to_bytes(8, "little")
    for hi in range(n):
        out += _roaring32_encode(by_hi.get(hi, []))
    return bytes(out)


def encode_inline_dv(indexes: list[int]) -> dict:
    """Build a protocol-shaped add.deletionVector dict for the given
    deleted row indexes (fixture/test helper; pads the RBA bytes to the
    4-byte alignment Z85 requires — trailing zero bytes decode as an
    incomplete trailing word the decoder never reaches because the bitmap
    count bounds the scan)."""
    data = encode_rba(sorted(set(indexes)))
    pad = (-len(data)) % 4
    data += b"\x00" * pad
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data),
        "sizeInBytes": len(data),
        "cardinality": len(set(indexes)),
    }
