"""File-level min/max pruning over a RAW parquet directory.

Plain-parquet data lakes (no Delta/Iceberg manifest, no Hive partition
dirs) still carry per-row-group min/max statistics in every file footer.
Spark's pushed filters use them ONLY inside files it has already
scheduled — every file still becomes at least one task, gets opened, and
has its footer parsed on an executor. For a selective predicate over a
range-clustered layout, pruning at PLAN time from the footers cuts the
task count and file opens to the matching files alone — the same
skipping contract the VersionedTable manifest, the Delta stats, and the
Iceberg manifests (sources/iceberg.py) provide, done with zero table
format: the footer IS the metadata.

Cost: one driver-side footer read per file, O(files) and bounded by the
listing — at 100 TB with well-sized files (~1 GB) that is ~10^5 footer
reads once per query plan, amortizable with any external file index.
Row-group pushdown still applies INSIDE the selected files; this layer
only decides which files are worth scheduling at all.
"""

from __future__ import annotations

import glob
import os


def plan_parquet_files(
    data_dir: str, column: str, lo, hi
) -> tuple[list[str], int]:
    """Files under ``data_dir`` whose [min, max] on ``column`` intersects
    [lo, hi], from footer statistics alone. Files with no usable stats
    for the column are KEPT (pruning must never drop unknowable files).
    Returns (selected_paths, total_file_count)."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {data_dir}")
    selected = []
    for path in files:
        md = pq.ParquetFile(path).metadata
        mn = mx = None
        known = True
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            col = next(
                (g.column(c) for c in range(g.num_columns)
                 if g.column(c).path_in_schema == column),
                None,
            )
            st = col.statistics if col is not None else None
            if st is None or not st.has_min_max:
                known = False  # one stats-less row group poisons the file
                break
            mn = st.min if mn is None or st.min < mn else mn
            mx = st.max if mx is None or st.max > mx else mx
        if not known or mn is None or (mx >= lo and mn <= hi):
            selected.append(path)
    return selected, len(files)


def agg_from_footers(data_dir: str, column: str) -> dict:
    """COUNT(*) / COUNT(col) / MIN(col) / MAX(col) over a raw parquet
    directory computed from FOOTER METADATA ALONE — zero data pages are
    read (the same contract as Spark's
    ``spark.sql.parquet.aggregatePushdown`` for stats-only aggregates,
    done at plan level with no table format): row counts come from the
    row-group headers (always exact), null counts and min/max from the
    column statistics. Cost is one footer read per file, O(files).

    Exactness over silent wrongness: if ANY row group lacks statistics
    for ``column`` (or pyarrow reports truncated/unsafe min-max, as it
    can for long strings), the whole call raises — a footer-only answer
    that might differ from the scan is never returned. COUNT(*) alone
    never needs column stats; callers wanting just the row count pass
    ``column=None``.

    Returns {"n_rows", "n_values", "min", "max", "n_files"}
    (``n_values``/``min``/``max`` are None when ``column`` is None).
    """
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {data_dir}")
    n_rows = 0
    n_nulls = 0
    mn = mx = None
    for path in files:
        md = pq.ParquetFile(path).metadata
        n_rows += md.num_rows
        if column is None:
            continue
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            col = next(
                (g.column(c) for c in range(g.num_columns)
                 if g.column(c).path_in_schema == column),
                None,
            )
            if col is None:
                raise ValueError(
                    f"{path}: column {column!r} not in parquet schema"
                )
            st = col.statistics
            if st is None or not st.has_min_max or st.null_count is None:
                raise ValueError(
                    f"{path}: row group {rg} lacks full statistics for "
                    f"{column!r} — footer-only aggregate would be a guess"
                )
            n_nulls += st.null_count
            mn = st.min if mn is None or st.min < mn else mn
            mx = st.max if mx is None or st.max > mx else mx
    if column is None:
        return {"n_rows": n_rows, "n_values": None, "min": None,
                "max": None, "n_files": len(files)}
    return {
        "n_rows": n_rows,
        "n_values": n_rows - n_nulls,
        "min": mn,
        "max": mx,
        "n_files": len(files),
    }
