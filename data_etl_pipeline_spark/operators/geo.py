"""Geohash encoding as pure integer arithmetic — the spatial bucketing
key for cell aggregation, neighbor joins, and geo data skipping.

A geohash of precision ``p`` is 5p bits: longitude and latitude are
quantized to ceil(5p/2) / floor(5p/2) bits of their ranges, the bits
interleave MSB-first starting with longitude, and each 5-bit group maps
to the geohash base32 alphabet. The whole encode is shifts/ands/adds on
two quantized integers, so it runs in whole-stage codegen (no UDF) and
the DuckDB oracle computes bit-identical cells from the same closed
form (the expression builders below emit both dialects from one loop —
they cannot drift apart).

Scale shape: encoding is row-local (zero shuffle); a cell aggregation
is one hash exchange on the cell key; prefix truncation gives coarser
cells for free (geohash prefixes nest).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bit_plan(precision: int) -> tuple[int, int, int]:
    """(total_bits, lng_bits, lat_bits) for a precision-p geohash."""
    total = 5 * precision
    lng_bits = (total + 1) // 2  # longitude leads the interleave
    lat_bits = total // 2
    return total, lng_bits, lat_bits


def _quant_sql(col: str, lo: float, span: float, bits: int) -> str:
    """Quantize ``col`` in [lo, lo+span] to ``bits`` bits (dialect-neutral:
    least/greatest/floor/cast exist in both Spark SQL and DuckDB)."""
    n = 1 << bits
    return (
        f"cast(least(greatest(floor((({col}) - ({lo})) / {span} * {n}.0), 0.0), "
        f"{n - 1}.0) as bigint)"
    )


def geohash_from_ints_sql(x_expr: str, y_expr: str, precision: int, shift_fn) -> str:
    """Geohash chars from ALREADY-QUANTIZED cell integers — the seam a
    neighbor join uses (neighbors are x±1/y±1 BEFORE interleaving).
    ``shift_fn(expr, by, dir)`` renders a shift in either dialect."""
    total, lng_bits, lat_bits = _bit_plan(precision)
    # interleave MSB-first, longitude first: z bit (total-1-k) takes
    # lng bit (lng_bits-1-j) at k=2j, lat bit (lat_bits-1-j) at k=2j+1
    terms = []
    for j in range(lng_bits):
        src_bit = lng_bits - 1 - j
        dst_bit = total - 1 - 2 * j
        terms.append(shift_fn(f"({shift_fn('__gx', src_bit, 'r')} & 1)", dst_bit, "l"))
    for j in range(lat_bits):
        src_bit = lat_bits - 1 - j
        dst_bit = total - 1 - (2 * j + 1)
        terms.append(shift_fn(f"({shift_fn('__gy', src_bit, 'r')} & 1)", dst_bit, "l"))
    z = "(" + " + ".join(terms) + ")"
    chars = []
    for c in range(precision):
        idx = f"({shift_fn(z, total - 5 * (c + 1), 'r')} & 31)"
        chars.append(f"substr('{_BASE32}', cast({idx} as int) + 1, 1)")
    concat = " || ".join(chars)
    # inline the int expressions at every bit reference; both engines
    # common-subexpression-eliminate the repeats
    return concat.replace("__gx", f"({x_expr})").replace("__gy", f"({y_expr})")


def geohash_sql(lat_expr: str, lng_expr: str, precision: int, shift_fn) -> str:
    """Geohash expression in either dialect from raw lat/lng. The two
    dialects share all text except the shift rendering, so the engines
    evaluate the SAME integer plan."""
    _total, lng_bits, lat_bits = _bit_plan(precision)
    x = _quant_sql(lng_expr, -180.0, 360.0, lng_bits)
    y = _quant_sql(lat_expr, -90.0, 180.0, lat_bits)
    return geohash_from_ints_sql(x, y, precision, shift_fn)


def quant_sql(lat_or_lng: str, axis: str, precision: int) -> str:
    """Quantized cell integer of one axis at ``precision`` (dialect-
    neutral) — the pre-interleave seam for neighbor enumeration."""
    _total, lng_bits, lat_bits = _bit_plan(precision)
    if axis == "lng":
        return _quant_sql(lat_or_lng, -180.0, 360.0, lng_bits)
    if axis == "lat":
        return _quant_sql(lat_or_lng, -90.0, 180.0, lat_bits)
    raise ValueError(f"axis must be 'lat' or 'lng', got {axis!r}")


def _spark_shift(expr: str, by: int, direction: str) -> str:
    fn = "shiftright" if direction == "r" else "shiftleft"
    return f"{fn}({expr}, {by})" if by else f"({expr})"


def _duckdb_shift(expr: str, by: int, direction: str) -> str:
    op = ">>" if direction == "r" else "<<"
    return f"(({expr}) {op} {by})" if by else f"({expr})"


def geohash_col(lat_expr: str, lng_expr: str, precision: int = 6) -> Column:
    """Spark Column: geohash of (lat, lng) at ``precision`` chars."""
    return F.expr(geohash_sql(lat_expr, lng_expr, precision, _spark_shift))


def geohash_duckdb(lat_expr: str, lng_expr: str, precision: int = 6) -> str:
    """DuckDB SQL fragment computing the identical geohash."""
    return geohash_sql(lat_expr, lng_expr, precision, _duckdb_shift)


def geohash_decode_bounds(gh: str) -> tuple[float, float, float, float]:
    """(lat_lo, lat_hi, lng_lo, lng_hi) of a geohash cell — driver-side
    reference decode for tests and bounding-box pruning."""
    total = 5 * len(gh)
    z = 0
    for ch in gh:
        z = (z << 5) | _BASE32.index(ch)
    lng_bits = (total + 1) // 2
    x = y = 0
    for k in range(total):
        bit = (z >> (total - 1 - k)) & 1
        if k % 2 == 0:
            x = (x << 1) | bit
        else:
            y = (y << 1) | bit
    lat_bits = total // 2
    lat_span = 180.0 / (1 << lat_bits)
    lng_span = 360.0 / (1 << lng_bits)
    return (
        -90.0 + y * lat_span,
        -90.0 + (y + 1) * lat_span,
        -180.0 + x * lng_span,
        -180.0 + (x + 1) * lng_span,
    )
