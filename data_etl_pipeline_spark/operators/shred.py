"""Semi-structured JSON shredding with corpus-wide schema inference.

The VARIANT-column workflow every ingest pipeline needs: a string column
of JSON objects becomes typed top-level columns, with the key set and the
per-key type inferred from the WHOLE corpus (one pass), not a sampled
prefix. Nested objects/arrays stay as JSON text in their column — shred
again to go deeper.

Spark-first shape: values are pulled with ONE ``from_json`` into a
``map<string,string>`` (every scalar keeps its JSON text form, nested
values keep their JSON serialization), so inference is a single
explode + groupBy over (key, value-class) and the shred projection is
``element_at(map, key)`` casts — all codegen, no UDFs, no dynamic
``get_json_object`` paths. The inferred key list crosses the driver once,
bounded by ``max_keys`` (schema width, never row count).

Type lattice per key over non-null values: all integral -> long; else all
numeric -> double; else all true/false -> boolean; else string. A key
missing from a row shreds to NULL (JSON-null likewise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LONG_RE = r"^-?\d+$"
_NUM_RE = r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"


def infer_json_schema(
    df: DataFrame, json_col: str, max_keys: int = 1000
) -> list[tuple[str, str]]:
    """Corpus-wide (key, spark_type) inference for a JSON-object string
    column, sorted by key. Bounded by ``max_keys`` distinct keys —
    beyond that the column is not a schema, it is data (use the map
    form instead), so this refuses."""
    pairs = df.select(
        F.explode(F.from_json(F.col(json_col), "map<string,string>")).alias("k", "v")
    ).where(F.col("v").isNotNull())
    classed = pairs.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").rlike(_LONG_RE).cast("long")).alias("n_long"),
        F.sum(F.col("v").rlike(_NUM_RE).cast("long")).alias("n_num"),
        F.sum(F.col("v").isin("true", "false").cast("long")).alias("n_bool"),
    )
    rows = classed.limit(max_keys + 1).collect()
    if len(rows) > max_keys:
        raise ValueError(
            f"more than {max_keys} distinct JSON keys in {json_col!r}; "
            "this column is key-value data, not a schema — shred refuses"
        )
    out = []
    for r in sorted(rows, key=lambda r: r["k"]):
        if r["n_long"] == r["n"]:
            t = "long"
        elif r["n_num"] == r["n"]:
            t = "double"
        elif r["n_bool"] == r["n"]:
            t = "boolean"
        else:
            t = "string"
        out.append((r["k"], t))
    return out


def json_shred(
    df: DataFrame,
    json_col: str,
    id_cols: list[str],
    max_keys: int = 1000,
    schema: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Project ``json_col`` into typed top-level columns (alphabetical)
    next to ``id_cols``. Pass ``schema`` (from ``infer_json_schema``) to
    reuse an inference across batches — the incremental-ingest path where
    the schema is table state and new batches only validate against it."""
    if schema is None:
        schema = infer_json_schema(df, json_col, max_keys)
    m = F.from_json(F.col(json_col), "map<string,string>")
    # try_cast, not cast: under ANSI mode a value that stopped matching
    # its inferred type (schema reused across batches) must shred to
    # NULL, not fail the job
    return df.select(
        *id_cols,
        *[
            F.element_at(m, k).try_cast(t).alias(k)
            for k, t in schema
        ],
    )
