"""Footer-only aggregates (sources/footerprune.py::agg_from_footers)."""

from __future__ import annotations

import pytest

from data_etl_pipeline_spark.sources.footerprune import agg_from_footers


@pytest.fixture(scope="module")
def data_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fagg") / "t")
    spark.range(0, 1000).selectExpr(
        "id AS k",
        "CASE WHEN id % 10 = 0 THEN NULL ELSE id * 3 END AS v",
        "repeat('x', 5) AS s",
    ).repartitionByRange(4, "k").write.parquet(d)
    return d


def test_agg_matches_scan(spark, data_dir):
    st = agg_from_footers(data_dir, "v")
    assert st["n_files"] == 4
    assert st["n_rows"] == 1000
    assert st["n_values"] == 900  # every 10th row NULL
    assert st["min"] == 3 and st["max"] == 999 * 3


def test_count_only_needs_no_column(data_dir):
    st = agg_from_footers(data_dir, None)
    assert st["n_rows"] == 1000 and st["min"] is None


def test_unknown_column_raises(data_dir):
    with pytest.raises(ValueError, match="not in parquet schema"):
        agg_from_footers(data_dir, "nope")


def test_missing_stats_refuse(spark, tmp_path):
    # parquet written with statistics disabled: the footer has no
    # min/max, so a footer-only MIN/MAX must refuse, never guess
    d = str(tmp_path / "nostats")
    spark.range(0, 10).selectExpr("id AS k").coalesce(1).write.option(
        "parquet.column.statistics.enabled", "false"
    ).parquet(d)
    import pyarrow.parquet as pq
    import glob

    f = glob.glob(d + "/*.parquet")[0]
    st = pq.ParquetFile(f).metadata.row_group(0).column(0).statistics
    if st is not None and st.has_min_max:
        pytest.skip("writer ignored the statistics-disable option")
    with pytest.raises(ValueError, match="lacks full statistics"):
        agg_from_footers(d, "k")


def test_empty_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        agg_from_footers(str(tmp_path), "k")
