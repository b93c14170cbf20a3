"""Every declared query must hash-match its DuckDB oracle — the local
version of the driver's correctness gate (run at sf0.001 for speed;
the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from newsmaper_etl_spark.oracle import compare
from newsmaper_etl_spark.registry import QUERIES, _ensure_loaded

_ensure_loaded()

_ORACLE_CHECKED = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
_ROWS_ONLY = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", _ORACLE_CHECKED)
def test_oracle_match(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    res = compare(name, df, spec.oracle, sf_dir)
    assert res.ok, f"{name}: {res.detail} (spark={res.spark_rows} oracle={res.oracle_rows})"


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = QUERIES[name].fn(spark, sf_dir)
    assert df.count() >= 0
