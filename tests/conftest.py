from __future__ import annotations

import os

import pytest

# Pin the raw parquet-scan path for the whole suite: the plan-shape
# tests assert pushdown/pruning on the real scan (the only path that
# exists at 100 TB), and load_table memoizes frames per session so the
# knob cannot be flipped per-test. The cached path's value-parity is
# covered explicitly in test_plans.py::test_table_cache_value_parity.
os.environ.setdefault("SPARK_GRAFT_TABLE_CACHE", "0")

from newsmaper_etl_spark.session import get_spark

TEST_SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="newsmaper-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR
