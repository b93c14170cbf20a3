"""Unit coverage for the toy-SF physical switches in io.py: the scale
gate, the fan_out no-op contract, and the tune guards. The suite runs
with SPARK_GRAFT_TABLE_CACHE=0 (conftest), so fan_out's repartition
branch is the active one here; the cached layout's value parity is in
test_plans.py::test_table_cache_value_parity."""

from __future__ import annotations

import os

from newsmaper_etl_spark import io as io_mod


def test_is_toy_parses_scale_factor():
    assert io_mod.is_toy("/root/testdata/sf0.001")
    assert io_mod.is_toy("/root/testdata/sf0.1")
    assert io_mod.is_toy("/data/sf0.2")
    assert not io_mod.is_toy("/data/sf1")
    assert not io_mod.is_toy("/data/sf100")
    # unknown dirs count as real scale: conservative 100 TB posture
    assert not io_mod.is_toy("/warehouse/events")


def test_fan_out_repartitions_at_toy_scale_when_cache_off(spark):
    df = spark.range(0, 1000, 1, 1)
    assert os.environ.get("SPARK_GRAFT_TABLE_CACHE") == "0"
    fanned = io_mod.fan_out(df, "/root/testdata/sf0.1")
    assert fanned.rdd.getNumPartitions() == io_mod.TOY_PARTS


def test_fan_out_is_noop_at_real_scale(spark):
    df = spark.range(0, 1000, 1, 1)
    assert io_mod.fan_out(df, "/warehouse/sf100") is df
    assert io_mod.fan_out(df, "/warehouse/events") is df


def test_fan_out_is_noop_under_table_cache(spark):
    df = spark.range(0, 1000, 1, 1)
    os.environ["SPARK_GRAFT_TABLE_CACHE"] = "1"
    try:
        assert io_mod.fan_out(df, "/root/testdata/sf0.1") is df
    finally:
        os.environ["SPARK_GRAFT_TABLE_CACHE"] = "0"


def test_tune_session_keeps_user_threshold(spark):
    """The 'a value set by the user is theirs to keep' guard: a
    non-default broadcast threshold must survive _tune_session."""
    prev_flag = getattr(spark, "_newsmaper_tuned", False)
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "5m")
        spark._newsmaper_tuned = False
        io_mod._tune_session(spark, "/root/testdata/sf0.001")
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "5m"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)
        spark._newsmaper_tuned = prev_flag
