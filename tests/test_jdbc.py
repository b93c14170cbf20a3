"""JDBC source/sink smoke test over embedded Derby (ships with Spark).

The reference's S2/S3 scans and S6 append sink are JDBC
(dags/Extract.py:32-37, dags/Load.py:28); io.read_jdbc/write_jdbc encode
that contract (partitioned reads for fact-sized tables, plain append with
idempotence delegated to the anti-join). This exercises the code path
end-to-end against `jdbc:derby:memory:` — same JVM, no external service —
closing the only never-executed source row from VERDICT r03.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from newsmaper_etl_spark.io import load_table, read_jdbc, write_jdbc

DERBY_URL = "jdbc:derby:memory:newsmaper_jdbc_test;create=true"
DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def seeded_nation(spark, sf_dir):
    """Write the nation dim once through the JDBC sink."""
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    write_jdbc(
        nation, DERBY_URL, "nation_jdbc", mode="overwrite", properties=DERBY_PROPS
    )
    return nation


def test_jdbc_roundtrip_matches_parquet_twin(spark, seeded_nation):
    """Plain (single-connection) read returns exactly what the parquet
    twin holds — value-level comparison, the driver-gate shape."""
    back = read_jdbc(spark, DERBY_URL, "nation_jdbc", properties=DERBY_PROPS)
    cols = ["n_nationkey", "n_name", "n_regionkey"]
    assert _rows(back.select(*cols), cols) == _rows(seeded_nation, cols)


def test_jdbc_partitioned_read(spark, seeded_nation):
    """Partitioned read (the contract: ALWAYS bound fact-sized scans)
    splits into numPartitions stride scans and loses no rows at the
    bound edges."""
    lo, hi = 0, 24
    back = read_jdbc(
        spark,
        DERBY_URL,
        "nation_jdbc",
        partition_column="n_nationkey",
        num_partitions=4,
        lower_bound=lo,
        upper_bound=hi,
        properties=DERBY_PROPS,
    )
    assert back.rdd.getNumPartitions() == 4
    cols = ["n_nationkey", "n_name", "n_regionkey"]
    assert _rows(back.select(*cols), cols) == _rows(seeded_nation, cols)


def test_jdbc_append_then_antijoin_idempotence(spark, seeded_nation):
    """S6 shape: the sink is plain append; re-running an extract must go
    through the anti-join filter, after which the append is a no-op."""
    from newsmaper_etl_spark.operators.newsmaper import append_new_rows

    existing = read_jdbc(spark, DERBY_URL, "nation_jdbc", properties=DERBY_PROPS)
    fresh = append_new_rows(
        seeded_nation, existing, keys=("n_nationkey", "n_name", "n_regionkey")
    )
    assert fresh.count() == 0  # everything already present
    write_jdbc(fresh, DERBY_URL, "nation_jdbc", mode="append", properties=DERBY_PROPS)
    back = read_jdbc(spark, DERBY_URL, "nation_jdbc", properties=DERBY_PROPS)
    assert back.count() == seeded_nation.count()

    # a genuinely new row flows through
    new_row = seeded_nation.limit(1).select(
        (F.col("n_nationkey") + 1000).alias("n_nationkey"),
        F.col("n_name"),
        F.col("n_regionkey"),
    )
    to_add = append_new_rows(
        new_row, back, keys=("n_nationkey", "n_name", "n_regionkey")
    )
    write_jdbc(to_add, DERBY_URL, "nation_jdbc", mode="append", properties=DERBY_PROPS)
    assert (
        read_jdbc(spark, DERBY_URL, "nation_jdbc", properties=DERBY_PROPS).count()
        == seeded_nation.count() + 1
    )
