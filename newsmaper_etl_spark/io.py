"""Table loaders for the driver testdata and registered temp views.

The testdata (TESTDATA.md) is one parquet file per table. At 100 TB the
same code path holds: ``spark.read.parquet`` over a partitioned directory
gives split-based parallelism, predicate pushdown, and column pruning for
free — nothing here materializes or collects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension-sized tables that should be broadcast in star joins. On a real
#: deployment this would key off table statistics / AQE; the explicit list
#: mirrors the reference's star schema where every dim is tiny relative to
#: the fact (SURVEY.md §1.1).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Lazy: no job is triggered.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark does
    not support as a timestamp — with ``spark.sql.legacy.parquet.
    nanosAsLong`` it arrives as a long of nanoseconds; convert to a real
    TimestampType by integer-dividing to microseconds (DuckDB's reader
    truncates nanos→micros the same way, keeping the oracle in lockstep).
    """
    if name == "events":
        # runtime-settable; required even when the session wasn't built by
        # get_spark (the driver hands us its own vanilla session)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Read every testdata table and register each as a temp view.

    Views make the corpus runnable through both the DataFrame API and
    ``spark.sql``; Catalyst sees identical plans either way.
    """
    tables: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        tables[name] = df
    return tables
