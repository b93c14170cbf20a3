"""Declared query for the as-of join operator (SURVEY.md §2.3 J6).

The oracle expresses the same semantics relationally (LEFT JOIN on
key + range predicate, then MAX per left row) — correct but O(n·m)
per key; the engine's operator is the merge-join form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newsmaper_etl_spark.io import load_table
from newsmaper_etl_spark.operators.asof import asof_join
from newsmaper_etl_spark.registry import query


@query(
    "q_asof_join",
    oracle="""
        SELECT e.event_id,
               strftime(MAX(o.o_orderdate), '%Y-%m-%d %H:%M:%S') AS last_order
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        GROUP BY e.event_id
    """,
    tags=("J6", "ASOF"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most recent order at-or-before each event, per customer."""
    events = load_table(spark, sf_dir, "events").withColumnRenamed("user_id", "k")
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "k")
    joined = asof_join(
        events.select("k", "event_id", "ts"),
        orders.select("k", "o_orderdate"),
        on="k",
        left_ts="ts",
        right_ts="o_orderdate",
    )
    return joined.select(
        "event_id",
        F.date_format("asof_o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("last_order"),
    )
