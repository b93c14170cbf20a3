"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`newsmaper_etl_spark` — the engine package. The
driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the star-schema join+agg (SURVEY.md §2.3 J5)."""
    from newsmaper_etl_spark.plans.relational import q_star_join

    return q_star_join(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from newsmaper_etl_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from newsmaper_etl_spark.registry import all_oracles

    return all_oracles()
