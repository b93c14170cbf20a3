"""Correctness-query corpus (SURVEY.md §2.12).

Importing this package registers every declared query with
``newsmaper_etl_spark.registry``.
"""

from newsmaper_etl_spark.plans import (  # noqa: F401
    relational,
    aggregates,
    windows,
    timeops,
    asofjoin,
    newsmaper_e2e,
    extensions,
)
