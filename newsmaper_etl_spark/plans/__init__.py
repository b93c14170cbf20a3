"""Correctness-query corpus (SURVEY.md §2.12).

Importing this package registers every declared query with
``newsmaper_etl_spark.registry``.

Import order IS registration order IS the order a budgeted driver
correctness run executes: round 1's run was cut after 50 entries and
dropped the tail (the then-last-registered text/multimodal queries), so
the corpus is ordered by information value — relational core and the
reference-pipeline golden first, oracle-checked extensions next, and the
rows-only hash-sketch queries (weakest check) last.
"""

from newsmaper_etl_spark.plans import (  # noqa: F401  (registers on import)
    relational,
    newsmaper_e2e,
    extensions,
    aggregates,
    windows,
    asofjoin,
    timeops,
    curation,
    tpch,
    sketches,
)
