"""Non-parquet sources with pinned schemas (SURVEY.md §2.1 S1/S4/S5).

- :mod:`rss`   — a Spark 4 Python DataSource registering the ``rss``
  format (the reference's primary entry point, Extract.py:9-27), plus the
  pure parsing helpers it is built from.
- :mod:`files` — batch CSV/JSON readers with explicit StructTypes for the
  source registry (Setup.py:59) and the keyword dictionary
  (Transform.py:11). Schema inference is a dev-only convenience; every
  production read pins its schema.
"""

from newsmaper_etl_spark.sources.files import (
    SOURCES_CSV_SCHEMA,
    REFERENCES_JSON_SCHEMA,
    read_references_json,
    read_sources_csv,
)
from newsmaper_etl_spark.sources.rss import (
    ARTICLE_SCHEMA,
    RssDataSource,
    parse_rss_items,
    read_rss,
    register_rss_source,
)

__all__ = [
    "ARTICLE_SCHEMA",
    "RssDataSource",
    "SOURCES_CSV_SCHEMA",
    "REFERENCES_JSON_SCHEMA",
    "parse_rss_items",
    "read_references_json",
    "read_rss",
    "read_sources_csv",
    "register_rss_source",
]
