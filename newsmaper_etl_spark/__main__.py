"""CLI: the reference's two DAGs as one command.

    python -m newsmaper_etl_spark \
        --warehouse /data/wh \
        --sources-csv sources.csv \
        --references-json references.json [--strict] [--dedup]

Equivalent to `setup_newsmaper_pipeline` (first run bootstraps the
warehouse: countries, sources, generated date dim, empty news) followed
by one `newsmaper_pipeline` run (fetch feeds → transform → idempotent
append; `--dedup` also runs the maintenance rewrite, Main.py:28-47).
Re-running is a no-op for already-loaded items (anti-join append).
Schedule it every 20 minutes for reference cadence, or use
streaming.pipeline for the Structured Streaming mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="newsmaper_etl_spark")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--sources-csv", required=True)
    p.add_argument("--references-json", required=True)
    p.add_argument("--strict", action="store_true",
                   help="fix the reference's pinned bugs (L4/L9) instead of reproducing them")
    p.add_argument("--dedup", action="store_true",
                   help="also run the keep-first maintenance rewrite")
    p.add_argument("--permissive", action="store_true",
                   help="skip unfetchable/malformed feeds instead of failing")
    p.add_argument("--date-start", default="2023-01-01 00:00:00")
    p.add_argument("--date-end", default="2023-12-31 23:00:00")
    args = p.parse_args(argv)

    from newsmaper_etl_spark import sinks
    from newsmaper_etl_spark.operators.newsmaper import run_pipeline
    from newsmaper_etl_spark.session import get_spark
    from newsmaper_etl_spark.sources import (
        read_references_json,
        read_rss,
        read_sources_csv,
    )

    spark = get_spark(app_name="newsmaper-pipeline")
    sources = read_sources_csv(spark, args.sources_csv)
    references = read_references_json(spark, args.references_json)

    if not os.path.exists(sinks.news_path(args.warehouse)):
        sinks.bootstrap(
            spark,
            args.warehouse,
            sources=sources,
            references=references,
            date_start=args.date_start,
            date_end=args.date_end,
        )

    articles = read_rss(spark, sources, permissive=args.permissive)

    date_dim = spark.read.parquet(os.path.join(args.warehouse, "date"))
    existing = sinks.read_news(spark, args.warehouse)
    new_rows = run_pipeline(
        articles=articles,
        references=references,
        date_dim=date_dim,
        news_existing=existing,
        strict=args.strict,
    )
    appended = sinks.append_news(spark, new_rows, args.warehouse)
    if args.dedup:
        sinks.rewrite_dedup(spark, args.warehouse)
    total = sinks.read_news(spark, args.warehouse).count()
    print(json.dumps({"appended": appended, "news_total": total}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
