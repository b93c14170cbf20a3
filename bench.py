#!/usr/bin/env python
"""Benchmark harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully evaluated via the noop sink (computes every projected
column, writes nothing) — count() alone would let Catalyst prune the work.
One warmup query amortizes JVM/codegen startup out of the measurements.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import pandas as pd

from pyspark.sql import functions as F

from newsmaper_etl_spark.session import get_spark
from newsmaper_etl_spark.registry import QUERIES, _ensure_loaded


def evaluate(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    _ensure_loaded()
    spark = get_spark(app_name="newsmaper-bench")

    # warmup: JVM + codegen + parquet footer caches
    evaluate(QUERIES["q_star_join"].fn(spark, sf_dir))
    # prewarm the Python worker pool: a cold worker boots in ~10s+ on this
    # rig and local[N] launches N at once; pay that once, outside timings
    # (workers are reused afterwards — spark.python.worker.reuse default)
    @F.pandas_udf("double")
    def _warm(s: pd.Series) -> pd.Series:
        return s * 1.0

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    evaluate(
        spark.range(0, cpus * 100, 1, cpus).select(_warm(F.col("id").cast("double")))
    )

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        try:
            evaluate(QUERIES[name].fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 — a failing query must not kill the bench
            timings[name] = -1.0
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "declared-query wall clock (noop sink, warm JVM)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
