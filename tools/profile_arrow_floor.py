#!/usr/bin/env python
"""Decompose the ~0.26 s Arrow-stage floor (guide §4: the Python
boundary). Times, in one warm process, best-of-9 noop evaluations of:

  jvm_noop      — spark.range(1) (the sched floor)
  arrow_map     — 1-row mapInPandas identity (the bench's arrow floor)
  arrow_map_big — 100k-row mapInPandas identity (does it scale with rows?)
  pandas_udf1   — 1-row scalar pandas_udf projection
  reuse_same    — re-evaluating the SAME built mapInPandas frame
                  (does per-plan construction/codegen dominate?)
  two_arrow     — a plan with TWO chained mapInPandas stages (is the
                  handshake per stage or per job?)

Prints one JSON line. Worker pool is prewarmed first, so none of this
is cold-start.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd
from pyspark.sql import functions as F

from newsmaper_etl_spark.session import get_spark


def evaluate(df) -> None:
    df.write.format("noop").mode("append").save()


def best(fn, n=9) -> float:
    s = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        s.append(time.perf_counter() - t0)
    return round(min(s), 4)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(app_name="arrow-floor", shuffle_partitions=4)
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    @F.pandas_udf("double")
    def _warm(s: pd.Series) -> pd.Series:
        return s * 1.0

    evaluate(spark.range(0, cpus * 100, 1, cpus).select(_warm(F.col("id").cast("double"))))

    def _id(it):
        for pdf in it:
            yield pdf

    out = {}
    out["jvm_noop"] = best(lambda: evaluate(spark.range(1)))

    out["arrow_map"] = best(
        lambda: evaluate(spark.range(1).mapInPandas(_id, schema="id long"))
    )
    out["arrow_map_100k"] = best(
        lambda: evaluate(
            spark.range(100_000, numPartitions=1).mapInPandas(_id, schema="id long")
        )
    )
    out["pandas_udf_1row"] = best(
        lambda: evaluate(
            spark.range(1).select(_warm(F.col("id").cast("double")))
        )
    )
    built = spark.range(1).mapInPandas(_id, schema="id long")
    out["reuse_same_frame"] = best(lambda: evaluate(built))
    two = (
        spark.range(1)
        .mapInPandas(_id, schema="id long")
        .mapInPandas(_id, schema="id long")
    )
    out["two_arrow_stages"] = best(lambda: evaluate(two))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
