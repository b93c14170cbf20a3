#!/usr/bin/env python
"""In-process subset benchmark for contract-hog A/B work (round 11).

Runs a comma-separated list of query names (argv[1], default = the six
planted dedup-contract hogs from VERDICT r10 'do this' #1+#2) at
$SPARK_GRAFT_SF_DIR with the bench.py methodology in miniature: one
untimed warmup pass over the subset, then best-of-N noop-sink evaluation
per query. Prints one JSON line {name: sec}. Use for before/after A/B in
ONE process — only in-process comparisons are trustworthy on this box
(BENCH box noise: ±20% run-to-run)."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from newsmaper_etl_spark.registry import QUERIES, _ensure_loaded
from newsmaper_etl_spark.session import get_spark

DEFAULT = (
    "q_curate_incremental_planted,q_semantic_dedup_planted,"
    "q_minhash_incremental_planted,q_minhash_dedup_planted,"
    "q_semantic_incremental_planted,q_semantic_dedup_near_planted"
)


def evaluate(df) -> None:
    df.write.format("noop").mode("append").save()


def best_of(fn, repeat: int) -> float:
    samples = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return min(samples)


def main() -> None:
    names = (sys.argv[1] if len(sys.argv) > 1 else DEFAULT).split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))
    _ensure_loaded()
    spark = get_spark(app_name="newsmaper-bench-subset", shuffle_partitions=4)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # warmup: JVM + codegen + parquet footers + fixture caches
    for n in names:
        evaluate(QUERIES[n].fn(spark, sf_dir))
    out = {}
    for n in names:
        out[n] = round(best_of(
            lambda: evaluate(QUERIES[n].fn(spark, sf_dir)), repeat
        ), 3)
    out["__total"] = round(sum(v for k, v in out.items() if not k.startswith("__")), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
