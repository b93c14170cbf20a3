#!/usr/bin/env python
"""Round-15 optimization profiler: per-query decomposition.

For each named query (argv[1] = comma list, default = the top bench
entries of the r15 local record), measures in ONE warm process:

  build_s   — QUERIES[name].fn(spark, sf_dir): plan construction
              (py4j + analysis; amortized for @plan_cached queries)
  eval_s    — best-of-N noop evaluation of the built frame
  jobs      — Spark jobs triggered by ONE evaluation (statusTracker
              job-group delta), the multi-job-machinery signal
  stages    — stages for those jobs

Prints one JSON line per query plus a total. The job/stage counts tell
floor-dominated queries (cost ≈ jobs × sched_floor + arrow handshakes)
apart from compute-dominated ones — guide §1 (measure first).
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

from newsmaper_etl_spark.registry import QUERIES, _ensure_loaded
from newsmaper_etl_spark.session import get_spark

DEFAULT = (
    "q_curate_corpus,q_semantic_dedup,q_psl_domain,q_domain_incremental,"
    "q_curate_corpus_planted,q_kmeans_fit,q_minhash_dedup,"
    "q_curate_incremental_planted,q_dsir_learn,q_curate_tokenized,"
    "q_dsir_hashed_parity,q_url_dedup,q_bpe_train_planted,"
    "q_paragraph_dedup,q_loader_pipeline,q_window_rank,q_url_filter,"
    "q_dsir_incremental,q_script_profile,q_bpe_bytes,q_url_canonical,"
    "q_bpe_ids,q_bpe_roundtrip,q_substring_dedup"
)


def evaluate(df) -> None:
    df.write.format("noop").mode("append").save()


def main() -> None:
    names = (sys.argv[1] if len(sys.argv) > 1 else DEFAULT).split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))
    _ensure_loaded()
    spark = get_spark(app_name="profile-r15", shuffle_partitions=4)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warmup: JVM + codegen + python workers (bench methodology)
    evaluate(QUERIES["q_star_join"].fn(spark, sf_dir))

    @F.pandas_udf("double")
    def _warm(s: pd.Series) -> pd.Series:
        return s * 1.0

    evaluate(spark.range(0, 3200, 1, 32).select(_warm(F.col("id").cast("double"))))
    for n in names:
        try:
            evaluate(QUERIES[n].fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"warmup {n} FAILED: {e}", file=sys.stderr)

    out = {}
    for n in names:
        t0 = time.perf_counter()
        df = QUERIES[n].fn(spark, sf_dir)
        build_s = time.perf_counter() - t0

        # job/stage count for ONE evaluation
        group = f"prof_{n}"
        sc.setJobGroup(group, n)
        evaluate(df)
        sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        for j in job_ids:
            ji = tracker.getJobInfo(j)
            if ji is not None:
                n_stages += len(ji.stageIds)

        samples = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            evaluate(QUERIES[n].fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        out[n] = {
            "build_s": round(build_s, 3),
            "eval_s": round(min(samples), 3),
            "jobs": len(job_ids),
            "stages": n_stages,
        }
        print(json.dumps({n: out[n]}), flush=True)

    total = round(sum(v["eval_s"] for v in out.values()), 3)
    print(json.dumps({"__total_eval": total, "n": len(out)}))


if __name__ == "__main__":
    main()
