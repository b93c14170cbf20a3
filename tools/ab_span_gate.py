#!/usr/bin/env python
"""One-off in-process A/B for the r12 doc-gated span excision
(VERDICT r11 'do this' #1). Runs the span queries with the NEW
doc-gated `_excise_positions`, then swaps in a copy of the OLD
full-corpus-rebuild version and re-runs in the same process.
Prints one JSON line {query: {"new": sec, "old": sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F

from newsmaper_etl_spark.operators import dedup as D
from newsmaper_etl_spark.registry import QUERIES, _ensure_loaded
from newsmaper_etl_spark.session import get_spark

QUERY_NAMES = [
    "q_substring_dedup",
    "q_decontaminate_spans",
    "q_substring_incremental",
]


def _old_excise(df: DataFrame, covered: DataFrame, id_col: str,
                text_col: str) -> DataFrame:
    """The pre-r12 full-corpus rebuild, verbatim (git e1b936c)."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ", -1)).alias("pos", "tok"),
    )
    kept = toks.join(covered, on=[id_col, "pos"], how="left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("__txt"),
        F.count(F.lit(1)).alias("__kept"),
    )
    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("__orig"),
        F.size(F.split(F.col(text_col), " ", -1)).alias("__n"),
    )
    untouched = F.coalesce(F.col("__kept"), F.lit(0)) == F.col("__n")
    return base.join(rebuilt, on=id_col, how="left").select(
        F.col(id_col),
        F.when(F.col("__n").isNull(), F.lit(None).cast("string"))
        .when(untouched, F.col("__orig"))
        .otherwise(F.coalesce(F.col("__txt"), F.lit("")))
        .alias("text_dedup"),
        (F.coalesce(F.col("__n"), F.lit(0))
         - F.coalesce(F.col("__kept"), F.lit(0)))
        .cast("int")
        .alias("n_removed"),
    )


def evaluate(df: DataFrame) -> None:
    df.write.format("noop").mode("append").save()


def best_of(fn, repeat: int = 3) -> float:
    samples = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return min(samples)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    _ensure_loaded()
    spark = get_spark()
    new_fn, old_fn = D._excise_positions, _old_excise

    out: dict[str, dict[str, float]] = {}
    for name in QUERY_NAMES:
        q = QUERIES[name].fn
        evaluate(q(spark, sf_dir))  # warmup (new path)
        out[name] = {}
        for label, impl in (("new", new_fn), ("old", old_fn)):
            D._excise_positions = impl
            out[name][label] = round(best_of(lambda: evaluate(q(spark, sf_dir))), 3)
        D._excise_positions = new_fn
    print(json.dumps({"sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
