"""Hot-paragraph skew A/B for paragraph_dedup's first-occurrence stage
(VERDICT r12 what's-wrong #1; the round-6 skew methodology): synthetic
corpora where ONE boilerplate paragraph appears in 30% of docs — the
operator's actual target shape — timed with the default window min vs
the salt= groupBy+join-back form, plus an output-parity check.

Usage: python tools/ab_paragraph_skew.py [n_docs ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from newsmaper_etl_spark.operators.dedup import paragraph_dedup


def corpus(spark: SparkSession, n: int):
    """n docs, 2 paragraphs each: a unique one, and for 30% of ids the
    SAME hot boilerplate paragraph (the cookie-banner shape)."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("unique body text number "), F.col("id").cast("string"),
            F.when(
                F.col("id") % 10 < 3,
                F.lit("\n\nall rights reserved hot boilerplate paragraph"),
            ).otherwise(
                F.concat(F.lit("\n\ntail "), F.col("id").cast("string"))
            ),
        ).alias("text"),
    )


def run(spark: SparkSession, n: int) -> None:
    df = corpus(spark, n).localCheckpoint()  # exclude gen cost
    for label, salt in (("window", None), ("two-phase", 1)):
        best = float("inf")
        agg = None
        for _ in range(2):
            t0 = time.time()
            got = (
                paragraph_dedup(df, salt=salt)
                .agg(
                    F.count("*"), F.sum("n_removed"),
                    F.sum(F.length("text_dedup")),
                )
                .collect()[0]
            )
            best = min(best, time.time() - t0)
            agg = tuple(got)
        print(f"n={n:>10,}  {label:<9}  best={best:6.2f}s  parity={agg}")


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 8_000_000]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    for n in sizes:
        run(spark, n)
    spark.stop()


if __name__ == "__main__":
    main()
