#!/usr/bin/env python
"""Measure greedy-longest-match vs merge-rank BPE divergence on the
corpus (VERDICT r13 'do this' #3: the SCALE.md entry must carry a
measured number, not a claim): segment every document both ways under
the EQUIVALENT vocabulary (the merge products + single chars — what the
greedy tokenizer would load for the same model) and report how often
the segmentations differ and by how much the token counts drift.

Run from the repo root:
    python tools/ab_bpe_divergence.py [sf_dir]
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import functions as F

    from newsmaper_etl_spark.io import load_table
    from newsmaper_etl_spark.operators import text as TX
    from newsmaper_etl_spark.plans.extensions import _BPE_MERGES
    from newsmaper_etl_spark.session import get_spark

    spark = get_spark()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # the equivalent greedy vocabulary: every merge product + the single
    # characters occurring in the merges (OOV chars fall back in both)
    products = [left + right for left, right in _BPE_MERGES]
    chars = sorted({c for pair in _BPE_MERGES for part in pair for c in part})
    vocab = sorted(set(products) | set(chars))

    greedy = TX.bpe_tokenize(docs, vocab, out="n_greedy",
                             tokens_out="tk_greedy")
    both = TX.bpe_merge_tokenize(greedy, _BPE_MERGES, out="n_merge",
                                 tokens_out="tk_merge")
    agg = both.select(
        F.count(F.lit(1)).alias("docs"),
        F.sum((F.col("tk_greedy") != F.col("tk_merge")).cast("int"))
        .alias("docs_diverged"),
        F.sum("n_greedy").alias("tok_greedy"),
        F.sum("n_merge").alias("tok_merge"),
        F.sum(F.abs(F.col("n_greedy") - F.col("n_merge")))
        .alias("tok_abs_drift"),
    ).collect()[0]
    out = {
        "sf_dir": sf_dir,
        "vocab_size": len(vocab),
        "n_merges": len(_BPE_MERGES),
        "docs": agg["docs"],
        "docs_diverged": agg["docs_diverged"],
        "diverged_frac": round(agg["docs_diverged"] / agg["docs"], 4),
        "tok_greedy": agg["tok_greedy"],
        "tok_merge": agg["tok_merge"],
        "count_ratio_greedy_over_merge": round(
            agg["tok_greedy"] / agg["tok_merge"], 4
        ),
        "tok_abs_drift_frac": round(
            agg["tok_abs_drift"] / agg["tok_merge"], 4
        ),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
