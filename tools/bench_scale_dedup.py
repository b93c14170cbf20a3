#!/usr/bin/env python
"""Dedup/ANN scale-curve bench (VERDICT r06 'do this' #7).

Candidate-pair growth is the ONE superlinear risk the sf1.0 relational
rehearsal can't rule out: a banded LSH whose buckets degenerate (too-
coarse bands, skewed shingle basis) produces pairs ~quadratic in corpus
size, which no per-query wall-time at a single SF would reveal. This
tool runs the candidate-generating family over the sf0.1 / sf1.0 / sf3.0
documents+embeddings corpora (tools/gen_scale.py --tables
documents,embeddings) and records, per SF:

- wall time per operator,
- the candidate/pair COUNT, and
- the normalized telemetry (candidates per doc, pairs per vector)

so linear growth is a measured fact: a healthy bucketed design keeps
candidates-per-doc ~FLAT as the corpus scales (each doc meets the docs
in its buckets, whose occupancy tracks corpus density, not corpus
size). The replica construction (per-replica token shuffle, 5 % vector
noise) guarantees replicas are NOT near-duplicates of each other, so
the true-pair count also stays linear — any blowup is the machinery's.

Writes one JSON (default BENCH_SF3.json):
    {"sfs": {"0.1": {...}, "1.0": {...}, "3.0": {...}},
     "per_doc_growth": {...}, "verdict": "linear|SUPERLINEAR"}

Usage: python tools/bench_scale_dedup.py [--out BENCH_SF3.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the DECORRELATED corpora (gen_scale.py --decorrelate): replicas are
# distinct in every feature space the operators measure (shingles, token
# bags, embedding cosine), so near-dup DENSITY is constant across the
# curve and pair growth measures the machinery, not the corpus. The
# plain sf1.0 rehearsal corpus would contribute F²-growing hamming-0 /
# 0.997-cosine replica cliques by construction (measured: 2.6 M simhash
# pairs at factor 30 vs 525 at factor 1) — real signal about the
# corpus, zero signal about the engine.
SF_DIRS = {
    "0.1": "/root/testdata/sf0.1",
    "1.0": os.path.join(REPO, ".scale", "dedup-sf1.0"),
    "3.0": os.path.join(REPO, ".scale", "dedup-sf3.0"),
    "10.0": os.path.join(REPO, ".scale", "dedup-sf10"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SF3.json"))
    ap.add_argument(
        "--sfs",
        default="0.1,1.0,3.0",
        help="comma-separated SF keys to run (e.g. '0.1,1.0,3.0,10.0' "
        "for the BENCH_SF10 record — VERDICT r07 #5: the 64-bit SimHash "
        "bucket knee sits near 10^6 docs, past sf3's 150k)",
    )
    args = ap.parse_args()
    run_sfs = [s for s in args.sfs.split(",") if s in SF_DIRS]

    from pyspark.sql import functions as F

    from newsmaper_etl_spark.io import load_table
    from newsmaper_etl_spark.operators import dedup as D
    from newsmaper_etl_spark.operators import similarity as S
    from newsmaper_etl_spark.session import get_spark

    spark = get_spark(app_name="bench-scale-dedup")
    out: dict = {"sfs": {}}

    for sf in run_sfs:
        d = SF_DIRS[sf]
        if not os.path.isdir(d):
            print(f"sf{sf}: {d} missing — run tools/gen_scale.py first")
            continue
        docs = load_table(spark, d, "documents").select("doc_id", "text")
        emb = load_table(spark, d, "embeddings").select("vec_id", "embedding")
        n_docs = docs.count()
        n_vecs = emb.count()
        rec: dict = {"n_docs": n_docs, "n_vecs": n_vecs}

        def timed(name: str, fn, denom: int) -> None:
            t0 = time.time()
            n = fn().count()
            rec[name] = {
                "sec": round(time.time() - t0, 3),
                "count": n,
                "per_item": round(n / denom, 4),
            }

        timed(
            "minhash_candidates",
            lambda: D.minhash_lsh_candidates(docs, "doc_id", "text"),
            n_docs,
        )
        timed(
            "simhash_pairs",
            lambda: D.simhash_near_pairs(docs, "doc_id", "text", max_hamming=3),
            n_docs,
        )
        # the 128-bit variant (32-bit chunks): same pigeonhole recipe but
        # a 2^32 bucket space — the web-scale path. At these corpus sizes
        # the count difference vs 64-bit ≈ the random 16-bit-chunk
        # collisions the wider chunks no longer admit to verification.
        timed(
            "simhash128_pairs",
            lambda: D.simhash_near_pairs(
                docs, "doc_id", "text", max_hamming=6, bits=128
            ),
            n_docs,
        )
        # the embedding family counts BOTH surfaces: candidates (rows the
        # verify dot actually touches — the quantity that went quadratic
        # under single-table fixed-plane LSH; output-pair telemetry alone
        # masked it while wall time grew 7.8x for 3x data) and the
        # verified pairs the caller sees.
        timed(
            "embedding_candidates",
            lambda: S.embedding_near_dup_candidates(
                emb, dim=64, expected_rows=n_vecs
            ),
            n_vecs,
        )
        timed(
            "embedding_near_dups",
            lambda: S.embedding_near_dups(
                emb, dim=64, threshold=0.95, expected_rows=n_vecs
            ),
            n_vecs,
        )

        def _contam():
            toks = F.split(F.col("text"), " ", -1)
            eval_df = docs.filter(F.col("doc_id") % 97 == 0).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                F.array_join(F.slice(toks, 1, 20), " ").alias("text"),
            )
            return D.contamination_check(docs, eval_df, n=8)

        timed("contamination_hashed", _contam, n_docs)
        # substring-span dedup (r11): no pair join exists to blow up —
        # the risk profile is the gram groupBy's volume, linear in
        # corpus token count by construction — so the curve's job here
        # is the wall-time column; covered-position counts stay ~0 on
        # the decorrelated corpora (replicas share no 8-gram).
        timed(
            "substring_covered",
            lambda: D.duplicate_span_positions(docs, "doc_id", "text", k=8),
            n_docs,
        )
        # paragraph dedup (r12): same no-pair-join risk profile — one
        # window on the paragraph hash + the doc-gated rebuild;
        # decorrelated replicas share no full paragraph, so the
        # edited-doc count stays ~0 and wall time is the curve.
        timed(
            "paragraph_edited",
            lambda: D.paragraph_dedup(docs, "doc_id", "text").filter(
                F.col("n_removed") > 0
            ),
            n_docs,
        )

        # canonical-URL dedup (r13): one projection + one keep-first
        # window — no pair join, so the curve's job is wall time plus
        # the survivor count staying exactly half (every synthetic page
        # is spelled twice: with and without www/tracking params —
        # deterministic dedup work at every SF, count/doc flat 0.5).
        def _url_dedup():
            from newsmaper_etl_spark.operators import web as W

            d = F.col("doc_id")
            page = (d / 2).cast("long")
            urls = docs.select(
                "doc_id",
                F.concat(
                    F.lit("https://"),
                    F.when(d % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
                    F.lit("s"), F.pmod(page, F.lit(977)).cast("string"),
                    F.lit(".example.com/p/"), page.cast("string"),
                    F.when(d % 2 == 0, F.lit("?utm_source=curve"))
                    .otherwise(F.lit("")),
                ).alias("url"),
            )
            return W.url_dedup(urls, "url")

        timed("url_dedup_survivors", _url_dedup, n_docs)
        out["sfs"][sf] = rec
        print(f"sf{sf}: {json.dumps(rec)}")

    # growth verdict: per-item telemetry between successive SFs. Bucket
    # occupancy grows with corpus density, so a mild drift is expected;
    # >2x per-item growth over a 30x corpus would be superlinear pairing.
    growth = {}
    keys = [k for k in run_sfs if k in out["sfs"]]
    ops = (
        "minhash_candidates",
        "simhash_pairs",
        "simhash128_pairs",
        "embedding_candidates",
        "embedding_near_dups",
        "substring_covered",
        "url_dedup_survivors",
    )
    for op in ops:
        series = {k: out["sfs"][k][op]["per_item"] for k in keys}
        lo, hi = series[keys[0]], series[keys[-1]]
        growth[op] = {
            "per_item": series,
            "ratio_first_to_last": round(hi / lo, 3) if lo else None,
        }
    out["per_doc_growth"] = growth
    worst = max(
        (g["ratio_first_to_last"] or 0) for g in growth.values()
    )
    out["verdict"] = "linear" if worst <= 2.0 else "SUPERLINEAR"
    out["note"] = (
        "per_item = candidate pairs per doc (minhash/simhash) or per "
        "vector (embedding LSH); flat-ish per_item across 30x corpus "
        "growth = total pairs grow linearly"
    )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"verdict": out["verdict"], "growth": growth}))


if __name__ == "__main__":
    main()
