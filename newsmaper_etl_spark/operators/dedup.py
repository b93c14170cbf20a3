"""Deduplication operators for large-scale corpora.

Exact + three near-duplicate families, designed around their shuffle
profiles (the thing that decides 100 TB viability):

- exact_dedup          one hash-aggregate on the key (map-side partial).
- minhash_lsh          shingle→minhash→band→bucket-join. All JVM-side
                       (higher-order fns + xxhash64): signatures cost one
                       pass, candidate generation shuffles only
                       (band_id, band_hash) buckets — never all-pairs.
- simhash              64-bit signature via vectorized Pandas UDF (numpy
                       bit ops); near-dups = hamming distance on bucketed
                       prefixes.
- ngram_jaccard_pairs  exact Jaccard on token sets via token-inverted
                       index join; scoped (per-source) to bound the
                       candidate blowup — the exact/verification
                       counterpart to the sketch methods.

At 100 TB: exact/minhash/simhash all scale (linear scans + key-bucket
shuffles); ngram_jaccard is for in-bucket verification, not corpus-wide.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# Exact
# --------------------------------------------------------------------------

def exact_dedup(df: DataFrame, cols: list[str], id_col: str = "doc_id") -> DataFrame:
    """Survivor per exact-duplicate group = lowest id (deterministic,
    matches the reference's keep-first — ledger L7). One shuffle."""
    w = Window.partitionBy(*cols).orderBy(F.asc(id_col))
    return df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")


def exact_dup_groups(df: DataFrame, cols: list[str], id_col: str = "doc_id") -> DataFrame:
    """(keep_id, n_dups) per distinct key — the audit view of exact_dedup."""
    return df.groupBy(*cols).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups")
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def shingles_col(text_col: str, k: int = 3):
    """k-token shingles from whitespace tokens, as an array column (JVM
    higher-order functions; empty-safe)."""
    toks = F.split(F.col(text_col), " ", -1)
    n = F.size(toks)
    return F.when(n >= k, F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signature(
    df: DataFrame, text_col: str = "text", num_hashes: int = 16, k: int = 3
) -> DataFrame:
    """Append ``sig: array<bigint>`` — per seed s, min over shingles of
    xxhash64(s, shingle). No shuffle, no Python.

    The shingle array is materialized as its own named column first: the
    sig expression references it ``num_hashes`` times, and CollapseProject
    declines to inline a non-cheap expression with multiple references —
    so the O(n_tokens·k) shingle construction runs once per row instead of
    once per seed."""
    sh_df = df.withColumn("__shingles", shingles_col(text_col, k))
    sig = F.array(*[
        F.array_min(
            F.transform(F.col("__shingles"), lambda x, s=s: F.xxhash64(F.lit(s), x))
        )
        for s in range(num_hashes)
    ])
    return sh_df.withColumn("sig", sig).drop("__shingles")


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) that collide in ≥1 LSH
    band. rows = bands × docs before the bucket join; the self-join
    shuffles on (band, band_hash) so only same-bucket docs ever meet.
    """
    rows = num_hashes // bands
    sigged = minhash_signature(df, text_col, num_hashes, k).select(id_col, "sig")
    banded = sigged.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(*[F.col("sig").getItem(b * rows + r) for r in range(rows)]).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bh")
    left = banded.withColumnRenamed(id_col, "id_a")
    right = banded.withColumnRenamed(id_col, "id_b")
    return (
        left.join(right, on=["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Drop near-duplicates: LSH candidates → exact shingle-Jaccard
    verification → connected docs lose to their lowest-id candidate peer
    (single-link one level — the standard approximation that avoids an
    iterative connected-components pass; good enough when dup clusters
    are small, which LSH banding makes likely)."""
    cands = minhash_lsh_candidates(df, id_col, text_col, num_hashes, bands, k)
    verified = jaccard_verify(df, cands, id_col, text_col, k, round_digits=None).filter(
        F.col("jaccard") >= threshold
    )
    losers = verified.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs: explode each side's
    distinct shingles, count the intersection with a join keyed on
    (pair, shingle) — never materializes a cross product. Shingles are
    xxhash64-compressed before the explode: the shuffle/join key is 8
    bytes instead of a ~3-token string (collisions at 2^-64 are noise
    next to the MinHash approximation this verifies).

    ``round_digits=None`` returns the raw ratio — callers that THRESHOLD
    on jaccard must use the raw value (rounding first admits pairs in
    [threshold-ulp, threshold) that an exact engine rejects)."""
    sh = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(shingles_col(text_col, k), lambda x: F.xxhash64(x))
            )
        ).alias("s"),
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = sh.withColumnRenamed(id_col, "id_a")
    b = sh.withColumnRenamed(id_col, "id_b")
    inter = (
        pairs.join(a, on="id_a")
        .join(b, on=["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n", "n_a")
    nb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n", "n_b")
    raw = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    jacc = raw if round_digits is None else F.round(raw, round_digits)
    return (
        inter.join(na, on="id_a")
        .join(nb, on="id_b")
        .withColumn("jaccard", jacc)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str = "text", out: str = "simhash") -> DataFrame:
    """64-bit SimHash per document via a vectorized Pandas UDF.

    Bit-parallel majority over token hashes is genuinely awkward as SQL
    expressions (64 popcount lanes); numpy does it in a few vector ops —
    the sanctioned Arrow-batched slow path (SURVEY.md §2.9). Stateless,
    embarrassingly parallel, no shuffle.
    """

    @F.pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        import numpy as np

        out_vals = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = (t or "").split(" ")
            if not toks:
                continue
            # deterministic 64-bit token hashes (FNV-1a, pure python ints)
            hs = np.fromiter(
                (_fnv1a64(w) for w in toks), dtype=np.uint64, count=len(toks)
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
            votes = bits.sum(axis=0) * 2 - len(toks)  # +1/-1 majority
            sig = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(b)
            out_vals[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out_vals)

    return df.withColumn(out, _simhash(F.col(text_col)))


def _fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_near_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on 16-bit signature chunks (any
    pair within hamming≤3 of 64 bits shares ≥1 identical 16-bit chunk by
    pigeonhole), then verify hamming distance inside buckets only."""
    sigged = simhash(df, text_col).select(id_col, "simhash")
    chunks = sigged.select(
        id_col,
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftrightunsigned("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
                )
                for c in range(4)
            ])
        ).alias("cc"),
    ).select(id_col, "simhash", "cc.chunk", "cc.cv")
    a = chunks.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"), "chunk", "cv"
    )
    b = chunks.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"), "chunk", "cv"
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(b, on=["chunk", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------------------
# Exact n-gram Jaccard (scoped)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    scope_col: str | None = "source",
    threshold: float = 0.5,
) -> DataFrame:
    """All-pairs exact token-set Jaccard within a scope partition.

    The inverted-index join (docs meet only if they share a token, and
    only within the same scope) bounds the pair blowup; use LSH first at
    corpus scale and this for verification or per-bucket passes.
    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    toks = df.select(
        F.col(id_col),
        *( [F.col(scope_col)] if scope_col else [] ),
        F.explode(F.array_distinct(F.split(F.col(text_col), " ", -1))).alias("w"),
    )
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    join_keys = (["w", scope_col] if scope_col else ["w"])
    a = toks.withColumnRenamed(id_col, "id_a")
    b = toks.withColumnRenamed(id_col, "id_b")
    inter = (
        a.join(b, on=join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n", "n_a")
    nb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n", "n_b")
    # threshold on the RAW ratio; round only in the projected output —
    # rounding first would admit pairs in [threshold-ulp, threshold) that
    # the exact oracle rejects (ADVICE r1)
    raw = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(na, on="id_a")
        .join(nb, on="id_b")
        .withColumn("__jacc", raw)
        .filter(F.col("__jacc") >= threshold)
        .select("id_a", "id_b", F.round("__jacc", 4).alias("jaccard"))
    )
