"""Rows-only declared queries: hash-sketch candidates (MinHash, SimHash)
and LSH-approximate kNN.

These are deliberately registered LAST (plans/__init__.py import order):
their signatures depend on engine-local hash functions (xxhash64, the
token-hash inside simhash), so the driver records only the weaker
rows-only check — accuracy is property-tested against planted duplicates
in tests/test_extensions.py instead. Keeping them at the registry tail
means a time-budgeted correctness run drops the weakest checks first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from newsmaper_etl_spark.io import load_table
from newsmaper_etl_spark.operators import dedup as D
from newsmaper_etl_spark.operators import similarity as S
from newsmaper_etl_spark.registry import query

from pyspark.sql import functions as F


@query("q_minhash_candidates", oracle=None, tags=("DEDUP", "LSH"))
def q_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (rows-only: xxhash64 signatures are not
    portable to the oracle engine; accuracy is property-tested against
    planted near-duplicates in tests/test_extensions.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_candidates(docs, "doc_id", "text")


@query("q_minhash_dedup", oracle=None, tags=("DEDUP", "LSH"))
def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus after MinHash near-dup removal (rows-only; see above)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_dedup(docs, "doc_id", "text", threshold=0.8).select(
        "doc_id", "source"
    )


@query("q_simhash_pairs", oracle=None, tags=("DEDUP", "SIMHASH"))
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-pairs, hamming ≤ 3 via 16-bit chunk buckets
    (rows-only: xxhash64-based signature; property-tested)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_near_pairs(docs, "doc_id", "text", max_hamming=3)


@query("q_ann_lsh", oracle=None, tags=("ANN", "LSH"))
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate kNN (rows-only: recall-vs-exact is
    property-tested; the oracle can't reproduce bucket membership without
    the hyperplane literals)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return S.lsh_cosine_topk(queries, emb, dim=64, k=3, n_planes=8)


@query("q_curate_corpus", oracle=None, tags=("DEDUP", "TEXT", "PIPELINE"))
def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed LLM-corpus recipe (quality gate → exact dedup →
    MinHash near-dup removal → annotation) as one lazy plan — rows-only
    because the near-dup stage is sketch-based; each stage is separately
    oracle-checked or property-tested."""
    from newsmaper_etl_spark.operators.curate import curate_corpus

    docs = load_table(spark, sf_dir, "documents")
    return curate_corpus(docs).select(
        "doc_id", "source", "lang_pred", "n_tokens", "n_bpe", "quality"
    )


@query("q_approx_distinct", oracle=None, tags=("AGG", "SKETCH"))
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts per group (rows-only: the sketch
    estimate is engine-specific by construction; relative error vs exact
    is property-tested in tests/test_extensions.py). The aggregate every
    100 TB engine reaches for when COUNT(DISTINCT) would shuffle every
    distinct key."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_cust_approx")
    )


@query("q_percentile_approx", oracle=None, tags=("AGG", "SKETCH"))
def q_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles per group (KLL-style sketch; rows-only,
    error-bound property-tested) — single pass + mergeable partials,
    versus an exact percentile's per-group sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("p50_approx"),
        F.percentile_approx("l_extendedprice", 0.95, 1000).alias("p95_approx"),
    )


@query("q_ann_ivf", oracle=None, tags=("ANN", "IVF"))
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate kNN (rows-only: cell membership depends on the
    sampled k-means centroids; recall-vs-exact is property-tested)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return S.ivf_cosine_topk(
        queries, emb, k=3, n_centroids=8, nprobe=2, sample_n=512
    )
