"""Similarity search over embedding columns (array<float>).

Two paths:

- cosine_topk: exact brute force — broadcast the (small) query set against
  the corpus, dot products via JVM higher-order functions (zip_with +
  aggregate, double accumulation), rank per query. The baseline: correct,
  deterministic, O(|queries| × |corpus|) but embarrassingly parallel and
  shuffle-free until the final per-query top-k window.

- lsh_cosine_topk: random-hyperplane LSH — sign-bit bucket per embedding,
  candidates only within a bucket (plus optional multi-probe by flipping
  one bit). At 100 TB the bucket join replaces the full scan per query;
  recall is tunable via n_planes/probes.

Hyperplanes are generated from a fixed seed driver-side and inlined as
literal arrays (they are tiny: n_planes × dim floats), so the whole plan
stays JVM-side — no Python workers anywhere.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns in double precision
    (sequential left-to-right accumulation → engine-reproducible)."""
    return _dot(a, b) / (_norm2(a) * _norm2(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "qid",
    corpus_id: str = "vec_id",
    query_vec: str = "qvec",
    corpus_vec: str = "embedding",
    k: int = 3,
    round_digits: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    Broadcast-joins the query side (must be small — that's the exact-kNN
    contract), computes similarities corpus-parallel, then takes the
    per-query top-k with a rank window over (sim DESC, id ASC) — rounded
    before ranking so float noise can't flip near-ties across engines.

    ``exclude_self`` (default) drops pairs where query_id == corpus_id —
    correct when queries are drawn from the corpus. Pass False when the
    query id space is external and may coincidentally overlap corpus ids.
    """
    pairs = corpus.crossJoin(F.broadcast(queries))
    if exclude_self:
        pairs = pairs.filter(F.col(query_id) != F.col(corpus_id))
    sim = F.round(cosine_sim(F.col(query_vec), F.col(corpus_vec)), round_digits)
    scored = pairs.select(
        query_id, F.col(corpus_id).alias("neighbor_id"), sim.alias("sim")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "neighbor_id", "sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(float).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit p set iff dot(vec, plane_p) > 0."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(_dot(vec, plane_col) > 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        ).cast("long")
    return bucket


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    query_id: str = "qid",
    corpus_id: str = "vec_id",
    query_vec: str = "qvec",
    corpus_vec: str = "embedding",
    k: int = 3,
    n_planes: int = 8,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: equi-join on the LSH bucket (the scale path —
    the corpus never meets queries outside their bucket), exact cosine +
    rank inside the bucket. Recall < 1 by construction; raise n_planes
    for precision, lower it (or multi-probe) for recall.

    ``exclude_self`` as in :func:`cosine_topk`."""
    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.withColumn("__bucket", lsh_bucket(F.col(corpus_vec), planes))
    q = queries.withColumn("__bucket", lsh_bucket(F.col(query_vec), planes))
    pairs = c.join(F.broadcast(q), on="__bucket")
    if exclude_self:
        pairs = pairs.filter(F.col(query_id) != F.col(corpus_id))
    sim = F.round(cosine_sim(F.col(query_vec), F.col(corpus_vec)), 4)
    scored = pairs.select(
        query_id, F.col(corpus_id).alias("neighbor_id"), sim.alias("sim")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "neighbor_id", "sim", "rank")
    )


def _kmeans_centroids(
    df: DataFrame,
    vec_col: str,
    n_centroids: int,
    sample_n: int = 2048,
    iters: int = 5,
    seed: int = 42,
) -> list[list[float]]:
    """Spherical k-means on a bounded driver-side sample (the same
    sanctioned materialization as hyperplane generation: centroid
    training needs a few thousand vectors, not the corpus). Deterministic
    for a fixed input + seed."""
    rows = df.select(vec_col).limit(sample_n).collect()
    X = np.array([list(r[0]) for r in rows], dtype=float)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = X[assign == c]
            if len(members):
                m = members.sum(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents.tolist()


def _centroid_structs(vec: Column, cents: list[list[float]]):
    """Array of (dot, centroid_id) structs — dot with UNIT centroids, so
    argmax over dots == argmax over cosine (||v|| is constant per row)."""
    return F.array(*[
        F.struct(
            _dot(vec, F.array(*[F.lit(float(x)) for x in c])).alias("d"),
            F.lit(i).alias("c"),
        )
        for i, c in enumerate(cents)
    ])


def ivf_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "qid",
    corpus_id: str = "vec_id",
    query_vec: str = "qvec",
    corpus_vec: str = "embedding",
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 2,
    sample_n: int = 2048,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF approximate kNN — the inverted-file counterpart to
    :func:`lsh_cosine_topk`: partition the corpus into ``n_centroids``
    Voronoi cells (spherical k-means, trained on a bounded sample), then
    search only each query's ``nprobe`` nearest cells.

    Plan shape at scale: one pass assigns corpus vectors to cells (pure
    JVM dot products against literal centroids — no Python, no shuffle),
    queries explode to nprobe (query, cell) probes, and an equi-join on
    cell id replaces the full scan — the same bucket-join skeleton as
    LSH, but with data-adaptive regions (better recall on clustered
    embeddings) at the cost of a training sample. Recall rises with
    nprobe; identical vectors are always recalled at nprobe ≥ 1 (a
    vector's own cell is its top probe).
    """
    cents = _kmeans_centroids(corpus, corpus_vec, n_centroids, sample_n, seed=seed)
    c_assign = F.array_max(_centroid_structs(F.col(corpus_vec), cents))["c"]
    corpus_cells = corpus.withColumn("__cell", c_assign)
    probes = F.transform(
        F.slice(
            F.sort_array(_centroid_structs(F.col(query_vec), cents), asc=False),
            1,
            nprobe,
        ),
        lambda s: s["c"],
    )
    q_cells = queries.withColumn("__cell", F.explode(probes))
    pairs = corpus_cells.join(F.broadcast(q_cells), on="__cell")
    if exclude_self:
        pairs = pairs.filter(F.col(query_id) != F.col(corpus_id))
    sim = F.round(cosine_sim(F.col(query_vec), F.col(corpus_vec)), 4)
    scored = pairs.select(
        query_id, F.col(corpus_id).alias("neighbor_id"), sim.alias("sim")
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "neighbor_id", "sim", "rank")
    )


def embedding_near_dups(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ threshold)
    via in-bucket self-join — the embedding analog of minhash_lsh."""
    planes = _hyperplanes(dim, n_planes, seed)
    b = df.withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))
    a_side = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "__bucket"
    )
    b_side = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "__bucket"
    )
    sim = F.round(cosine_sim(F.col("vec_a"), F.col("vec_b")), 4)
    return (
        a_side.join(b_side, on="__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
