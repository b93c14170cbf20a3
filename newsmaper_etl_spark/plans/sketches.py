"""Sketch-family declared queries: hash-sketch candidates (MinHash,
SimHash), approximate kNN, and approximate aggregates.

Engine-local signatures (xxhash64, HLL, LSH buckets) are not portable to
the oracle engine, so several queries here are rows-only — but wherever a
deterministic CONTRACT of the sketch is expressible both ways it is
hash-checked (VERDICT r03 #3): the HLL/percentile error bands emit
boolean verdicts both engines agree on, and the ANN self-recall queries
pin "identical vectors are always recalled" to an exact oracle row.
Statistical accuracy on near-but-not-identical items stays
property-tested in tests/test_extensions.py.

Registry ordering note: rows-only entries now sort AHEAD of the
already-driver-recorded oracle core (registry._record_order) so the
driver's 50-entry budget finally reaches them in round 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from newsmaper_etl_spark.io import fan_out, load_table, parse_sf
from newsmaper_etl_spark.operators import dedup as D
from newsmaper_etl_spark.operators import similarity as S
from newsmaper_etl_spark.plans.fixture_cache import (
    cached_fixture,
    cached_plan,
    plan_cached,
)
from newsmaper_etl_spark.registry import query

from pyspark.sql import functions as F

from newsmaper_etl_spark.localrel import literal_df


@query("q_minhash_candidates", oracle=None, statistical=True, tags=("DEDUP", "LSH"))
def q_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (rows-only: xxhash64 signatures are not
    portable to the oracle engine; accuracy is property-tested against
    planted near-duplicates in tests/test_extensions.py)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), sf_dir)
    return D.minhash_lsh_candidates(docs, "doc_id", "text")


@query("q_minhash_dedup", oracle=None, statistical=True, tags=("DEDUP", "LSH"))
def q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus after MinHash near-dup removal (rows-only; see above)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), sf_dir)
    return D.minhash_dedup(docs, "doc_id", "text", threshold=0.8).select(
        "doc_id", "source"
    )


@query("q_simhash_pairs", oracle=None, statistical=True, tags=("DEDUP", "SIMHASH"))
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-pairs, hamming ≤ 3 via 16-bit chunk buckets
    (rows-only: xxhash64-based signature; property-tested)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), sf_dir)
    return D.simhash_near_pairs(docs, "doc_id", "text", max_hamming=3)


@query("q_ann_lsh", oracle=None, statistical=True, tags=("ANN", "LSH"))
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate kNN (rows-only: recall-vs-exact is
    property-tested; the oracle can't reproduce bucket membership without
    the hyperplane literals)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    # pair-estimate unroll cutover (the q_knn_cosine rule): in-bucket
    # pairs ≈ 5 queries × corpus/2^planes — the unrolled dot's fixed
    # compile only amortizes at real corpus scale; unknown dirs take
    # the 100 TB posture
    sf = parse_sf(sf_dir)
    return S.lsh_cosine_topk(
        queries, emb, dim=64, k=3, n_planes=8, unroll=sf is None or sf >= 10
    )


@query("q_curate_corpus", oracle=None, statistical=True, tags=("DEDUP", "TEXT", "PIPELINE"))
def q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed LLM-corpus recipe (quality gate → exact dedup →
    MinHash near-dup removal → annotation) as one lazy plan — rows-only
    because the near-dup stage is sketch-based; each stage is separately
    oracle-checked or property-tested."""
    from newsmaper_etl_spark.operators.curate import curate_corpus

    docs = fan_out(load_table(spark, sf_dir, "documents"), sf_dir)
    return curate_corpus(docs).select(
        "doc_id", "source", "lang_pred", "n_tokens", "n_bpe", "quality"
    )


def _quality_scored_ctes(src: str) -> str:
    """The base/scored0 CTE pair computing the recipe's quality score
    over ``src`` — ONE source of truth for every composed recipe oracle
    (the per-stage formula q_quality_score hash-matches)."""
    from newsmaper_etl_spark.plans.extensions import _STOP_SQL

    return f"""base AS (
            SELECT doc_id, text,
                   len(text) AS tl,
                   len(text) - len(translate(text, '.,;:!?''"', '')) AS n_punct,
                   len(string_split(text, ' ')) AS n_tok,
                   len(list_filter(string_split(text, ' '),
                       w -> list_contains({_STOP_SQL}, w))) AS n_stop
            FROM {src}
        ),
        scored0 AS (
            SELECT doc_id, text, n_tok,
                   FLOOR(10000 * (
                       (CASE WHEN tl >= 20 AND tl <= 10000 THEN 1.0 ELSE 0.3 END) * 0.4
                       + (CASE WHEN (CASE WHEN tl > 0 THEN n_punct / tl ELSE 0.0 END) <= 0.2
                          THEN 1.0 ELSE 0.5 END) * 0.3
                       + LEAST((CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END) * 3,
                               1.0) * 0.3
                   )) / 10000 AS quality
            FROM base
        )"""


def _curate_exact_oracle() -> str:
    """Composed oracle for the DETERMINISTIC slice of the curation
    recipe: the per-stage formulas are the same fragments the individual
    stage oracles hash-match (quality → keep-first dedup → language /
    token / BPE / fingerprint annotation), chained over CTEs."""
    from newsmaper_etl_spark.plans.extensions import _lang_case_sql

    return f"""
        WITH input AS (
            SELECT doc_id, text FROM documents
            UNION ALL  -- planted exact duplicates: keep-first must drop
            SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
            UNION ALL  -- planted junk: quality gate must drop (len<20, all punct)
            SELECT doc_id + 2000000, '!!!' FROM documents WHERE doc_id % 10 = 0
        ),
        {_quality_scored_ctes("input")},
        survivors AS (
            SELECT doc_id, text, n_tok, quality FROM (
                SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS keep
                FROM scored0 WHERE quality >= 0.5
            ) WHERE doc_id = keep
        ),
        ann AS (
            SELECT doc_id,
                   CAST(SUM(CAST(CEIL(len(w) / 4.0) AS BIGINT)) AS BIGINT) AS n_bpe,
                   CAST(SUM(i * (ascii(substring(w, 1, 1)) + 131 * len(w))) AS BIGINT) AS fp
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                         unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
                  FROM survivors)
            GROUP BY doc_id
        ),
        lang AS ({_lang_case_sql("survivors")})
        SELECT s.doc_id, l.lang_pred,
               CAST(s.n_tok AS BIGINT) AS n_tokens, a.n_bpe, a.fp, s.quality
        FROM survivors s
        JOIN ann a USING (doc_id)
        JOIN lang l USING (doc_id)
    """


@query("q_curate_exact", oracle=_curate_exact_oracle(), tags=("DEDUP", "TEXT", "PIPELINE"))
@plan_cached
def q_curate_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation recipe's deterministic sub-pipeline (quality gate →
    exact keep-first dedup → annotation), hash-checked END TO END as one
    composed plan — the same curate_corpus code path with the sketch
    stage off (near_dup=False), so stage CHAINING is itself under the
    driver gate (each stage alone already hash-matches; this pins that
    the composition filters/joins/annotates the same surviving rows).
    Exact duplicates and sub-gate junk rows are PLANTED on top of the
    corpus (the raw documents pass both stages untouched at test SFs),
    so a gate or dedup leak changes the hash. q_curate_corpus stays the
    full recipe (rows-only: MinHash)."""
    from newsmaper_etl_spark.operators.curate import curate_corpus

    def _build():
        docs = fan_out(load_table(spark, sf_dir, "documents"), sf_dir)
        base = docs.select("doc_id", "text")
        tenth = base.filter(F.col("doc_id") % 10 == 0)
        return base.unionByName(
            tenth.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        ).unionByName(
            tenth.select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.lit("!!!").alias("text"),
            )
        )

    # same planted corpus as q_curate_corpus_planted — one build, two
    # contracts (fixture_cache)
    planted = cached_fixture(spark, "curate_planted", sf_dir, _build)
    return curate_corpus(planted, near_dup=False).select(
        "doc_id", "lang_pred", "n_tokens", "n_bpe", "fp", "quality"
    )


@query(
    "q_approx_distinct",
    oracle="""
        SELECT o_orderpriority,
               COUNT(DISTINCT o_custkey) AS n_cust_exact,
               TRUE AS approx_ok
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("AGG", "SKETCH"),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts per group — the aggregate every
    100 TB engine reaches for when COUNT(DISTINCT) would shuffle every
    distinct key.

    Hash-checked oracle form (VERDICT r03 #3): the HLL estimate itself is
    engine-specific, so the query emits the exact count (both engines
    compute it) plus the sketch's error-band verdict — ``approx_ok`` is
    TRUE iff |approx − exact| ≤ 2.5·rsd·exact. Spark's HLL++ at rsd=0.02
    keeps relative error well inside that band (property-tested across
    SFs in tests/test_extensions.py); the oracle asserts the literal
    TRUE, making the sketch's accuracy contract a driver-hashed value."""
    orders = load_table(spark, sf_dir, "orders")
    # dedup (priority, custkey) FIRST, then count + HLL over the distinct
    # set: HLL registers are duplicate-insensitive, so the estimate is
    # identical, and the plan avoids the Expand (row-doubling) Spark
    # emits when exact and approx distinct aggregates share one agg
    per_key = orders.select("o_orderpriority", "o_custkey").distinct()
    return per_key.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_cust_exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("__approx"),
    ).select(
        "o_orderpriority",
        "n_cust_exact",
        (
            F.abs(F.col("__approx") - F.col("n_cust_exact"))
            <= 0.05 * F.col("n_cust_exact")
        ).alias("approx_ok"),
    )


@query(
    "q_percentile_approx",
    # The oracle runs the SAME rank-band verification against its own
    # (exact) quantiles instead of asserting a literal TRUE: each engine
    # proves its percentile implementation lands in the window, and the
    # shared TRUE rows are now two independent verdicts that must agree.
    # Exact quantiles always pass their own band (count(x ≤ exact_p50)/n
    # is 0.5 up to interpolation on a near-unique column), so a FALSE
    # here means the band arithmetic itself broke — the same failure the
    # Spark side would surface.
    oracle="""
        WITH s AS (
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, 0.5) AS a50,
                   quantile_cont(l_extendedprice, 0.95) AS a95
            FROM lineitem GROUP BY l_returnflag
        ),
        r AS (
            SELECT l.l_returnflag,
                   COUNT(*) AS n,
                   SUM(CASE WHEN l.l_extendedprice <= s.a50
                            THEN 1 ELSE 0 END) AS b50,
                   SUM(CASE WHEN l.l_extendedprice <= s.a95
                            THEN 1 ELSE 0 END) AS b95
            FROM lineitem l JOIN s USING (l_returnflag)
            GROUP BY l.l_returnflag
        )
        SELECT l_returnflag,
               (b50 / n >= 0.45 AND b50 / n <= 0.55) AS p50_ok,
               (b95 / n >= 0.90 AND b95 / n <= 0.99) AS p95_ok
        FROM r
    """,
    tags=("AGG", "SKETCH"),
)
def q_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles per group (GK-style mergeable sketch) —
    single pass + mergeable partials, versus an exact percentile's
    per-group sort.

    Hash-checked oracle form (VERDICT r03 #3): the sketch value is
    engine-specific, so the query emits the sketch's error-band verdict
    and the oracle asserts the literal TRUE per group. The band is
    checked by RANK, not by comparing against exact percentile values —
    ``count(x ≤ approx_pQ)/n`` must land in a generous window around Q.
    That keeps the verification pass a pair of whole-stage hash
    aggregates (sketch agg → broadcast the 3 thresholds → conditional
    count), instead of an exact ``percentile()`` whose per-group sort
    buffers every value of a 3-value key in 3 tasks (the same
    skew-serialization q_topk_per_group §fixed; 3.4 s at sf0.1, and
    unbounded memory at 100 TB). percentile_approx at accuracy=100
    guarantees rank error ≤ 1 % — a 5× margin inside the ±5 % /
    −5 %+4 % windows asserted here; r11 profiling (VERDICT r10 'do
    this' #5) showed sketch insertion scales with accuracy (1.19 s at
    300 vs 0.39 s at 100 at sf1.0, equal verdicts) and the remaining
    cost is the contract's two lineitem scans, not the sketch —
    decomposition in SCALE.md §Weak-query ledger."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    # ONE sketch queried at both quantiles (array form), not two sketches
    # — percentile_approx builds its QuantileSummaries per aggregate
    # expression, so the scalar form paid the per-row insertion twice
    # (measured 0.80 → 0.63 s at sf0.1; same contract either way)
    sketch = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(100)
        ).alias("__qs")
    ).select(
        "l_returnflag",
        F.col("__qs")[0].alias("__a50"),
        F.col("__qs")[1].alias("__a95"),
    )
    ranked = li.join(F.broadcast(sketch), "l_returnflag").groupBy(
        "l_returnflag"
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(
            F.when(F.col("l_extendedprice") <= F.col("__a50"), 1).otherwise(0)
        ).alias("__b50"),
        F.sum(
            F.when(F.col("l_extendedprice") <= F.col("__a95"), 1).otherwise(0)
        ).alias("__b95"),
    )
    frac50 = F.col("__b50") / F.col("__n")
    frac95 = F.col("__b95") / F.col("__n")
    return ranked.select(
        "l_returnflag",
        ((frac50 >= 0.45) & (frac50 <= 0.55)).alias("p50_ok"),
        ((frac95 >= 0.90) & (frac95 <= 0.99)).alias("p95_ok"),
    )


# The oracle VERIFIES the recall contract instead of asserting it: it
# computes the true brute-force cosine top-1 over the same slice (same
# round-to-4, same (sim DESC, id ASC) tie-break). Self is the unique
# global maximum (identical vector, sim 1.0; max cross-pair sim in the
# corpus is 0.513), so a bucketing bug on the Spark side OR a broken
# assumption about the corpus now surfaces as a row mismatch — the
# previous literal-SELECT form rubber-stamped the expected rows.
_SELFHIT_ORACLE = """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id < 1000
    ),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
    terms AS (
        SELECT q.qid, e.vec_id AS nid,
               unnest(q.qv) AS x, unnest(e.v) AS y
        FROM q, e
    ),
    sums AS (
        SELECT qid, nid, SUM(x * y) AS dot,
               SUM(x * x) AS nq, SUM(y * y) AS nc
        FROM terms GROUP BY qid, nid
    ),
    ranked AS (
        SELECT qid, nid,
               ROUND(dot / (SQRT(nq) * SQRT(nc)), 4) AS sim,
               ROW_NUMBER() OVER (
                   PARTITION BY qid
                   ORDER BY ROUND(dot / (SQRT(nq) * SQRT(nc)), 4) DESC, nid
               ) AS rnk
        FROM sums
    )
    SELECT qid, nid AS neighbor_id, CAST(sim AS DOUBLE) AS sim,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk = 1
"""


@query("q_ann_lsh_selfhit", oracle=_SELFHIT_ORACLE, tags=("ANN", "LSH"))
@plan_cached
def q_ann_lsh_selfhit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked LSH contract (VERDICT r03 #3): a query drawn from the
    corpus MUST find itself — identical vectors share every sign bit, so
    the self pair survives the bucket join and ranks first with sim 1.0
    (verified no other sf0.01 pair rounds to 1.0: max cross sim 0.513).
    This pins the bucket-join recall floor as a driver-hashed value;
    statistical recall on near (not identical) neighbors stays
    property-tested in tests/test_extensions.py. The corpus is sliced
    (vec_id < 1000) and n_planes kept low: the contract needs the
    queries IN the corpus, not the whole corpus — the slice keeps this
    verification query bench-cheap. ``unroll=False`` picks the compact
    interpreted dot expressions: over ~10^2 in-bucket pairs the fixed
    multi-KB parse + janino compile of the unrolled forms (~1 s per
    invocation, VERDICT r04 "what's wrong" #2) costs three orders of
    magnitude more than interpreting the arithmetic."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = S.lsh_cosine_topk(
        queries, emb, dim=64, k=1, n_planes=4, exclude_self=False,
        unroll=False,
    )
    return out.filter(F.col("rank") == 1).select(
        "qid", "neighbor_id", "sim", F.col("rank").alias("rnk")
    )


@query("q_ann_ivf_selfhit", oracle=_SELFHIT_ORACLE, tags=("ANN", "IVF"))
@plan_cached
def q_ann_ivf_selfhit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked IVF contract: a corpus-drawn query's top probe cell
    IS its own assignment cell (same dots, same deterministic tie-break),
    so self is always recalled at nprobe ≥ 1 and ranks first with sim
    1.0. Same oracle shape (and the same bench-cheap corpus slice +
    compact interpreted expressions) as q_ann_lsh_selfhit."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = S.ivf_cosine_topk(
        queries, emb, k=1, n_centroids=4, nprobe=1, sample_n=256,
        exclude_self=False, dim=64, cache_key=sf_dir + ":embeddings_selfhit",
        unroll=False,
    )
    return out.filter(F.col("rank") == 1).select(
        "qid", "neighbor_id", "sim", F.col("rank").alias("rnk")
    )


_PLANT_OFFSET = 1_000_000
_PLANT_SLICE = 50

_MINHASH_SELFPAIR_ORACLE = f"""
    SELECT doc_id AS id_a, doc_id + {_PLANT_OFFSET} AS id_b
    FROM documents WHERE doc_id < {_PLANT_SLICE}
"""


def _planted_copies(spark, sf_dir):
    """A slice of the corpus plus an EXACT copy of every slice doc under
    a shifted id — the deterministic fixture for sketch self-pair
    contracts: identical text ⇒ identical token hashes ⇒ identical
    sketch, whatever the sketch. Built once per process and shared by
    all four contracts that plant this corpus (fixture_cache; VERDICT
    r09 'do this' #1a)."""

    def _build():
        docs = load_table(spark, sf_dir, "documents")
        sl = docs.filter(
            F.col("doc_id") < _PLANT_SLICE
        ).select("doc_id", "text")
        copies = sl.select(
            (F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"), "text"
        )
        # one partition for a 100-row fixture (the q_curate_incremental
        # precedent): these contracts pin pipeline semantics, not scale —
        # at the parquet layout's 16 partitions the multi-stage sketch
        # pipelines pay task-launch floors that dwarf the data (VERDICT
        # r07 'what's wrong' #2, the contract-machinery ratio creep)
        return sl.unionAll(copies).coalesce(1)

    return cached_fixture(spark, "planted_copies", sf_dir, _build)


@query("q_minhash_selfpair", oracle=_MINHASH_SELFPAIR_ORACLE, tags=("DEDUP", "LSH"))
def q_minhash_selfpair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked MinHash-LSH contract (VERDICT r04 'do this' #4, the
    selfhit pattern applied to the dedup family): an EXACT duplicate —
    planted as a copy of every slice doc under id+offset — must appear
    as a candidate pair, because identical text yields identical shingle
    sets, identical signatures, and therefore identical band hashes in
    EVERY band. Filtering candidates to (i, i+offset) pins exactly that
    recall floor as driver-hashed rows: a missing pair means the banding
    or the bucket join broke. Near-miss (statistical) recall stays
    property-tested in tests/test_extensions.py; the corpus slice keeps
    the contract bench-cheap."""
    docs = load_table(spark, sf_dir, "documents")
    cands = D.minhash_lsh_candidates(_planted_copies(spark, sf_dir), "doc_id", "text")
    return cands.filter(
        F.col("id_b") - F.col("id_a") == _PLANT_OFFSET
    ).select("id_a", "id_b")


_SIMHASH_SELFPAIR_ORACLE = f"""
    SELECT doc_id AS id_a, doc_id + {_PLANT_OFFSET} AS id_b, 0 AS hamming
    FROM documents WHERE doc_id < {_PLANT_SLICE}
"""


@query("q_simhash_selfpair", oracle=_SIMHASH_SELFPAIR_ORACLE, tags=("DEDUP", "SIMHASH"))
def q_simhash_selfpair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked SimHash contract: an exact copy has the identical
    64-bit signature (same token hashes, same bit majorities), so the
    pair shares all four 16-bit chunks, survives the pigeonhole bucket
    join, and verifies at hamming exactly 0. Driver-hashes the planted
    (i, i+offset, 0) rows; see q_minhash_selfpair for the pattern."""
    docs = load_table(spark, sf_dir, "documents")
    # checkpoint stays ON even for the planted slice: without it the
    # self-join duplicates the 64-lane signature lineage into both sides
    # and the analyzer/optimizer walk the doubled tree per invocation —
    # measured 1.07 s vs 0.58 s with the one-job eager checkpoint.
    pairs = D.simhash_near_pairs(
        _planted_copies(spark, sf_dir), "doc_id", "text", max_hamming=3
    )
    return pairs.filter(
        F.col("id_b") - F.col("id_a") == _PLANT_OFFSET
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


# The oracle DERIVES the survivor set from the planted corpus's own
# semantics (keep-first over exact-text groups) instead of asserting
# the literal slice — the same honesty upgrade the ANN selfhit oracles
# got in r05: a broken assumption about the fixture (e.g. duplicate
# texts already inside the slice) now surfaces as a mismatch on BOTH
# engines' derivations rather than being rubber-stamped.
_MINHASH_DEDUP_PLANTED_ORACLE = f"""
    WITH input AS (
        SELECT doc_id, text FROM documents WHERE doc_id < {_PLANT_SLICE}
        UNION ALL
        SELECT doc_id + {_PLANT_OFFSET}, text
        FROM documents WHERE doc_id < {_PLANT_SLICE}
    )
    SELECT doc_id FROM (
        SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS keep
        FROM input
    ) WHERE doc_id = keep
"""


@query(
    "q_minhash_dedup_planted",
    oracle=_MINHASH_DEDUP_PLANTED_ORACLE,
    tags=("DEDUP", "LSH"),
)
def q_minhash_dedup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked contract for the FULL minhash_dedup pipeline
    (candidates → exact-Jaccard verify → connected components →
    keep-first anti-join), not just the candidate stage: over the
    planted-copies corpus at threshold=1.0 the survivor set is
    deterministic BY CONSTRUCTION. Identical text ⇒ identical shingle
    set ⇒ identical signature ⇒ guaranteed candidate in every band, and
    exact verify scores the pair at Jaccard exactly 1.0 ≥ threshold;
    distinct texts have distinct shingle sets, so Jaccard < 1.0 and no
    original is ever removed regardless of what the banding surfaces.
    Keep-first retains the min id per cluster — the originals. A leak in
    banding (copy not surfaced), verify (1.0 pair rejected), resolution
    (wrong survivor), or the anti-join flips the driver hash.
    ``transitive=False`` (single-link) is EQUAL to CC here — banding
    surfaces ALL pairs of an identical-text group, so every non-minimal
    member loses as some pair's id_b — and it makes the plan fully lazy
    (CC's driver strategy is a collect action), which lets the whole
    built plan be memoized per process (cached_plan: prepared-statement
    reuse — every evaluation still executes banding-join → verify →
    losers → anti-join live; VERDICT r10 'do this' #1). The r9 A/B that
    preferred CC here predates the cached ``banded`` seam: the
    single-link form's re-referenced subtree is now a cheap join over
    stored keys, not a re-run of the signature lanes. The statistical
    variant (threshold 0.8 over the raw corpus) stays rows-only as
    q_minhash_dedup (VERDICT r05 'do this' #2)."""
    def _build():
        planted = _planted_copies(spark, sf_dir)
        # num_hashes=8/bands=2: the threshold=1.0 determinism argument
        # is width-independent (identical text collides in EVERY band;
        # verify is exact) — the q_minhash_incremental_planted lane
        # rule. The banded frame is the PERSISTED-INDEX seam (a
        # deployment signs a corpus snapshot once; candidate generation
        # joins the stored keys), so caching it per process is the
        # production shape (VERDICT r10 #1)
        banded = cached_fixture(
            spark, "mdp_banded", sf_dir,
            lambda: D.banded_signatures(
                planted, "doc_id", "text", num_hashes=8, bands=2
            ),
        )
        return D.minhash_dedup(
            planted, "doc_id", "text", threshold=1.0,
            num_hashes=8, bands=2, banded=banded,
            transitive=False, checkpoint=False,
        ).select("doc_id")

    return cached_plan(spark, "q_minhash_dedup_planted", sf_dir, _build)


@query("q_winnow_fingerprint", oracle=None, statistical=True, tags=("DEDUP", "TEXT"))
def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint surface over the corpus — the
    sub-document overlap-detection index (rows-only: selection is
    xxhash64-order-dependent, the minhash-candidates precedent; the
    positional guarantee is property- and contract-tested)."""
    import newsmaper_etl_spark.operators.text as TX

    docs = load_table(spark, sf_dir, "documents")
    return TX.winnow_fingerprints(docs, "doc_id", "text", k=5, w=4)


_WINNOW_SELFPAIR_ORACLE = f"""
    SELECT doc_id AS id_a, doc_id + {_PLANT_OFFSET} AS id_b
    FROM documents WHERE doc_id < {_PLANT_SLICE}
"""


@query(
    "q_winnow_selfpair",
    oracle=_WINNOW_SELFPAIR_ORACLE,
    tags=("DEDUP", "TEXT"),
)
def q_winnow_selfpair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked recall contract for winnowing (the selfpair
    pattern): an exact copy selects the IDENTICAL fingerprint set
    (same grams, same minima), so every planted (i, i+offset) pair
    shares ≥1 fingerprint and survives the fp equi-join; filtering to
    the planted offset pins exactly that recall floor — a broken gram
    basis, window min, or distinct would drop pairs and flip the
    driver hash. Statistical cross-pairs stay rows-only in
    q_winnow_fingerprint."""
    import newsmaper_etl_spark.operators.text as TX

    def _build():
        planted = _planted_copies(spark, sf_dir)
        fps = TX.winnow_fingerprints(planted, "doc_id", "text", k=5, w=4)
        a = fps.withColumnRenamed("doc_id", "id_a")
        b = fps.withColumnRenamed("doc_id", "id_b")
        return (
            a.join(b, on="fp")
            .filter(F.col("id_b") - F.col("id_a") == _PLANT_OFFSET)
            .select("id_a", "id_b")
            .distinct()
        )

    return cached_plan(spark, "q_winnow_selfpair", sf_dir, _build)


@query(
    "q_dup_clusters_planted",
    oracle=f"""
        WITH input AS (
            SELECT doc_id, text FROM documents WHERE doc_id < {_PLANT_SLICE}
            UNION ALL
            SELECT doc_id + {_PLANT_OFFSET}, text
            FROM documents WHERE doc_id < {_PLANT_SLICE}
        )
        SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS cluster_id
        FROM input
    """,
    tags=("DEDUP", "LSH"),
)
def q_dup_clusters_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked contract for the CLUSTER AUDIT surface
    (minhash_dup_clusters — the (id, cluster_id) table reviewers sample
    and keep-rule changes replay against): over the planted-copies
    corpus at threshold 1.0, every identical-text group labels with its
    min id and every singleton with its own — derived by both engines
    from the corpus. resolve="min_neighbor" is equal to CC here
    (identical-text groups are complete verified cliques containing
    the min — the q_minhash_dedup_planted argument) and keeps the plan
    action-free for cached_plan; the banded frame is the shared
    persisted-index fixture."""
    def _build():
        planted = _planted_copies(spark, sf_dir)
        banded = cached_fixture(
            spark, "mdp_banded", sf_dir,
            lambda: D.banded_signatures(
                planted, "doc_id", "text", num_hashes=8, bands=2
            ),
        )
        return D.minhash_dup_clusters(
            planted, "doc_id", "text", threshold=1.0,
            num_hashes=8, bands=2, banded=banded,
            checkpoint=False, resolve="min_neighbor",
        )

    return cached_plan(spark, "q_dup_clusters_planted", sf_dir, _build)


# Honest derivation (see _MINHASH_DEDUP_PLANTED_ORACLE): identical
# signature at h=0 ⟺ identical text, so the expected pair surface is
# the identical-text pairs of the planted corpus, computed as such.
_SIMHASH_PAIRS_PLANTED_ORACLE = f"""
    WITH input AS (
        SELECT doc_id, text FROM documents WHERE doc_id < {_PLANT_SLICE}
        UNION ALL
        SELECT doc_id + {_PLANT_OFFSET}, text
        FROM documents WHERE doc_id < {_PLANT_SLICE}
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0 AS hamming
    FROM input a JOIN input b ON a.text = b.text AND a.doc_id < b.doc_id
"""


@query(
    "q_simhash_pairs_planted",
    oracle=_SIMHASH_PAIRS_PLANTED_ORACLE,
    tags=("DEDUP", "SIMHASH"),
)
def q_simhash_pairs_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked contract for the FULL simhash_near_pairs output (not
    the planted-pair filtrate q_simhash_selfpair keeps): at
    ``max_hamming=0`` the bucket key is the entire 64-bit signature, so
    the output is EXACTLY the identical-signature pairs — the planted
    copies and nothing else (distinct texts colliding on all 64 bits is
    a 2^-64 event; none exist at any test SF). This pins the whole pair
    surface as driver-hashed rows, including the absence of false
    positives — the selfpair twin can only prove recall, not precision.
    Also exercises the full-width-chunk path (the h=0 mask-overflow fix,
    ADVICE r05). The statistical h=3 variant over the raw corpus stays
    rows-only as q_simhash_pairs. ``checkpoint=True`` as in
    q_simhash_selfpair: without it the self-join doubles the 64-lane
    signature lineage and Catalyst re-walks both copies per invocation
    (measured 1.3 s vs ~0.45 s)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.simhash_near_pairs(
        _planted_copies(spark, sf_dir), "doc_id", "text", max_hamming=0,
        checkpoint=True,
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


# Brute-force oracle over the corpus PLUS the planted copies, self pair
# excluded — the true nearest non-self neighbor of every query is its
# planted exact copy at sim 1.0 (max cross-pair sim in the slice is
# 0.513, so no tie); both engines must land on the same row.
_ANN_PLANTED_ORACLE = """
    WITH e0 AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id < 1000
    ),
    e AS (
        SELECT * FROM e0
        UNION ALL
        SELECT vec_id + 1000000, v FROM e0 WHERE vec_id < 5
    ),
    q AS (SELECT vec_id AS qid, v AS qv FROM e0 WHERE vec_id < 5),
    terms AS (
        SELECT q.qid, e.vec_id AS nid,
               unnest(q.qv) AS x, unnest(e.v) AS y
        FROM q, e WHERE e.vec_id <> q.qid
    ),
    sums AS (
        SELECT qid, nid, SUM(x * y) AS dot,
               SUM(x * x) AS nq, SUM(y * y) AS nc
        FROM terms GROUP BY qid, nid
    ),
    ranked AS (
        SELECT qid, nid,
               ROUND(dot / (SQRT(nq) * SQRT(nc)), 4) AS sim,
               ROW_NUMBER() OVER (
                   PARTITION BY qid
                   ORDER BY ROUND(dot / (SQRT(nq) * SQRT(nc)), 4) DESC, nid
               ) AS rnk
        FROM sums
    )
    SELECT qid, nid AS neighbor_id, CAST(sim AS DOUBLE) AS sim,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk = 1
"""


@query("q_ann_lsh_planted", oracle=_ANN_PLANTED_ORACLE, tags=("ANN", "LSH"))
@plan_cached
def q_ann_lsh_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked planted-exact top-1 contract (VERDICT r05 'do this'
    #2): every query vector's exact copy is planted in the corpus under a
    shifted id, and with ``exclude_self`` the copy IS the true nearest
    neighbor (sim 1.0, unique — max cross sim 0.513). Identical vectors
    share every hyperplane sign, so the copy is guaranteed into the
    query's bucket; a bucketing, norm, dot, or ranking bug surfaces as a
    row mismatch against the honest brute-force oracle. Strictly stronger
    than q_ann_lsh_selfhit (recall of a NON-self row through the
    exclude-self production path). The statistical top-k variant stays
    rows-only as q_ann_lsh."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    qs = emb.filter(F.col("vec_id") < 5)
    corpus = emb.select("vec_id", "embedding").unionAll(
        qs.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    queries = qs.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = S.lsh_cosine_topk(
        queries, corpus, dim=64, k=1, n_planes=4, exclude_self=True,
        unroll=False,
    )
    return out.filter(F.col("rank") == 1).select(
        "qid", "neighbor_id", "sim", F.col("rank").alias("rnk")
    )


@query("q_ann_ivf_planted", oracle=_ANN_PLANTED_ORACLE, tags=("ANN", "IVF"))
@plan_cached
def q_ann_ivf_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked planted-exact top-1 contract for the IVF path
    (VERDICT r06 'do this' #3 — the last sketch family without a
    production-path deterministic twin): every query vector's exact copy
    is planted in the corpus under a shifted id. An identical vector has
    identical dot products against every centroid, so its cell ranking
    equals the query's and the copy is guaranteed into the query's TOP
    probe cell at any nprobe ≥ 1 — recall of the planted neighbor is
    deterministic even though the k-means centroids themselves are
    data-dependent. The production path runs live (sampled spherical
    k-means, cell assignment, nprobe probe-join, exclude_self), and a
    centroid-assignment, probe, norm, dot, or ranking bug surfaces as a
    row mismatch against the same brute-force oracle as
    q_ann_lsh_planted. The statistical top-k variant stays rows-only as
    q_ann_ivf."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    qs = emb.filter(F.col("vec_id") < 5)
    corpus = emb.select("vec_id", "embedding").unionAll(
        qs.select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    )
    queries = qs.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = S.ivf_cosine_topk(
        queries, corpus, k=1, n_centroids=8, nprobe=2, sample_n=512,
        dim=64, exclude_self=True,
        cache_key=sf_dir + ":embeddings_planted_1k",
        # vec_id<1000 caps the corpus BY CONSTRUCTION — the unrolled
        # centroid/pair dots' fixed compile can never amortize here
        # (same rule as the selfhit/lsh_planted contracts; it was most
        # of this query's 1.6 s at sf0.1, r07)
        unroll=False,
    )
    return out.filter(F.col("rank") == 1).select(
        "qid", "neighbor_id", "sim", F.col("rank").alias("rnk")
    )


@query("q_semantic_dedup", oracle=None, statistical=True, tags=("DEDUP", "SEMANTIC", "ANN"))
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus after SemDeDup semantic-duplicate removal at the
    production threshold (rows-only: cell membership depends on the
    sampled k-means centroids and hyperplane literals; the
    planted-deterministic twin is q_semantic_dedup_planted)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(
        emb, dim=64, threshold=0.9, n_centroids=8, sample_n=512,
        cache_key=sf_dir + ":semdedup",
    ).select("vec_id")


@query(
    "q_semantic_dedup_planted",
    oracle="""
        SELECT CAST(vec_id AS BIGINT) AS vec_id
        FROM embeddings WHERE vec_id < 1000
    """,
    tags=("DEDUP", "SEMANTIC", "ANN"),
)
def q_semantic_dedup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked contract for the FULL SemDeDup pipeline (sampled
    spherical k-means → cell assignment → cell-scoped banded LSH →
    exact-cosine verify → connected components → keep-one-per-group),
    by the planted-exact argument: every copy is an IDENTICAL vector
    under a shifted id, so it has identical centroid dots (same argmax
    cell), identical hyperplane signs in every table (guaranteed
    candidate), cosine exactly 1.0 ≥ threshold, and an identical
    to-centroid affinity — the ``centroid_far`` keep rule therefore
    ties and resolves by min id, keeping the original. Max cross-sim
    among the base vectors is ~0.51 (the ANN planted contracts' bound),
    far under the 0.95 threshold, so the survivor set is exactly the
    base corpus while every stage runs live. A bug in centroid
    assignment, cell scoping, banding, verify, CC, or the keep window
    flips the driver hash."""
    def _build():
        emb = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") < 1000
        )
        copies = emb.filter(F.col("vec_id") < 30).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
        return emb.select("vec_id", "embedding").unionAll(copies).coalesce(1)

    planted = cached_fixture(spark, "semdedup_planted", sf_dir, _build)
    # n_tables=2: an identical copy collides in EVERY table (same signs),
    # so the planted recall argument holds at any table count — the
    # bounded contract carries a quarter of the production default's
    # explode/join machinery (the VERDICT r07 contract-creep rule).
    # frame_cache: the celled/keyed frames are deterministic in the
    # cached fixture + cached centroids, so they are signed once per
    # process (the persisted-_semcells analogy, VERDICT r10 #1); the
    # join/verify/CC/keep machinery still runs live per invocation
    out = S.semantic_dedup(
        planted, dim=64, threshold=0.95, n_centroids=8, sample_n=256,
        n_tables=2, keep="centroid_far", expected_rows=1030,
        cache_key=sf_dir + ":semdedup_planted_1k", cc_strategy="driver",
        frame_cache=True,
    )
    return out.select("vec_id")


def _semdedup_near_vectors(base_rows, n_planes: int, n_tables: int,
                           seed: int):
    """Driver-side construction of the threshold-STRADDLING planted
    vectors (VERDICT r09 'do this' #5 — the identical-copy contract can
    only prove the degenerate sim=1.0 path): for each base vector v,
    two controlled rotations in seeded directions orthogonal to v —

    - a NEAR DUP at cosine ≈ 0.97 (above the 0.95 threshold → must
      merge and lose to the min-id keep rule), and
    - a NEAR MISS at cosine ≈ 0.90 (below threshold → must survive),

    each accept-rejected (seeded redraws) until its float32-rounded
    form shares EVERY hyperplane sign of v in at least one LSH table —
    so candidacy is provable from the construction, not hoped from
    recall stats, and the exact-cosine verify is the ONLY thing that
    decides keep vs drop. Rotation directions u1 (dup) ⊥ u2 (miss) are
    Gram-Schmidt-orthogonalized against v and each other, which bounds
    every unplanned pair analytically: sim(dup, miss) = 0.97·0.90 ≈
    0.873, and sim vs any other base w obeys sim(rot, w) ≤
    0.97·sim(v, w) + 0.243 ≤ 0.74 at the corpus's 0.513 cross-sim cap —
    all safely under threshold (asserted numerically below). Mirrors
    :func:`operators.similarity.lsh_bucket`'s strict ``dot > 0`` sign
    and the engine's float32-storage → double-cast arithmetic."""
    import numpy as np

    cos_hi, cos_lo = 0.97, 0.90
    planes = [
        np.array(S._hyperplanes(64, n_planes, seed + 7919 * t))
        for t in range(n_tables)
    ]

    def _signs(x32):
        x = x32.astype(np.float64)
        return [tuple(p @ x > 0) for p in planes]

    rng = np.random.default_rng(20260815)
    out = []  # (vec_id, [float32 values])
    base = [(int(r[0]), np.array(list(r[1]), dtype=np.float64))
            for r in base_rows]
    for vid, v in base:
        nv = np.linalg.norm(v)
        vhat = v / nv
        v32 = v.astype(np.float32)
        sv = _signs(v32)
        made = {}
        for key, cos_t, offset, ortho in (
            ("dup", cos_hi, 1_000_000, None),
            ("miss", cos_lo, 2_000_000, "dup_dir"),
        ):
            sin_t = float(np.sqrt(1.0 - cos_t * cos_t))
            for attempt in range(500):
                u = rng.standard_normal(64)
                u -= (u @ vhat) * vhat
                if ortho is not None:
                    d = made["dup_dir"]
                    u -= (u @ d) * d
                u /= np.linalg.norm(u)
                cand32 = ((cos_t * vhat + sin_t * u) * nv).astype(np.float32)
                sc = _signs(cand32)
                sim32 = float(
                    cand32.astype(np.float64) @ v32.astype(np.float64)
                ) / (np.linalg.norm(cand32.astype(np.float64))
                     * np.linalg.norm(v32.astype(np.float64)))
                ok_sim = (sim32 >= 0.955) if key == "dup" else (sim32 <= 0.945)
                if ok_sim and any(a == b for a, b in zip(sc, sv)):
                    made[key] = cand32
                    made[key + "_dir"] = u
                    out.append((vid + offset, [float(x) for x in cand32]))
                    break
            else:  # pragma: no cover — seeded draws; bound never hit
                raise AssertionError(f"no co-resident {key} for {vid}")
    # numeric guard on every unplanned pair among the constructed set
    cons = np.array([np.array(v, dtype=np.float64) for _, v in out])
    cons /= np.linalg.norm(cons, axis=1, keepdims=True)
    sims = cons @ cons.T
    np.fill_diagonal(sims, 0.0)
    assert float(sims.max()) < 0.94, "unplanned constructed pair >= 0.94"
    return out


@query(
    "q_semantic_dedup_near_planted",
    oracle="""
        SELECT CAST(vec_id AS BIGINT) AS vec_id
        FROM embeddings WHERE vec_id < 1000
        UNION ALL
        SELECT CAST(vec_id + 2000000 AS BIGINT) AS vec_id
        FROM embeddings WHERE vec_id < 12
    """,
    tags=("DEDUP", "SEMANTIC", "ANN"),
)
def q_semantic_dedup_near_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked THRESHOLD-STRADDLING contract for SemDeDup (VERDICT
    r09 'do this' #5): unlike q_semantic_dedup_planted's identical
    copies (sim exactly 1.0), every planted vector here is a genuine
    near-dup — 12 rotations at cosine ≈ 0.97 (above the 0.95 bar, must
    drop) and 12 at ≈ 0.90 (below, must survive), constructed with
    provable bucket co-residence so the exact-cosine verify is the only
    arbiter (see :func:`_semdedup_near_vectors`). ``n_centroids=1``
    makes cell co-residence trivial by construction — the multi-cell
    assignment path is pinned by the identical-copy twin, where the
    argmax argument is exact. A verify that rounds before thresholding,
    compares with > instead of >=-semantics drift, mis-keys buckets, or
    merges across the straddle flips the driver hash. keep="min_id"
    keeps the survivor analytic. resolve="single_link" is EQUAL to CC
    on this pair graph (every duplicate group is a {base, dup} 2-clique
    — the orthogonal rotation directions bound all other pairs < 0.94,
    asserted numerically in _semdedup_near_vectors) and makes the plan
    fully lazy, so the built plan is memoized per process (cached_plan:
    every evaluation re-executes bucket-join → exact-cosine verify →
    anti-join live over the process-cached key frames)."""
    def _build_fixture():
        emb = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") < 1000
        )
        base_rows = (
            emb.filter(F.col("vec_id") < 12)
            .select("vec_id", "embedding").collect()
        )
        planted = _semdedup_near_vectors(
            base_rows, n_planes=8, n_tables=2, seed=42
        )
        extra = literal_df(spark, 
            planted, emb.select("vec_id", "embedding").schema
        )
        return emb.select("vec_id", "embedding").unionAll(extra).coalesce(1)

    def _build():
        planted = cached_fixture(
            spark, "semdedup_near_planted", sf_dir, _build_fixture
        )
        out = S.semantic_dedup(
            planted, dim=64, threshold=0.95, n_centroids=1, sample_n=256,
            n_planes=8, n_tables=2, keep="min_id", expected_rows=1024,
            cache_key=sf_dir + ":semdedup_near_planted",
            frame_cache=True, resolve="single_link",
        )
        return out.select("vec_id")

    return cached_plan(spark, "q_semantic_dedup_near_planted", sf_dir, _build)


#: per-(session, sf_dir) memo of the seen/new id split (half the max id
#: of the vec_id<1000 slice) — derived from the DATA, not hard-coded, so
#: the keep path is non-vacuous at every SF (VERDICT r10 'do this' #2:
#: the literal 500 split made both sides 0 rows at sf0.01, where the
#: embeddings table has exactly 500 rows)
_SEMINC_SPLIT: dict[tuple, int] = {}


def _seminc_split(spark: SparkSession, sf_dir: str) -> int:
    key = (spark.sparkContext.applicationId, sf_dir)
    h = _SEMINC_SPLIT.get(key)
    if h is None:
        emb = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") < 1000
        )
        h = (emb.agg(F.max("vec_id")).collect()[0][0] + 1) // 2
        _SEMINC_SPLIT[key] = h
    return h


@query(
    "q_semantic_incremental_planted",
    oracle="""
        WITH h AS (
            SELECT CAST(FLOOR((MAX(vec_id) + 1) / 2) AS BIGINT) AS h
            FROM embeddings WHERE vec_id < 1000
        )
        SELECT CAST(vec_id AS BIGINT) AS vec_id
        FROM embeddings, h WHERE vec_id >= h.h AND vec_id < 1000
    """,
    tags=("DEDUP", "SEMANTIC", "ANN", "INCREMENTAL"),
)
def q_semantic_incremental_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked contract for the INCREMENTAL SemDeDup composition
    (r10: the batch-vs-corpus path the streaming sink runs through
    keyindex.semantic_dedup_batch) — frozen centroids trained on the
    SEEN corpus, batch (cell, t, b) keys joined against the seen keys,
    exact-cosine verify of the candidates — exercised through the very
    helpers the sink uses (semantic_cell_keys +
    semantic_losers_vs_seen). seen = the first half of the vec_id<1000
    slice (split h = (max_id+1)/2, DERIVED from the table so the keep
    path is live at every SF — VERDICT r10 'do this' #2); the batch
    replays 20 seen vectors as IDENTICAL copies under shifted ids
    (identical vector ⇒ identical argmax cell against ANY frozen
    centroid set and identical hyperplane signs in every table ⇒
    guaranteed candidate, cosine exactly 1.0 ≥ 0.95 ⇒ dropped) plus the
    second half as the genuinely new load (max seen-vs-new cosine is
    0.51/0.53 at sf0.01/sf0.1 — verified numerically — so the verify
    keeps them all). Survivors are therefore exactly the second-half
    rows while the assign/key/join/verify machinery runs live; a bug in
    frozen-cell assignment, key banding, the candidate join, or the
    verify threshold flips the driver hash. The seen-side key frame is
    process-cached (the persisted ``_semcells`` side table IS this
    frame — a deployment signs the corpus once per snapshot); the batch
    side is signed live per evaluation, as an ingest tick would. The
    whole composition is action-free, so the built plan is memoized per
    process (cached_plan) — every evaluation re-executes batch signing,
    the candidate join, and the exact-cosine verify."""
    def _fixtures():
        h = _seminc_split(spark, sf_dir)
        emb = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") < 1000
        )
        seen = emb.filter(F.col("vec_id") < h).select("vec_id", "embedding")
        batch = (
            emb.filter(F.col("vec_id") >= h)
            .select("vec_id", "embedding")
            .unionAll(
                emb.filter(F.col("vec_id") < 20).select(
                    (F.col("vec_id") + 1_000_000).alias("vec_id"),
                    "embedding",
                )
            )
        )
        return seen.coalesce(1), batch.coalesce(1)

    def _build():
        seen = cached_fixture(spark, "seminc_seen", sf_dir,
                              lambda: _fixtures()[0])
        batch = cached_fixture(spark, "seminc_batch", sf_dir,
                               lambda: _fixtures()[1])
        ck = (sf_dir + ":seminc_centroids", "embedding", 4, 256, 42)
        cents = S._CENTROID_CACHE.get(ck)
        if cents is None:
            cents = S._kmeans_centroids(seen, "embedding", 4, 256, seed=42)
            S._CENTROID_CACHE[ck] = cents
        sk = cached_fixture(
            spark, "seminc_seen_keys", sf_dir,
            lambda: S.semantic_cell_keys(
                seen, 64, "vec_id", "embedding", cents, n_planes=8,
                n_tables=2
            ),
        ).withColumnRenamed("vec_id", "__seen_id")
        bk = S.semantic_cell_keys(
            batch, 64, "vec_id", "embedding", cents, n_planes=8, n_tables=2
        ).withColumnRenamed("vec_id", "__new_id")
        cands = (
            bk.join(sk, on=["cell", "t", "b"])
            .select(F.col("__new_id").alias("id_a"),
                    F.col("__seen_id").alias("id_b"))
            .distinct()
        )
        losers = S.semantic_losers_vs_seen(
            batch, seen, cands, "vec_id", "embedding", 64, threshold=0.95
        )
        return batch.join(losers, on="vec_id", how="left_anti").select("vec_id")

    return cached_plan(
        spark, "q_semantic_incremental_planted", sf_dir, _build
    )


@query(
    "q_curate_corpus_planted",
    oracle=_curate_exact_oracle(),
    tags=("DEDUP", "TEXT", "PIPELINE"),
)
def q_curate_corpus_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked contract for the FULL four-stage recipe — the
    MinHash-LSH stage INCLUDED, which q_curate_exact switches off: over
    the q_curate_exact planted corpus at ``near_dup_threshold=1.0`` the
    sketch stage's removal set is deterministic by construction (exact
    copies are already gone after the exact-dedup stage, and 1.0 only
    merges identical shingle sets — see q_minhash_dedup_planted), so the
    full recipe's output equals the deterministic oracle while the
    banding/verify machinery runs live in the plan. A sketch stage
    that drops or duplicates ANY row flips the driver hash.
    ``transitive=False`` (single-link) is equal to CC here by the
    q_minhash_dedup_planted argument — identical-shingle-set groups are
    complete candidate cliques at threshold 1.0 (and the oracle's
    premise is that none exist post-exact-dedup, under which BOTH
    resolutions remove nothing) — and with ``checkpoint=False`` the
    whole recipe is action-free, so the built plan is memoized
    (cached_plan): every evaluation re-executes gate → exact dedup →
    banding self-join → verify → annotate live. The statistical
    0.8-threshold recipe stays rows-only as q_curate_corpus."""
    from newsmaper_etl_spark.operators.curate import curate_corpus

    def _fixture():
        docs = fan_out(load_table(spark, sf_dir, "documents"), sf_dir)
        base = docs.select("doc_id", "text")
        tenth = base.filter(F.col("doc_id") % 10 == 0)
        return base.unionByName(
            tenth.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
        ).unionByName(
            tenth.select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                F.lit("!!!").alias("text"),
            )
        )

    def _build():
        planted = cached_fixture(spark, "curate_planted", sf_dir, _fixture)
        return curate_corpus(
            planted, near_dup=True, near_dup_threshold=1.0,
            minhash_kwargs={"transitive": False, "checkpoint": False},
        ).select("doc_id", "lang_pred", "n_tokens", "n_bpe", "fp", "quality")

    return cached_plan(spark, "q_curate_corpus_planted", sf_dir, _build)


def _curate_incremental_oracle() -> str:
    """Composed oracle for the INCREMENTAL curation recipe: the
    q_curate_exact CTE skeleton with a cross-corpus NOT-EXISTS stage
    between the quality gate and the within-batch keep-first — the
    exact semantics curate_corpus_incremental promises (seen = docs
    with id % 3 <> 0; the batch = the % 3 = 0 docs, plus replayed
    copies of seen docs, plus within-batch second copies, plus junk)."""
    from newsmaper_etl_spark.plans.extensions import _STOP_SQL, _lang_case_sql

    return f"""
        WITH docs AS (
            SELECT doc_id, text FROM documents WHERE doc_id < 400
        ),
        seen AS (
            SELECT doc_id, text FROM docs WHERE doc_id % 3 <> 0
        ),
        input AS (
            SELECT doc_id, text FROM docs WHERE doc_id % 3 = 0
            UNION ALL  -- replays of seen docs: cross-corpus stage drops
            SELECT doc_id + 1000000, text FROM docs WHERE doc_id % 6 = 1
            UNION ALL  -- second copies of batch docs: keep-first drops
            SELECT doc_id + 2000000, text FROM docs WHERE doc_id % 9 = 0
            UNION ALL  -- junk: quality gate drops
            SELECT doc_id + 3000000, '!!!' FROM docs WHERE doc_id % 9 = 0
        ),
        base AS (
            SELECT doc_id, text,
                   len(text) AS tl,
                   len(text) - len(translate(text, '.,;:!?''"', '')) AS n_punct,
                   len(string_split(text, ' ')) AS n_tok,
                   len(list_filter(string_split(text, ' '),
                       w -> list_contains({_STOP_SQL}, w))) AS n_stop
            FROM input
        ),
        scored0 AS (
            SELECT doc_id, text, n_tok,
                   FLOOR(10000 * (
                       (CASE WHEN tl >= 20 AND tl <= 10000 THEN 1.0 ELSE 0.3 END) * 0.4
                       + (CASE WHEN (CASE WHEN tl > 0 THEN n_punct / tl ELSE 0.0 END) <= 0.2
                          THEN 1.0 ELSE 0.5 END) * 0.3
                       + LEAST((CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END) * 3,
                               1.0) * 0.3
                   )) / 10000 AS quality
            FROM base
        ),
        fresh AS (
            SELECT g.* FROM scored0 g
            WHERE g.quality >= 0.5
              AND NOT EXISTS (SELECT 1 FROM seen s WHERE s.text = g.text)
        ),
        survivors AS (
            SELECT doc_id, text, n_tok, quality FROM (
                SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS keep
                FROM fresh
            ) WHERE doc_id = keep
        ),
        ann AS (
            SELECT doc_id,
                   CAST(SUM(CAST(CEIL(len(w) / 4.0) AS BIGINT)) AS BIGINT) AS n_bpe,
                   CAST(SUM(i * (ascii(substring(w, 1, 1)) + 131 * len(w))) AS BIGINT) AS fp
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                         unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
                  FROM survivors)
            GROUP BY doc_id
        ),
        lang AS ({_lang_case_sql("survivors")})
        SELECT s.doc_id, l.lang_pred,
               CAST(s.n_tok AS BIGINT) AS n_tokens, a.n_bpe, a.fp, s.quality
        FROM survivors s
        JOIN ann a USING (doc_id)
        JOIN lang l USING (doc_id)
    """


@query(
    "q_curate_incremental_planted",
    oracle=_curate_incremental_oracle(),
    tags=("DEDUP", "TEXT", "PIPELINE", "INCREMENTAL"),
)
def q_curate_incremental_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked contract for the NIGHTLY curation composition
    (VERDICT r07 'do this' #8): tonight's batch curated against the
    ingested corpus through curate_corpus_incremental — quality gate →
    incremental exact dedup (batch keys anti-joined against the corpus,
    hashed basis, + within-batch keep-first) → incremental MinHash
    near-dedup THROUGH the persisted-band-keys seam (threshold 1.0: the
    q_minhash_dedup_planted determinism argument makes the live
    banding/verify machinery's removal set deterministic) → annotation.
    seen = docs with id % 3 ≠ 0; the batch = the id % 3 = 0 docs, plus
    replayed copies of seen docs under shifted ids (the cross-corpus
    stage must drop them), plus second copies of batch docs (keep-first
    must drop), plus sub-gate junk (the gate must drop). A leak in any
    stage — or in how the stages CHAIN — changes the surviving rows or
    their annotations and flips the hash. Routed THROUGH
    run_sql_pipeline (batch / corpus / persisted band keys all as view
    names), so this row also pins the SQL-registration surface of the
    nightly composition end to end."""
    from newsmaper_etl_spark.sql_functions import run_sql_pipeline

    def _docs():
        return (
            fan_out(load_table(spark, sf_dir, "documents"), sf_dir)
            .select("doc_id", "text")
            # bounded contract corpus (the q_ann_ivf_planted precedent):
            # the row pins stage CHAINING, not scale — the scale curve for
            # the underlying stages is tools/bench_scale_dedup.py's job.
            # One partition for ~400 rows: the recipe chains ~10 shuffle
            # stages, and at 16-partition toy layout their task-launch
            # floor (28 jobs x 80-225 tasks, measured) dwarfs the data
            .filter(F.col("doc_id") < 400)
            .coalesce(1)
        )

    def _seen():
        return _docs().filter(F.col("doc_id") % 3 != 0)

    def _batch():
        docs = _docs()
        sixth = docs.filter(F.col("doc_id") % 6 == 1)
        ninth = docs.filter(F.col("doc_id") % 9 == 0)
        return (
            docs.filter(F.col("doc_id") % 3 == 0)
            .unionByName(
                sixth.select(
                    (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
                )
            )
            .unionByName(
                ninth.select(
                    (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
                )
            )
            .unionByName(
                ninth.select(
                    (F.col("doc_id") + 3_000_000).alias("doc_id"),
                    F.lit("!!!").alias("text"),
                )
            )
        )

    def _build():
        # fixture_cache: seen/batch are the planted corpora (built once
        # per process); the banded frame is the PERSISTED-INDEX seam
        # itself — a deployment derives it once per corpus snapshot, so
        # caching it across invocations is the production shape
        seen = cached_fixture(spark, "ci_seen", sf_dir, _seen)
        batch = cached_fixture(spark, "ci_batch", sf_dir, _batch)
        banded = cached_fixture(
            spark, "ci_banded", sf_dir,
            lambda: D.banded_signatures(
                seen, "doc_id", "text", num_hashes=8, bands=2
            ),
        )
        batch.createOrReplaceTempView("__ci_batch")
        seen.createOrReplaceTempView("__ci_seen")
        banded.createOrReplaceTempView("__ci_banded")
        out = run_sql_pipeline(
            spark, "curate_corpus_incremental", "__ci_batch", "__ci_curated",
            seen_view="__ci_seen", seen_banded_view="__ci_banded",
            near_dup_threshold=1.0,
            # within-batch near-dedup is minhash_dedup verbatim, already
            # pinned hash-green by its own planted contract
            # (q_minhash_dedup_planted); re-running it here would double
            # this row's machinery to re-pin a stage another row owns.
            # Within-batch EXACT keep-first stays active (the planted
            # second copies still have to drop)
            within_batch_near_dup=False,
            # checkpoint=False (both seams): over the ~400-row fixture
            # the re-referenced batch subtree is cheap and shareable,
            # and an eager=False checkpoint node would FREEZE the exact
            # stage's output after the first evaluation — the plan must
            # stay action-free and bake-free for cached_plan below
            checkpoint=False,
            minhash_kwargs={"num_hashes": 8, "bands": 2,
                            "checkpoint": False},
        )
        return out.select(
            "doc_id", "lang_pred", "n_tokens", "n_bpe", "fp", "quality"
        )

    # cached_plan: the composition is action-free with the checkpoints
    # off, so the built plan is memoized per process — every evaluation
    # re-executes gate → corpus-key anti-join → keep-first → band join →
    # side-split verify → annotate live (VERDICT r10 'do this' #1)
    return cached_plan(
        spark, "q_curate_incremental_planted", sf_dir, _build
    )


@query("q_ann_ivf", oracle=None, statistical=True, tags=("ANN", "IVF"))
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate kNN (rows-only: cell membership depends on the
    sampled k-means centroids; recall-vs-exact is property-tested)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    # pair-estimate unroll cutover, as in q_ann_lsh
    sf = parse_sf(sf_dir)
    return S.ivf_cosine_topk(
        queries, emb, k=3, n_centroids=8, nprobe=2, sample_n=512, dim=64,
        cache_key=sf_dir + ":embeddings", unroll=sf is None or sf >= 10,
    )


# --------------------------------------------------------------------------
# Distributed k-means + cluster-balanced sampling (operators/clustering.py)
# --------------------------------------------------------------------------

from newsmaper_etl_spark.operators import clustering as CL  # noqa: E402
from newsmaper_etl_spark.operators.sampling import mix_bucket_sql  # noqa: E402

#: Planted-separation fixture: add +8.0 to dimension (vec_id % 3) of
#: every embedding. Three clusters with inter-center gaps ~128 in
#: squared L2 against within-cluster spread ~2, so the true assignment
#: is vec_id % 3 BY CONSTRUCTION — the oracle states that truth
#: literally while the engine runs the full distance/argmin/Lloyd's
#: machinery live (the q_semantic_dedup_planted argument).
_KM_K = 3
_KM_SHIFT = 8.0
_KM_CENTERS = [
    [_KM_SHIFT if i == j else 0.0 for i in range(64)] for j in range(_KM_K)
]


def _shifted_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            + F.when(
                i == (F.col("vec_id") % _KM_K).cast("int"), F.lit(_KM_SHIFT)
            ).otherwise(F.lit(0.0)),
        ).alias("vecd"),
    )


@query(
    "q_kmeans_assign",
    oracle="""
        SELECT CAST(vec_id AS BIGINT) AS vec_id,
               CAST(vec_id % 3 AS INT) AS cluster
        FROM embeddings
    """,
    tags=("CLUSTERING",),
)
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-center assignment (operators.clustering.kmeans_assign,
    literal-centers projection path — shuffle-free): every row's
    argmin over the three planted centers must equal the planted truth
    vec_id % 3. A distance, cast-width, argmin, or tie-break bug
    surfaces as assignment flips under margins (~128 vs ~2 in squared
    L2) that no float wobble can explain."""
    sh = _shifted_embeddings(spark, sf_dir)
    return CL.kmeans_assign(sh, _KM_CENTERS, vec_col="vecd").select(
        "vec_id", "cluster"
    )


def _fit_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FIT fixture quantizes each component to a multiple of 2^-4
    (FLOOR(x*16)/16) BEFORE the planted shift: sums of bounded dyadic
    rationals are EXACT in IEEE-754 under any order, so the per-cluster
    means are bit-identical across engines and across Spark's
    nondeterministic partial-agg order — the driver hash cannot ride a
    .00005 rounding boundary (ADVICE r14 #4)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x, i: F.floor(x.cast("double") * 16) / 16
            + F.when(
                i == (F.col("vec_id") % _KM_K).cast("int"), F.lit(_KM_SHIFT)
            ).otherwise(F.lit(0.0)),
        ).alias("vecd"),
    )


@query(
    "q_kmeans_fit",
    oracle="""
        WITH v AS (
            SELECT vec_id,
                   unnest(range(0, len(embedding))) AS pos,
                   unnest(list_transform(embedding,
                          x -> FLOOR(CAST(x AS DOUBLE) * 16) / 16)) AS x0
            FROM embeddings
        )
        SELECT CAST(vec_id % 3 AS INT) AS cluster,
               CAST(pos AS INT) AS pos,
               FLOOR(10000 * AVG(x0 + CASE WHEN pos = vec_id % 3
                                           THEN 8.0 ELSE 0.0 END)) / 10000
                   AS val
        FROM v GROUP BY 1, 2
    """,
    tags=("CLUSTERING",),
)
def q_kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus Lloyd's k-means (operators.clustering.kmeans_fit,
    k=3, two iterations, init = rows 0/1/2 — one per planted cluster):
    with planted separation the assignment is vec_id % 3 from the
    FIRST iteration on, so the converged centers are exactly the
    per-cluster per-dim means the oracle computes — every centroid
    component is driver-hashed (192 values). The fixture's 2^-4
    quantization makes those means EXACT doubles on both engines (see
    _fit_embeddings), and the emitted value uses the repo's
    floor-scaling (identical IEEE mul/floor/div on identical inputs),
    not ROUND (engine-divergent on shortest-repr boundaries). An
    assignment, partial-agg, empty-cluster, or init-ordering bug moves
    centroids by cluster-scale amounts."""
    sh = _fit_embeddings(spark, sf_dir)
    centers = CL.kmeans_fit(
        sh, _KM_K, vec_col="vecd", iters=2, init_ids=[0, 1, 2]
    )
    rows = [
        (j, p, float(v))
        for j, c in enumerate(centers)
        for p, v in enumerate(c)
    ]
    out = literal_df(spark, rows, "cluster int, pos int, val double")
    return out.select(
        "cluster", "pos",
        (F.floor(F.lit(10000) * F.col("val")) / 10000).alias("val"),
    )


@query(
    "q_cluster_balanced",
    oracle=f"""
        WITH a AS (
            SELECT vec_id, CAST(vec_id % 3 AS INT) AS cluster
            FROM embeddings
        ),
        r AS (
            SELECT vec_id, cluster,
                   ROW_NUMBER() OVER (
                       PARTITION BY cluster
                       ORDER BY {mix_bucket_sql('vec_id')}, vec_id
                   ) AS rn
            FROM a
        )
        SELECT CAST(vec_id AS BIGINT) AS vec_id, cluster
        FROM r WHERE rn <= 20
    """,
    tags=("CLUSTERING", "SAMPLING"),
)
def q_cluster_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling (operators.clustering.
    cluster_balanced_sample): live assignment + the deterministic
    per-group sampler, capped at 20 rows per semantic cell. The oracle
    replays the planted assignment + the shared mix-bucket rank, so
    the kept SET pins both the argmin and the sampler's order."""
    sh = _shifted_embeddings(spark, sf_dir)
    return CL.cluster_balanced_sample(
        sh, _KM_CENTERS, 20, vec_col="vecd"
    ).select("vec_id", "cluster")


def _curate_selected_oracle() -> str:
    """Composed oracle for the SELECTION-wired recipe slice: quality
    floor → classifier gate → exact keep-first dedup → DSIR Gumbel
    top-k. Every fragment is the one its standalone contract
    hash-matches (quality: _quality_scored_ctes; classifier/logw/
    gumbel: the operators' own SQL renderers)."""
    from newsmaper_etl_spark.operators import selection as SEL
    from newsmaper_etl_spark.plans.curation import _DSIR_MISS, _DSIR_W

    clf = SEL.classifier_score_sql("text", _DSIR_W, bias=0.03125,
                                   missing=_DSIR_MISS)
    lw = SEL.token_logweight_sql("text", _DSIR_W, missing=_DSIR_MISS)
    return f"""
        WITH input AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id + 2000000, '!!!' FROM documents WHERE doc_id % 10 = 0
        ),
        {_quality_scored_ctes("input")},
        clf AS (
            SELECT doc_id, text, n_tok, quality
            FROM scored0
            WHERE quality >= 0.5 AND ({clf}) >= 0.0
        ),
        surv AS (
            SELECT doc_id, text, n_tok, quality FROM (
                SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS keep
                FROM clf
            ) WHERE doc_id = keep
        )
        SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens, quality
        FROM surv
        ORDER BY (({lw}) + {SEL.gumbel_sql('doc_id', 3)}) DESC, doc_id
        LIMIT 100
    """


@query(
    "q_curate_selected_planted",
    oracle=_curate_selected_oracle(),
    tags=("PIPELINE", "SELECTION"),
)
@plan_cached
def q_curate_selected_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The selection-wired recipe slice END TO END (quality floor →
    classifier gate → exact keep-first dedup → DSIR top-k resampling →
    annotation), over the same planted corpus as q_curate_exact — so
    the r14 recipe kwargs (classifier_weights / dsir_weights+dsir_k)
    are themselves under the driver hash, not just the standalone
    operators. Stage ORDER is load-bearing and pinned: resampling runs
    after dedup (a duplicate pair must not compete for the budget —
    the planted dups' originals can be selected, the copies cannot),
    and the classifier runs before dedup (both members of a planted
    pair see the same verdict, so keep-first still collapses them)."""
    from newsmaper_etl_spark.operators.curate import curate_corpus
    from newsmaper_etl_spark.plans.curation import _DSIR_MISS, _DSIR_W

    def _build():
        docs = fan_out(load_table(spark, sf_dir, "documents"), sf_dir)
        base = docs.select("doc_id", "text")
        tenth = base.filter(F.col("doc_id") % 10 == 0)
        return base.unionByName(
            tenth.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        ).unionByName(
            tenth.select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.lit("!!!").alias("text"),
            )
        )

    planted = cached_fixture(spark, "curate_planted", sf_dir, _build)
    out = curate_corpus(
        planted,
        near_dup=False,
        classifier_weights=_DSIR_W,
        classifier_kwargs={"bias": 0.03125, "missing": _DSIR_MISS,
                           "threshold": 0.5},
        dsir_weights=_DSIR_W,
        dsir_k=100,
        dsir_seed=3,
        dsir_missing=_DSIR_MISS,
    )
    return out.select("doc_id", "n_tokens", "quality")
