"""Corpus sampling / batching operators for training-data pipelines.

The mixture-construction side of a 100 TB curation run: deterministic
stratified sampling (per-stratum mixture weights), token-budget sequence
packing (training batch assignment), and fixed-size document chunking
(context-window splits). All three are pure DataFrame plans:

- ``stratified_sample`` is a single filter — no shuffle at all; at scale
  it fuses into the scan and prunes with pushed-down stratum predicates.
- ``pack_sequences`` is one window (one shuffle on the stream key);
  parallelism = number of streams, so partition by a high-cardinality
  key (source/shard), never a constant.
- ``chunk_documents`` is a generator projection (no shuffle); output
  size ≈ input token count / chunk_tokens rows.

Determinism is engine-portable on purpose (no rand(), no xxhash64):
every sampled set is reproducible bit-for-bit from ids alone, which is
what makes dataset ablations and decontamination audits possible — and
what lets the DuckDB oracle check the exact same rows.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from newsmaper_etl_spark.localrel import literal_df
from pyspark.sql.window import Window

# Engine-portable deterministic mixer (LCG constants from glibc's
# rand(3)). The id is folded mod 1e6+3 BEFORE the multiply so the
# arithmetic stays far inside int64 for arbitrarily large ids — DuckDB
# raises on BIGINT overflow while the JVM wraps, so unfolded products
# would silently diverge between engine and oracle at scale.
_LCG_A = 1103515245
_LCG_C = 12345
_FOLD = 1_000_003
_MOD = 2_147_483_647


_NUMERIC_TYPES = {"tinyint", "smallint", "int", "bigint", "long", "integer"}


def _require_numeric_id(df: DataFrame, id_col: str, op: str) -> None:
    """mix_bucket's LCG needs an integral id: casting a UUID-ish string
    to long yields NULL (every rate filter then drops 100% of rows with
    no error) or throws under ANSI — fail loudly at plan-build time
    instead. String-keyed corpora should derive a numeric id first
    (xxhash64 is not engine-portable, so it cannot silently stand in —
    the oracle twin must see the same arithmetic)."""
    dtype = dict(df.dtypes).get(id_col)
    if dtype not in _NUMERIC_TYPES:
        raise ValueError(
            f"{op}: id column {id_col!r} has type {dtype!r}; the "
            "deterministic bucket needs an integral id (derive one "
            "explicitly for string-keyed corpora)"
        )


def mix_bucket(id_col: str | Column, buckets: int = 10_000) -> Column:
    """Deterministic pseudo-random bucket in [0, buckets) from an id.

    The fold is POSITIVE modulus (pmod, rendered portably as
    ``(x % m + m) % m`` so the SQL twin is the same expression): a
    sign-preserving ``%`` on a negative id would yield a negative bucket
    that every rate filter silently keeps (bucket < rate*10000 is true
    for any negative value, even at rate 0.0)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    folded = (c.cast("long") % _FOLD + _FOLD) % _FOLD
    mixed = (folded * _LCG_A + _LCG_C) % _MOD
    return (mixed % buckets).cast("int")


def mix_bucket_sql(id_expr: str, buckets: int = 10_000) -> str:
    """The oracle-side rendering of :func:`mix_bucket` (same arithmetic)."""
    return (
        f"CAST((((CAST({id_expr} AS BIGINT) % {_FOLD} + {_FOLD}) % {_FOLD})"
        f" * {_LCG_A} + {_LCG_C}) % {_MOD} % {buckets} AS INTEGER)"
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    *,
    default_rate: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its id-derived
    bucket falls under the stratum's rate (e.g. ``{'en': 0.5, 'fr': 0.25}``
    keeps ~50% of English and ~25% of French rows, always the SAME rows).

    This is how mixture weights are applied when assembling a training
    corpus from heterogeneous sources: one scan, one filter, no shuffle,
    reproducible across runs and engines.
    """
    _require_numeric_id(df, id_col, "stratified_sample")
    bucket = mix_bucket(id_col)
    rate: Column = F.lit(float(default_rate))
    for key, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == key, float(r)).otherwise(rate)
    return df.filter(bucket < rate * 10_000)


def temperature_sample(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    budget_frac: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-flattened mixture subsampling (the multilingual
    α-sampling of XLM-R / mT5: group shares ∝ n_g^α, α < 1 boosting the
    tail languages a raw-proportional mix starves): keep group g at the
    deterministic per-row rate that lands its kept count near
    ``share_g(α) · budget_frac · N``, capped at keeping every row —
    this operator only SUBSAMPLES; upsampling the tail beyond 1× is the
    training loader's epoch arithmetic, not a corpus edit.

    Group counts come from one aggregate whose result is COLLECTED —
    ``group_col`` must be bounded-cardinality by construction (langs,
    sources — the keyword-map contract); the filter itself is the
    shuffle-free :func:`mix_bucket` membership, so the whole sample is
    one scan + one bounded agg, reproducible across runs and engines.

    Cross-engine determinism: per-group thresholds are fixed as INTEGER
    bucket cutoffs via round-then-floor (``floor(round(rate·10⁴, 4))``)
    computed from the same expression shape the SQL oracle uses — the
    4-digit round absorbs libm/summation-order ulp differences so both
    engines derive identical cutoffs."""
    import math

    _require_numeric_id(df, id_col, "temperature_sample")
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha={alpha} (0 < alpha <= 1)")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(group_col).count().collect()
        if r[0] is not None
    }
    if not counts:
        return df.filter(F.lit(False))
    total = sum(counts.values())
    s = sum(n ** alpha for _, n in sorted(counts.items()))
    thr = {
        g: min(
            10_000,
            math.floor(
                round((n ** alpha / s) * (budget_frac * total) / n * 10_000, 4)
            ),
        )
        for g, n in counts.items()
    }
    bucket = mix_bucket(id_col)
    cutoff: Column = F.lit(0)
    for g, v in sorted(thr.items()):
        cutoff = F.when(F.col(group_col) == g, F.lit(v)).otherwise(cutoff)
    return df.filter(bucket < cutoff)


def pack_sequences(
    df: DataFrame,
    *,
    size_col: str,
    budget: int,
    stream_col: str,
    order_col: str,
    out: str = "bin_id",
) -> DataFrame:
    """Assign each document to a fixed-token-budget training bin.

    Cumulative-sum block packing: within each stream (ordered by
    ``order_col``), bin k covers the documents whose PRECEDING cumulative
    size lands in [k*budget, (k+1)*budget). Bins are cumsum blocks, not
    hard-capped: a document straddling a block boundary stays in the
    earlier bin, so a bin can overflow the budget by up to one document
    (budget 10, sizes [6, 6] → both in bin 0, total 12). That is the
    standard loader contract (greedy fill, trailing overflow truncated or
    split downstream); use chunk_documents first if documents must never
    exceed the budget. One window = one shuffle on the stream key; bins
    are contiguous in stream order, which is exactly what a
    sequence-packing data loader wants (sequential reads, no re-sort).
    """
    # ROWS frame, not the default RANGE frame: RANGE is peer-inclusive,
    # so documents TYING on order_col would all see the full peer-group
    # sum as their cumulative position and land in the same (wrong) bin
    # — bin 0 can end up empty. Ties order arbitrarily under ROWS, but
    # every assignment stays budget-consistent.
    w = (
        Window.partitionBy(stream_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum(size_col).over(w) - F.col(size_col)
    return df.withColumn(out, F.floor(cum_before / budget).cast("bigint"))


def assemble_sequences(
    df: DataFrame,
    *,
    ids_col: str,
    bin_col: str,
    stream_col: str,
    order_col: str,
    out: str = "ids",
    eod_id: int | None = None,
) -> DataFrame:
    """ASSEMBLE packed bins into training sequences: one row per
    (stream, bin) whose ``out`` column is the documents' token-id
    arrays concatenated in ``order_col`` order — the flattened id
    stream a dataloader shards to disk, the step after
    :func:`pack_sequences` assigns bins and
    :func:`~newsmaper_etl_spark.operators.text.bpe_encode_ids`
    produces the ids. ``eod_id`` appends an end-of-document sentinel
    after EVERY document (the GPT-2 <|endoftext|> convention), which
    is how attention masking recovers the boundaries packing erases.

    Plan: ONE groupBy on (stream, bin) — collect_list of (order, ids)
    structs, sort_array (collect order is nondeterministic; the struct
    sort restores it), flatten — all JVM collection expressions, no
    Python. Per-group state is bounded by the bin budget plus one
    straddling document (the pack_sequences overflow contract), so a
    hot group cannot exceed ~budget ids regardless of corpus size.
    ``order_col`` must be unique within a stream (the pack_sequences
    ordering contract)."""
    doc = F.struct(F.col(order_col).alias("o"), F.col(ids_col).alias("i"))
    g = df.groupBy(stream_col, bin_col).agg(
        F.sort_array(F.collect_list(doc)).alias("__docs")
    )
    if eod_id is not None:
        sent = F.array(F.lit(int(eod_id)))
        per_doc = lambda x: F.concat(x["i"], sent)  # noqa: E731
    else:
        per_doc = lambda x: x["i"]  # noqa: E731
    return g.select(
        stream_col, bin_col,
        F.flatten(F.transform("__docs", per_doc)).alias(out),
    )


def sample_per_group(
    df: DataFrame,
    *,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic k-per-group sampling (balanced draws — e.g. "5 docs
    from every source" for eval sets or per-domain caps).

    Rank rows inside each group by their id-derived mix bucket (with the
    id as tie-break) and keep the first k: a reproducible, engine-portable
    stand-in for reservoir sampling. One window = one shuffle on the
    group key; groups are independent, so skew only matters if one group
    dominates — cap it upstream or salt the window (see
    operators.newsmaper.dedup_keep_first).
    """
    _require_numeric_id(df, id_col, "sample_per_group")
    w = Window.partitionBy(group_col).orderBy(
        mix_bucket(id_col), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def budget_select(
    df: DataFrame,
    *,
    tokens_col: str,
    budget: int,
    group_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-BUDGET corpus selection — the data-mixing primitive "fill
    each source's slice of the training mix up to N tokens": rank rows
    inside each group by their id-derived mix bucket (id tie-break, the
    :func:`sample_per_group` order — a deterministic, engine-portable
    shuffle of the docs), take the running token total in that order,
    and keep every row whose cumulative total (INCLUDING itself) fits
    the budget. First-fit over a deterministic order: reproducible
    across runs and engines, and every group fills to the budget
    boundary (the last kept doc may leave slack smaller than the next
    doc — no partial documents, a corpus selection never splits a doc;
    chunking afterwards is :func:`chunk_documents`' job).

    ``group_col=None`` fills ONE global budget. Plan shape: one window
    (= one shuffle on the group key; the global form is a single-
    partition window — use groups at scale, that is what the budget is
    FOR in a mixture), no collect, no join. NULL token counts are
    treated as 0 (metadata-less rows spend no budget but still occupy
    their slot in the order)."""
    _require_numeric_id(df, id_col, "budget_select")
    if budget < 0:
        raise ValueError(f"budget={budget} (must be >= 0)")
    parts = [group_col] if group_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(mix_bucket(id_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(
        F.coalesce(F.col(tokens_col).cast("long"), F.lit(0))
    ).over(w)
    return (
        df.withColumn("__cum", running)
        .filter(F.col("__cum") <= budget)
        .drop("__cum")
    )


def shuffle_rank(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    out: str = "rank",
    buckets: int = 10_000,
    two_level: bool = True,
) -> DataFrame:
    """Deterministic GLOBAL pseudo-random total order — the final
    pre-shard shuffle every training pipeline runs so a loader reading
    shards sequentially still sees a mixed stream. rank is 1-based,
    dense, and equal to ``ROW_NUMBER() OVER (ORDER BY mix_bucket(id),
    id)`` — but computed WITHOUT the single-partition global window
    that literal expression compiles to (the one shape that cannot
    scale: every row through one task). Two-level instead:

    1. one bounded aggregate — rows per mix bucket (``buckets`` is
       bounded by construction, default 10⁴) — COLLECTED and turned
       into driver-side exclusive prefix offsets;
    2. rank = offset(bucket) + row_number within bucket, via a window
       partitioned BY BUCKET (10⁴ independent partitions, each
       ~N/10⁴ rows) and a broadcast join of the 10⁴-row offset frame.

    Work per row is one hash + one bounded window; no global sort, no
    single-partition stage, reproducible across runs and engines (the
    mix_bucket LCG). The id tie-break inside a bucket makes the order a
    pure function of the id set.

    ``two_level=False`` takes the literal one-window form (a single-
    partition global window, one job, no counts collect) — the
    SCALE.md toy-switch rule: below ~10⁵ rows the two-level machinery
    is pure fixed cost (counts job + broadcast join ≈ 0.5 s) against a
    millisecond global sort, and the output is IDENTICAL (both paths
    are ROW_NUMBER over (bucket, id)); callers pick by scale like the
    similarity unroll cutover. The two-level form is the documented
    100 TB path."""
    _require_numeric_id(df, id_col, "shuffle_rank")
    if not two_level:
        w1 = Window.orderBy(mix_bucket(id_col, buckets), F.col(id_col))
        return df.withColumn(
            out, F.row_number().over(w1).cast("long")
        )
    spark = df.sparkSession
    b = mix_bucket(id_col, buckets)
    counts = {
        int(r[0]): int(r[1])
        for r in df.select(b.alias("__mb")).groupBy("__mb").count().collect()
    }
    offsets, acc = [], 0
    for bk in sorted(counts):
        offsets.append((bk, acc))
        acc += counts[bk]
    if not offsets:
        return df.withColumn(out, F.lit(None).cast("long")).filter(
            F.lit(False)
        )
    off = F.broadcast(
        literal_df(spark, offsets, "__mb int, __off long")
    )
    w = Window.partitionBy("__mb").orderBy(F.col(id_col))
    return (
        df.withColumn("__mb", b)
        .join(off, on="__mb")
        .withColumn(out, (F.col("__off") + F.row_number().over(w)).cast("long"))
        .drop("__mb", "__off")
    )


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 50,
) -> DataFrame:
    """Split documents into fixed-size token windows → one row per chunk
    ``(id, chunk_id, chunk_text, n_chunk_tokens)``.

    The chunk array is built with JVM higher-order functions
    (sequence → slice → array_join) and exploded DIRECTLY as an
    expression — never via a withColumn alias, which Catalyst's
    InferFiltersFromGenerate would re-inline per row (measured ~20× on
    the dedup shingle path; see operators/dedup.py::jaccard_verify).
    Generator output is ~n_tokens/chunk_tokens rows per doc: purely
    narrow, no shuffle, safe at any scale.
    """
    # the token array is bound as a NAMED column first: referenced once
    # per chunk inside the transform lambda, an inline split() would
    # re-tokenize the whole document per chunk (O(n²/chunk) — the HOF
    # recompute pitfall; same fix as dedup.py::minhash_signature, and
    # CollapseProject declines to re-inline a non-cheap multi-referenced
    # expression)
    bound = df.select(
        F.col(id_col).alias("id"),
        F.split(F.col(text_col), " ", -1).alias("__toks"),
    )
    toks = F.col("__toks")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(chunk_tokens))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "
        ),
    )
    out = bound.select(
        "id",
        F.posexplode(chunks).alias("chunk_id", "chunk_text"),
    )
    return out.withColumn(
        "n_chunk_tokens", F.size(F.split("chunk_text", " ", -1)).cast("int")
    )


def epoch_weight_parts(w: float) -> tuple[int, int]:
    """Split an epoch weight into (whole copies, fractional-share bucket
    cutoff in ten-thousandths) via round-then-floor — the
    temperature_sample integer-cutoff rule. THE one source of truth for
    :func:`epoch_upsample` AND its SQL oracle renderer
    (plans/curation.py:_epoch_parts_sql): a rounding tweak made in only
    one copy would silently desync engine and oracle."""
    import math

    base = math.floor(w)
    return base, min(10_000, math.floor(round((w - base) * 10_000, 4)))


def epoch_upsample(
    df: DataFrame,
    weights: Mapping[str, float],
    group_col: str,
    id_col: str = "doc_id",
    default_weight: float = 1.0,
    epoch_out: str = "epoch",
) -> DataFrame:
    """Multi-EPOCH mixture materialization — the training-mix primitive
    "see source g ``w_g`` times per pass" (the Llama-recipe upsampling
    of high-quality sources; the complement of
    :func:`temperature_sample`, which only subsamples): each row is
    emitted ``floor(w)`` times plus one more for the deterministic
    ``frac(w)`` share of rows (the id-derived :func:`mix_bucket`
    membership — the stratified_sample rule), with an ``epoch`` index
    0..k-1 on each copy so downstream shuffling/packing can
    disambiguate copies. w < 1 degrades to pure subsampling; w = 0
    drops the group; fractional thresholds are INTEGER bucket cutoffs
    (round-then-floor, the temperature_sample rule) so both engines
    derive identical copy counts.

    Plan: a generator projection (per-row sequence explode) — NO
    shuffle, no collect, linear in OUTPUT size; the weights table is a
    literal CASE (bounded-cardinality groups, the keyword-map
    contract). A row's copy count depends only on its own (id, group) —
    re-shardable and incremental-safe like every sampler here."""
    _require_numeric_id(df, id_col, "epoch_upsample")
    for g, w in weights.items():
        if w < 0:
            raise ValueError(f"epoch_upsample: weight {w} for {g!r} < 0")
    if default_weight < 0:
        raise ValueError("epoch_upsample: default_weight < 0")

    base_expr: Column = F.lit(epoch_weight_parts(default_weight)[0])
    thr_expr: Column = F.lit(epoch_weight_parts(default_weight)[1])
    for g, w in sorted(weights.items()):
        b, t = epoch_weight_parts(w)
        base_expr = F.when(F.col(group_col) == g, F.lit(b)).otherwise(
            base_expr
        )
        thr_expr = F.when(F.col(group_col) == g, F.lit(t)).otherwise(
            thr_expr
        )
    copies = base_expr + F.when(
        mix_bucket(id_col) < thr_expr, F.lit(1)
    ).otherwise(F.lit(0))
    # sequence(0, -1) would generate a DESCENDING [0, -1] — guard the
    # zero-copy case to an empty array (explode drops the row)
    seq = F.when(copies >= 1, F.sequence(F.lit(0), copies - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(epoch_out, F.explode(seq))


def quantile_gate(
    df: DataFrame,
    score_col: str,
    group_col: str,
    keep_frac: float = 0.5,
    lower_is_better: bool = False,
) -> DataFrame:
    """Keep the best ``keep_frac`` of each group BY SCORE QUANTILE —
    the adaptive-threshold quality gate (CCNet buckets documents by
    reference-LM perplexity PER LANGUAGE precisely because one global
    cutoff over-prunes low-resource groups; same for per-source quality
    gates): a row survives when its percent_rank within the group
    reaches 1 − keep_frac. By default HIGHER scores are better; pass
    ``lower_is_better=True`` for loss-like scores (perplexity).

    Cross-engine determinism: the boundary test is pure INTEGER
    arithmetic — with r = rank() (ties share a rank; a boundary tie
    group survives or falls TOGETHER) and n the group size, keep ⟺
    (r − 1) · 10⁴ ≥ thr · (n − 1) where thr = the integer
    ten-thousandths of (1 − keep_frac) (round-then-floor, the
    temperature_sample rule) — no float division ever happens, so the
    oracle's RANK()/COUNT() comparison is identical bit-for-bit.
    Singleton groups (n = 1) always survive (percent_rank 0 ≥ thr·0).

    One window shuffle on the group key (the sample_per_group profile;
    group skew → the dedup_keep_first salt discussion). A GLOBAL gate
    (group_col spanning the corpus) is the single-partition-window
    trap — use a constant group only at toy scale, or rank globally
    via :func:`shuffle_rank`'s two-level machinery."""
    import math

    if not 0 < keep_frac <= 1:
        raise ValueError(f"quantile_gate: keep_frac={keep_frac}")
    thr = math.floor(round((1 - keep_frac) * 10_000, 4))
    order = (F.desc(score_col) if lower_is_better
             else F.asc(score_col))
    w = Window.partitionBy(group_col).orderBy(order)
    wn = Window.partitionBy(group_col)
    return (
        df.withColumn("__r", F.rank().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .filter(
            (F.col("__r") - 1) * 10_000 >= F.lit(thr) * (F.col("__n") - 1)
        )
        .drop("__r", "__n")
    )


def holdout_split(
    df: DataFrame,
    fracs: Mapping[str, float] | None = None,
    *,
    id_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — the ablation-split
    primitive: every row gets a split label from its id-derived mix
    bucket, so the SAME rows land in the SAME split across runs,
    engines, re-shardings, and registry growth (what makes eval
    numbers comparable between experiments, and what keeps a val doc
    from silently migrating into train when the corpus is rebuilt).

    ``fracs`` maps label → fraction (default 98/1/1 train/val/test);
    fractions are converted ONCE to integer ten-thousandth boundaries
    (round-then-floor, the temperature_sample rule) and the per-row
    work is one LCG mix + a CASE over integer compares — pure
    projection, zero shuffle, fuses into the scan. Labels are assigned
    in SORTED label order so the mapping is reproducible from the dict
    alone. Fractions must sum to 1 within 1e-9 (every row gets exactly
    one label; no silent dropped remainder).

    Split-by-ID means exact duplicates under DIFFERENT ids can straddle
    splits — run the dedup stages first (the recipe order) or key the
    split on a content fingerprint column cast to long via ``id_col``.
    """
    if fracs is None:
        fracs = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not fracs:
        raise ValueError("holdout_split: fracs must be non-empty")
    total = sum(float(v) for v in fracs.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"holdout_split: fractions sum to {total!r}, not 1.0 — every "
            "row must get exactly one label"
        )
    _require_numeric_id(df, id_col, "holdout_split")
    bounds = holdout_bounds(fracs)
    bucket = mix_bucket(id_col)
    expr: Column | None = None
    for label, hi in bounds:
        cond = bucket < hi
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    # the last boundary is exactly 10000, so every bucket matches; the
    # otherwise() is unreachable but keeps the Column total
    assert expr is not None
    return df.withColumn(out_col, expr.otherwise(bounds[-1][0]))


def holdout_bounds(fracs: Mapping[str, float]) -> list[tuple[str, int]]:
    """(label, exclusive upper bucket bound) in sorted-label order —
    ONE source of truth shared by the Column builder and the SQL
    oracle renderer. The final bound is pinned to exactly 10000 so
    rounding can never orphan the last bucket."""
    labels = sorted(fracs)
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    for i, label in enumerate(labels):
        acc += float(fracs[label])
        hi = 10_000 if i == len(labels) - 1 else int(round(acc * 10_000))
        bounds.append((label, hi))
    return bounds


def holdout_split_sql(id_expr: str, fracs: Mapping[str, float]) -> str:
    """Oracle-side rendering of :func:`holdout_split` (same bounds,
    same mixer)."""
    b = mix_bucket_sql(id_expr)
    cases = " ".join(
        f"WHEN {b} < {hi} THEN '{label}'"
        for label, hi in holdout_bounds(fracs)
    )
    last = holdout_bounds(fracs)[-1][0]
    return f"CASE {cases} ELSE '{last}' END"
