"""Corpus curation: the standard LLM training-data recipe as ONE lazy
plan over the extension operators.

    raw documents
      → quality gate      (pure expressions — evaluates in the scan stage)
      → exact dedup       (one hash window on text)
      → near-dup removal  (MinHash-LSH → verify → connected components)
      → span dedup        (optional r11: repeated ≥k-token spans excised)
      → annotate          (language, token stats, BPE budget, fingerprint)

Order matters at scale: the quality gate is shuffle-free so it runs
FIRST and shrinks every downstream shuffle; exact dedup (cheap, one
shuffle) runs before the sketch pass so MinHash never pays for byte
-identical copies; annotation is projection-only so it rides the final
stage for free.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newsmaper_etl_spark.operators import dedup as D
from newsmaper_etl_spark.operators import text as TX


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.8,
    minhash_kwargs: dict | None = None,
    salt: int | None = None,
    near_dup: bool = True,
    span_dedup_k: int | None = None,
    html_extract: bool = False,
    paragraph_dedup_sep: str | None = None,
    url_col: str | None = None,
    url_blocklist: DataFrame | Iterable[str] | None = None,
    domain_cap: int | None = None,
    url_dedup: bool = False,
    domain_gate_kwargs: dict | None = None,
    quantile_keep_frac: float | None = None,
    quantile_group_col: str = "source",
    classifier_weights=None,
    classifier_kwargs: dict | None = None,
    dsir_weights=None,
    dsir_k: int | None = None,
    dsir_seed: int = 0,
    dsir_missing: float = 0.0,
    tokenizer_merges=None,
    tokenizer_byte_level: bool = False,
) -> DataFrame:
    """Returns the curated corpus: quality-gated, exactly and
    near-deduplicated, annotated with language / token stats / BPE
    estimate / fingerprint. Lazy end to end (the only driver actions are
    inside the connected-components strategy pick).

    ``near_dup=False`` skips the MinHash stage, leaving the fully
    deterministic sub-pipeline (gate → exact dedup → annotate) — the
    hash-checkable slice of the recipe (q_curate_exact); the sketch
    stage stays rows-only by nature.

    ``paragraph_dedup_sep`` (r12) adds the PARAGRAPH stage between
    near-dedup and the span stage — coarse→fine: whole repeated
    paragraphs (:func:`~newsmaper_etl_spark.operators.dedup.
    paragraph_dedup`) are cheap per-doc hash cuts that shrink what the
    per-token span pass must gram.

    ``span_dedup_k`` (r11) adds the SUBSTRING-span stage between
    near-dedup and annotation — repeated ≥k-token spans excised with
    first occurrence kept (:func:`~newsmaper_etl_spark.operators.dedup.
    remove_duplicate_spans`), the Lee-et-al pass that catches the
    boilerplate doc-level dedup can't. It runs LAST of the dedup stages
    (cheapest corpus: whole-doc drops already happened) and the
    annotations are computed over the EDITED text — token counts, BPE
    budget, and fingerprints must describe what a loader will read.

    ``url_col`` + ``url_blocklist`` / ``domain_cap`` (r13) add the
    URL/domain stage FIRST — before even extraction — because it is
    the cheapest gate in the recipe (one projection + one broadcast
    anti-join + at most one window) and every row it drops skips every
    regex, hash and shuffle downstream; C4/RefinedWeb/FineWeb all
    order it this way. ``url_dedup=True`` (r13) additionally collapses
    canonical-URL duplicates (keep-first; NULL-key rows all kept)
    BEFORE content hashing — two fetches of one page with different
    tracking params/scheme/param order never reach the exact-dedup
    stage's text hash.

    ``domain_gate_kwargs`` (r14) adds the DOMAIN-LEVEL aggregate gate
    (:func:`~newsmaper_etl_spark.operators.web.domain_gate` —
    min_docs/max_docs/min_sum_tokens thresholds) as the LAST step of
    the URL stage: it needs the whole stage's survivor set to compute
    honest per-domain stats, and it still runs before extraction so a
    dropped domain skips every regex downstream. ``quantile_keep_frac``
    (r14) adds the per-group ADAPTIVE quality gate
    (:func:`~newsmaper_etl_spark.operators.sampling.quantile_gate`,
    CCNet-style: keep the best fraction of each ``quantile_group_col``
    BY the just-computed quality score) right after the absolute
    ``min_quality`` floor — the floor kills junk, the quantile evens
    the mix across groups. NULL-handling matches the sibling
    contracts throughout: blocklist keeps unparseable rows, url_dedup
    keeps NULL-key rows, domain_cap runs ``null_domains='keep'``
    (ADVICE r13: the operator default would cap every unparseable row
    corpus-wide into one k-group), domain_gate keeps NULL domains.
    ``salt=`` now reaches every skew-prone keep-first window: exact
    dedup, url_dedup, AND the paragraph stage (VERDICT r13 wiring
    gap — the hardened forms existed but the recipe couldn't request
    them).

    ``classifier_weights`` (r14) adds the MODEL-quality gate
    (:func:`~newsmaper_etl_spark.operators.selection.classifier_gate`,
    the FineWeb-Edu/GPT-3-style "looks like the target corpus"
    filter) right after the rule-based quality stages — rules kill
    junk cheaply, the classifier arbitrates what rules can't see;
    ``classifier_kwargs`` forwards bias/threshold/missing/hashed.
    ``dsir_weights`` + ``dsir_k`` (r14) add DSIR importance
    RESAMPLING (:func:`~newsmaper_etl_spark.operators.selection.
    dsir_select`) as the LAST corpus edit, after every dedup stage
    (resampling first would let duplicates compete for the budget) and
    before annotation (annotate only what ships).

    ``tokenizer_merges`` (r15) annotates each surviving document with
    its TRUE model token count ``n_tok_model`` (:func:`~newsmaper_etl_
    spark.operators.text.bpe_merge_tokenize` — merge-rank order, over
    the EDITED text like every other annotation; ``tokenizer_byte_
    level=True`` for byte-level tables from ``bpe_train(byte_level=
    True)``). The ``n_bpe`` estimate column stays — it is free and its
    delta against the real count is itself a data-quality signal —
    but budget_select/pack_sequences should consume ``n_tok_model``
    when a trained tokenizer is available (the estimate is ±25%, a
    real mis-mix at training time)."""
    if url_col is not None and (
        url_blocklist is not None or domain_cap or url_dedup
        or domain_gate_kwargs
    ):
        from newsmaper_etl_spark.operators import web as W

        # derive the registered domain ONCE for the whole URL stage —
        # letting each sub-stage re-derive it via url_col= would run
        # the PSL projection 3x per row, and every downstream consumer
        # would re-evaluate it again under AQE
        docs = docs.withColumn(
            "__rdom", W.domain_col(W.host_col(url_col))
        )
        if url_blocklist is not None:
            docs = W.domain_blocklist_filter(
                docs, url_blocklist, domain_col_name="__rdom"
            )
        if url_dedup:
            docs = W.url_dedup(
                docs, url_col, id_col=id_col, salt=salt
            ).drop("url_canon")
        if domain_cap:
            docs = W.cap_per_domain(
                docs, int(domain_cap), domain_col_name="__rdom",
                id_col=id_col, null_domains="keep",
            )
        if domain_gate_kwargs:
            # the gate consumes its input twice (stats + probe);
            # materialize the URL-stage survivors so the blocklist/
            # dedup/cap work above runs once, not per consumer
            docs = docs.localCheckpoint(eager=False)
            docs = W.domain_gate(
                docs, domain_col_name="__rdom", **domain_gate_kwargs
            )
        docs = docs.drop("__rdom")
    if html_extract:
        # extraction runs FIRST — every downstream signal (quality,
        # dedup keys, shingles, token stats) must see the visible text,
        # not markup; a tag-laden page would otherwise dodge exact
        # dedup against its clean twin and drag quality down on markup
        # punctuation
        docs = (
            TX.html_extract(docs, text_col, out="__clean")
            .drop(text_col)
            .withColumnRenamed("__clean", text_col)
        )
    gated = TX.quality_score(docs, text_col).filter(
        f"quality >= {float(min_quality)}"
    )
    if quantile_keep_frac is not None:
        from newsmaper_etl_spark.operators.sampling import quantile_gate

        gated = quantile_gate(
            gated, "quality", quantile_group_col,
            keep_frac=float(quantile_keep_frac),
        )
    if classifier_weights is not None:
        from newsmaper_etl_spark.operators.selection import classifier_gate

        gated = classifier_gate(
            gated, classifier_weights, text_col=text_col, id_col=id_col,
            score_col=None, **(classifier_kwargs or {}),
        )
    exact = D.exact_dedup(gated, [text_col], id_col=id_col, salt=salt)
    if near_dup:
        near = D.minhash_dedup(
            exact,
            id_col=id_col,
            text_col=text_col,
            threshold=near_dup_threshold,
            **(minhash_kwargs or {}),
        )
    else:
        near = exact
    if paragraph_dedup_sep:
        # paragraph stage BEFORE span excision (coarse→fine: doc-level
        # drops happened, whole repeated paragraphs are cheap per-doc
        # hash cuts, the span stage's per-token gram pass then only
        # sees what survives). Checkpoint for the same multi-reference
        # reason as the span stage below.
        near = near.localCheckpoint(eager=False)
        paras = D.paragraph_dedup(
            near, id_col, text_col, sep=paragraph_dedup_sep, salt=salt
        )
        near = near.drop(text_col).join(
            paras.select(
                F.col(id_col), F.col("text_dedup").alias(text_col)
            ).dropDuplicates([id_col]),
            on=id_col,
        )
    if span_dedup_k:
        # materialize before the span stage: remove_duplicate_spans
        # references its input four times (grams twice, toks, base) and
        # the join-back makes five — unmaterialized, each reference
        # re-runs the gate + both dedup stages (the same multiplier the
        # incremental recipe's exact checkpoint documents; code review
        # r11)
        near = near.localCheckpoint(eager=False)
        spans = D.remove_duplicate_spans(
            near, id_col, text_col, k=int(span_dedup_k)
        )
        near = near.drop(text_col).join(
            spans.select(
                F.col(id_col), F.col("text_dedup").alias(text_col)
            ).dropDuplicates([id_col]),
            on=id_col,
        )
    if dsir_weights is not None and dsir_k is not None:
        from newsmaper_etl_spark.operators.selection import (
            dsir_log_weights,
            dsir_select,
        )

        scored = dsir_log_weights(
            near, dsir_weights, text_col=text_col, id_col=id_col,
            missing=dsir_missing, out_col="__logw",
        )
        near = dsir_select(
            scored, int(dsir_k), logw_col="__logw", id_col=id_col,
            seed=dsir_seed,
        ).drop("__logw")
    annotated = TX.token_stats(
        TX.fingerprint(TX.token_count_bpe(TX.language_id(near, text_col), text_col), text_col),
        text_col,
    )
    if tokenizer_merges is not None:
        annotated = TX.bpe_merge_tokenize(
            annotated, tokenizer_merges, col=text_col,
            out="n_tok_model", byte_level=tokenizer_byte_level,
        )
    return annotated


def curate_corpus_incremental(
    new_docs: DataFrame,
    seen_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.8,
    minhash_kwargs: dict | None = None,
    near_dup: bool = True,
    within_batch_near_dup: bool = True,
    seen_banded: DataFrame | None = None,
    seen_keys: DataFrame | None = None,
    checkpoint: bool = True,
    span_dedup_k: int | None = None,
    seen_grams: DataFrame | None = None,
    html_extract: bool = False,
    paragraph_dedup_sep: str | None = None,
    seen_paras: DataFrame | None = None,
    url_col: str | None = None,
    url_blocklist: DataFrame | Iterable[str] | None = None,
) -> DataFrame:
    """The NIGHTLY-pipeline shape of :func:`curate_corpus`: curate
    tonight's batch against the already-ingested corpus instead of
    re-curating 100 TB from scratch. Stage order mirrors the full
    recipe, with each dedup stage swapped for its batch-vs-corpus
    incremental form:

        batch → quality gate                    (shuffle-free, runs first)
              → incremental exact dedup         (anti-join vs corpus keys
                                                 + within-batch keep-first)
              → incremental MinHash near-dedup  (batch band keys ⋈ corpus
                                                 band keys + within-batch)
              → annotate

    ``seen_docs`` is the corpus frame (used for key derivation and the
    verify stage's candidate text fetch). At scale a deployment passes
    the two PERSISTED index frames instead of re-deriving them per
    batch: ``seen_keys`` — the distinct hashed-key frame
    (:func:`~newsmaper_etl_spark.operators.dedup.incremental_exact_dedup`'s
    ``seen_df`` reduced to ``__hk1/__hk2``; the streaming sink maintains
    exactly this as the ``_keys`` side table) — and ``seen_banded`` —
    the :func:`~newsmaper_etl_spark.operators.dedup.banded_signatures`
    frame (the ``_banded`` side table). Per-batch cost then scales with
    the batch and its bucket-mates, never with the corpus.

    The batch is assumed fresh (not yet in the corpus); the corpus is
    assumed curated (its internal duplicates were resolved when IT was
    ingested), which is what makes gate-then-dedup equal to curating
    the union and keeping only new ids.

    ``checkpoint=True`` (default) localCheckpoints the exact-stage
    survivors before the MinHash stage: that stage references its batch
    side THREE times (signature pass, verify-side shingle fetch, final
    anti-join), and without materialization each reference re-runs the
    quality gate and the corpus-key anti-join — 3x the batch pipeline
    at any scale. The frame is batch-scaled, never corpus-scaled, the
    same bound as the operator's own candidate checkpoint.

    ``span_dedup_k`` (r11) adds the incremental SUBSTRING-span stage
    after the near-dedup survivors: batch spans the corpus already
    holds are excised via
    :func:`~newsmaper_etl_spark.operators.dedup.
    incremental_remove_duplicate_spans` — pass ``seen_grams`` (the
    persisted ``_grams`` side table / :func:`~newsmaper_etl_spark.
    operators.dedup.corpus_gram_index` frame) to keep the stage
    index-sized; without it the corpus is re-grammed from
    ``seen_docs``. Annotations describe the EDITED text.

    ``paragraph_dedup_sep`` (r12) adds the incremental PARAGRAPH stage
    between near-dedup and span excision (coarse→fine) — pass
    ``seen_paras`` (the persisted
    :func:`~newsmaper_etl_spark.operators.dedup.corpus_paragraph_index`
    frame, the ``_paras`` side table) to keep it index-sized.

    ``html_extract`` (r12) runs extraction over the BATCH before the
    gate, mirroring the full recipe — the corpus side is assumed
    already extracted (it was curated by this same recipe when IT was
    ingested), so only tonight's batch pays the pass.

    ``url_col`` + ``url_blocklist`` (r13) run the URL/domain blocklist
    over the batch FIRST, mirroring the full recipe (cheapest gate;
    no per-domain cap here — a cap is a CORPUS-level invariant that an
    independent batch can't enforce, use the maintenance-path full
    recipe for re-capping)."""
    if url_col is not None and url_blocklist is not None:
        from newsmaper_etl_spark.operators import web as W

        new_docs = W.domain_blocklist_filter(
            new_docs, url_blocklist, url_col=url_col
        )
    if html_extract:
        new_docs = (
            TX.html_extract(new_docs, text_col, out="__clean")
            .drop(text_col)
            .withColumnRenamed("__clean", text_col)
        )
    gated = TX.quality_score(new_docs, text_col).filter(
        f"quality >= {float(min_quality)}"
    )
    if seen_keys is not None:
        from newsmaper_etl_spark.keyindex import anti_join_index

        exact = D.exact_dedup(
            anti_join_index(gated, [text_col], seen_keys),
            [text_col], id_col=id_col, hash_keys=True,
        )
    else:
        exact = D.incremental_exact_dedup(
            gated, seen_docs.select(text_col), [text_col], id_col=id_col,
            hash_keys=True, within_batch=True,
        )
    if near_dup and checkpoint:
        exact = exact.localCheckpoint(eager=False)
    if near_dup:
        near = D.incremental_minhash_dedup(
            exact,
            seen_docs.select(id_col, text_col),
            id_col=id_col,
            text_col=text_col,
            threshold=near_dup_threshold,
            within_batch=within_batch_near_dup,
            seen_banded=seen_banded,
            **(minhash_kwargs or {}),
        )
    else:
        near = exact
    if paragraph_dedup_sep:
        if checkpoint:
            near = near.localCheckpoint(eager=False)
        paras = D.incremental_paragraph_dedup(
            near,
            None if seen_paras is not None else seen_docs.select(
                id_col, text_col
            ),
            id_col, text_col, sep=paragraph_dedup_sep,
            seen_paras=seen_paras,
        )
        near = near.drop(text_col).join(
            paras.select(
                F.col(id_col), F.col("text_dedup").alias(text_col)
            ).dropDuplicates([id_col]),
            on=id_col,
        )
    if span_dedup_k:
        if checkpoint:
            # same five-reference multiplier as curate_corpus's span
            # stage (code review r11)
            near = near.localCheckpoint(eager=False)
        spans = D.incremental_remove_duplicate_spans(
            near,
            None if seen_grams is not None else seen_docs.select(
                id_col, text_col
            ),
            id_col, text_col, k=int(span_dedup_k), seen_grams=seen_grams,
        )
        near = near.drop(text_col).join(
            spans.select(
                F.col(id_col), F.col("text_dedup").alias(text_col)
            ).dropDuplicates([id_col]),
            on=id_col,
        )
    return TX.token_stats(
        TX.fingerprint(
            TX.token_count_bpe(TX.language_id(near, text_col), text_col),
            text_col,
        ),
        text_col,
    )
