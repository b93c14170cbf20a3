"""Corpus curation: the standard LLM training-data recipe as ONE lazy
plan over the extension operators.

    raw documents
      → quality gate      (pure expressions — evaluates in the scan stage)
      → exact dedup       (one hash window on text)
      → near-dup removal  (MinHash-LSH → verify → connected components)
      → annotate          (language, token stats, BPE budget, fingerprint)

Order matters at scale: the quality gate is shuffle-free so it runs
FIRST and shrinks every downstream shuffle; exact dedup (cheap, one
shuffle) runs before the sketch pass so MinHash never pays for byte
-identical copies; annotation is projection-only so it rides the final
stage for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

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
) -> DataFrame:
    """Returns the curated corpus: quality-gated, exactly and
    near-deduplicated, annotated with language / token stats / BPE
    estimate / fingerprint. Lazy end to end (the only driver actions are
    inside the connected-components strategy pick).

    ``near_dup=False`` skips the MinHash stage, leaving the fully
    deterministic sub-pipeline (gate → exact dedup → annotate) — the
    hash-checkable slice of the recipe (q_curate_exact); the sketch
    stage stays rows-only by nature."""
    gated = TX.quality_score(docs, text_col).filter(
        f"quality >= {float(min_quality)}"
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
    annotated = TX.token_stats(
        TX.fingerprint(TX.token_count_bpe(TX.language_id(near, text_col), text_col), text_col),
        text_col,
    )
    return annotated
