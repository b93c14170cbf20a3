"""SQL-surface registration for the extension operators — the "thin SQL
registration layer" of SURVEY §7.0 (VERDICT r05 'do this' #7).

Two tiers, matching what each operator IS:

- **Scalar operators** (the text-analysis family) register as Spark SQL
  *SQL-body* functions (``CREATE TEMPORARY FUNCTION … RETURN <expr>``,
  Spark 4's SQL UDFs): the body is the SAME pure-expression logic the
  DataFrame operators build, so a ``spark.sql`` user gets identical
  values, full whole-stage codegen, and ZERO Python in the per-row path
  — these are not Python UDFs wearing a SQL name.
- **Pipeline operators** (multi-stage plans: joins, shuffles, iterative
  CC — ``tag_country``, ``minhash_dedup``, ``curate_corpus``) cannot be
  a scalar expression; :func:`register_sql_pipelines` exposes them the
  way Spark itself exposes multi-stage procedures: a named entry point
  that runs the DataFrame pipeline over a registered VIEW and registers
  the result as a view, after which everything is plain ``spark.sql``.

Values are kept bit-identical to the DataFrame operators (same
floor-scaling, same tie-breaks); ``tests/test_sql_functions.py`` pins
SQL-vs-DataFrame parity per function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from newsmaper_etl_spark.operators.text import STOPWORDS, _ALL_STOPWORDS


def _sql_array(words: tuple[str, ...]) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in words) + ")"


#: name -> (parameter list, return type, SQL body). The bodies mirror
#: operators/text.py expression-for-expression (floor-scaling instead of
#: ROUND, pinned argmax tie-break) — see each operator's docstring for
#: the semantics rationale.
def _scalar_defs() -> dict[str, tuple[str, str, str]]:
    stop_all = _sql_array(_ALL_STOPWORDS)
    toks = "split(t, ' ', -1)"
    lang_scores = ", ".join(
        "named_struct('neg', CAST(-size(filter(split(t, ' ', -1), "
        f"w -> array_contains({_sql_array(STOPWORDS[lang])}, w))) AS INT), "
        f"'lang', '{lang}')"
        for lang in sorted(STOPWORDS)
    )
    return {
        "n_tokens": (
            "t STRING", "BIGINT",
            f"CAST(size({toks}) AS BIGINT)",
        ),
        "quality_score": (
            "t STRING", "DOUBLE",
            # length band * 0.4 + punct density * 0.3 + stopword ratio * 0.3,
            # floor-scaled to 4 digits exactly like operators/text.py
            "floor(10000 * ("
            "  (CASE WHEN length(t) >= 20 AND length(t) <= 10000"
            "        THEN 1.0 ELSE 0.3 END) * 0.4"
            "  + (CASE WHEN (CASE WHEN length(t) > 0 THEN"
            "       (length(t) - length(translate(t, '.,;:!?\\'\"', '')))"
            "       / length(t) ELSE 0.0 END) <= 0.2"
            "     THEN 1.0 ELSE 0.5 END) * 0.3"
            f"  + least((CASE WHEN size({toks}) > 0 THEN"
            f"       size(filter({toks}, w -> array_contains({stop_all}, w)))"
            f"       / size({toks}) ELSE 0.0 END) * 3, 1.0) * 0.3"
            ")) / 10000",
        ),
        "lang_id": (
            "t STRING", "STRING",
            # argmax via sort_array over (neg count, lang) structs — the
            # pinned (count DESC, lang ASC) tie-break; no hit -> 'und'
            f"CASE WHEN -sort_array(array({lang_scores}), true)[0].neg > 0"
            f" THEN sort_array(array({lang_scores}), true)[0].lang"
            " ELSE 'und' END",
        ),
        "n_bpe": (
            "t STRING", "BIGINT",
            f"aggregate({toks}, 0L,"
            " (acc, w) -> acc + CAST(ceil(length(w) / 4.0) AS LONG))",
        ),
        "doc_fingerprint": (
            "t STRING", "BIGINT",
            f"aggregate(zip_with(sequence(1, size({toks})), {toks},"
            " (i, w) -> CAST(i AS LONG)"
            " * (ascii(substring(w, 1, 1)) + 131 * length(w))),"
            " 0L, (a, x) -> a + x)",
        ),
    }


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the scalar extension functions for ``spark.sql`` use.

    After this, ``SELECT quality_score(text), lang_id(text) FROM docs``
    runs entirely JVM-side with values bit-identical to the DataFrame
    operators. Temporary functions are session-scoped (re-register per
    session — the same lifetime as temp views). Returns the registered
    names."""
    names = []
    for name, (params, rtype, body) in _scalar_defs().items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
            f"RETURNS {rtype} RETURN {body}"
        )
        names.append(name)
    return names


#: Pipeline registry: name -> callable(spark, input_view, **params) -> DataFrame.
def _pipelines() -> dict:
    from newsmaper_etl_spark.operators.curate import curate_corpus
    from newsmaper_etl_spark.operators.dedup import (
        contamination_check,
        exact_dedup,
        incremental_exact_dedup,
        incremental_minhash_dedup,
        incremental_remove_duplicate_spans,
        minhash_dedup,
        minhash_dup_clusters,
        redact_contaminated_spans,
        remove_duplicate_spans,
        simhash_near_pairs,
    )
    from newsmaper_etl_spark.operators.newsmaper import tag_country
    from newsmaper_etl_spark.operators.sampling import temperature_sample

    def _minhash(spark: SparkSession, view: str, **kw) -> DataFrame:
        return minhash_dedup(spark.table(view), **kw)

    def _exact(spark: SparkSession, view: str, **kw) -> DataFrame:
        return exact_dedup(spark.table(view), **kw)

    def _simhash_pairs(spark: SparkSession, view: str, **kw) -> DataFrame:
        return simhash_near_pairs(spark.table(view), **kw)

    def _curate(spark: SparkSession, view: str, **kw) -> DataFrame:
        return curate_corpus(spark.table(view), **kw)

    def _contamination(spark: SparkSession, view: str, **kw) -> DataFrame:
        # the eval/benchmark set is a VIEW name too
        eval_view = kw.pop("eval_view")
        return contamination_check(
            spark.table(view), spark.table(eval_view), **kw
        )

    def _tag_country(spark: SparkSession, view: str, **kw) -> DataFrame:
        # the keyword dictionary is itself a VIEW name (SQL-facing
        # callers live in view-space); resolve it before the operator
        refs = kw.pop("references_view")
        return tag_country(spark.table(view), spark.table(refs), **kw)

    def _inc_exact(spark: SparkSession, view: str, **kw) -> DataFrame:
        # the ingested corpus is a VIEW name (seen_view), like the
        # contamination eval side
        seen = kw.pop("seen_view")
        return incremental_exact_dedup(
            spark.table(view), spark.table(seen), **kw
        )

    def _inc_minhash(spark: SparkSession, view: str, **kw) -> DataFrame:
        seen = kw.pop("seen_view")
        banded = kw.pop("seen_banded_view", None)
        if banded is not None:
            kw["seen_banded"] = spark.table(banded)
        return incremental_minhash_dedup(
            spark.table(view), spark.table(seen), **kw
        )

    def _curate_inc(spark: SparkSession, view: str, **kw) -> DataFrame:
        # nightly shape: corpus and (optionally) its persisted index
        # frames arrive as view names, like every seen_* seam here
        from newsmaper_etl_spark.operators.curate import (
            curate_corpus_incremental,
        )

        seen = kw.pop("seen_view")
        for param, vkey in (
            ("seen_banded", "seen_banded_view"),
            ("seen_keys", "seen_keys_view"),
            ("seen_grams", "seen_grams_view"),
            ("seen_paras", "seen_paras_view"),
        ):
            v = kw.pop(vkey, None)
            if v is not None:
                kw[param] = spark.table(v)
        return curate_corpus_incremental(
            spark.table(view), spark.table(seen), **kw
        )

    def _substring(spark: SparkSession, view: str, **kw) -> DataFrame:
        return remove_duplicate_spans(spark.table(view), **kw)

    def _inc_substring(spark: SparkSession, view: str, **kw) -> DataFrame:
        seen = kw.pop("seen_view", None)
        grams = kw.pop("seen_grams_view", None)
        if grams is not None:
            kw["seen_grams"] = spark.table(grams)
        return incremental_remove_duplicate_spans(
            spark.table(view),
            spark.table(seen) if seen is not None else None, **kw
        )

    def _redact(spark: SparkSession, view: str, **kw) -> DataFrame:
        eval_view = kw.pop("eval_view")
        return redact_contaminated_spans(
            spark.table(view), spark.table(eval_view), **kw
        )

    def _clusters(spark: SparkSession, view: str, **kw) -> DataFrame:
        return minhash_dup_clusters(spark.table(view), **kw)

    def _temperature(spark: SparkSession, view: str, **kw) -> DataFrame:
        return temperature_sample(spark.table(view), **kw)

    def _paragraph(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.dedup import paragraph_dedup

        return paragraph_dedup(spark.table(view), **kw)

    def _inc_paragraph(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.dedup import (
            incremental_paragraph_dedup,
        )

        seen = kw.pop("seen_view", None)
        paras = kw.pop("seen_paras_view", None)
        if paras is not None:
            kw["seen_paras"] = spark.table(paras)
        return incremental_paragraph_dedup(
            spark.table(view),
            spark.table(seen) if seen is not None else None, **kw
        )

    def _html(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.text import html_extract

        return html_extract(spark.table(view), **kw)

    def _budget(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.sampling import budget_select

        return budget_select(spark.table(view), **kw)

    def _shuffle(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.sampling import shuffle_rank

        return shuffle_rank(spark.table(view), **kw)

    def _bpe(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.text import bpe_tokenize

        return bpe_tokenize(spark.table(view), kw.pop("vocab"), **kw)

    def _url_parts(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.web import url_parts

        return url_parts(spark.table(view), **kw)

    def _domain_filter(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.web import (
            domain_blocklist_filter,
        )

        bl_view = kw.pop("blocklist_view", None)
        bl = spark.table(bl_view) if bl_view is not None \
            else kw.pop("blocklist")
        return domain_blocklist_filter(spark.table(view), bl, **kw)

    def _domain_cap(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.web import cap_per_domain

        return cap_per_domain(spark.table(view), kw.pop("k"), **kw)

    def _url_dedup(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.web import url_dedup

        return url_dedup(spark.table(view), **kw)

    def _domain_stats(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.web import domain_stats

        return domain_stats(spark.table(view), **kw)

    def _domain_gate(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.web import domain_gate

        return domain_gate(spark.table(view), **kw)

    def _qgate(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.sampling import quantile_gate

        return quantile_gate(
            spark.table(view), kw.pop("score_col"), kw.pop("group_col"),
            **kw,
        )

    def _epoch(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.sampling import epoch_upsample

        return epoch_upsample(
            spark.table(view), kw.pop("weights"), kw.pop("group_col"), **kw
        )

    def _kmeans_assign(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.clustering import kmeans_assign

        c_view = kw.pop("centers_view", None)
        centers = (
            spark.table(c_view) if c_view is not None else kw.pop("centers")
        )
        return kmeans_assign(spark.table(view), centers, **kw)

    def _kmeans_fit(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.clustering import (
            kmeans_centers_df,
            kmeans_fit,
        )

        centers = kmeans_fit(spark.table(view), kw.pop("k"), **kw)
        return kmeans_centers_df(spark, centers)

    def _cluster_balanced(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.clustering import (
            cluster_balanced_sample,
        )

        c_view = kw.pop("centers_view", None)
        centers = (
            spark.table(c_view) if c_view is not None else kw.pop("centers")
        )
        return cluster_balanced_sample(
            spark.table(view), centers, kw.pop("per_cluster"), **kw
        )

    def _holdout(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.sampling import holdout_split

        return holdout_split(spark.table(view), kw.pop("fracs", None), **kw)

    def _bpe_train(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.text import bpe_train

        merges = bpe_train(spark.table(view), **kw)
        return spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(merges)],
            "rank int, lhs string, rhs string",
        )

    def _dsir_weights(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.selection import dsir_log_weights

        w_view = kw.pop("weights_view", None)
        w = spark.table(w_view) if w_view is not None else kw.pop("weights")
        return dsir_log_weights(spark.table(view), w, **kw)

    def _dsir_select(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.selection import dsir_select

        return dsir_select(spark.table(view), kw.pop("k"), **kw)

    def _classifier(spark: SparkSession, view: str, **kw) -> DataFrame:
        from newsmaper_etl_spark.operators.selection import classifier_gate

        w_view = kw.pop("weights_view", None)
        w = spark.table(w_view) if w_view is not None else kw.pop("weights")
        return classifier_gate(spark.table(view), w, **kw)

    return {
        "minhash_dedup": _minhash,
        "exact_dedup": _exact,
        "simhash_near_pairs": _simhash_pairs,
        "curate_corpus": _curate,
        "contamination_check": _contamination,
        "tag_country": _tag_country,
        "incremental_exact_dedup": _inc_exact,
        "incremental_minhash_dedup": _inc_minhash,
        "curate_corpus_incremental": _curate_inc,
        "substring_dedup": _substring,
        "substring_dedup_incremental": _inc_substring,
        "redact_contaminated_spans": _redact,
        "minhash_dup_clusters": _clusters,
        "temperature_sample": _temperature,
        "paragraph_dedup": _paragraph,
        "paragraph_dedup_incremental": _inc_paragraph,
        "html_extract": _html,
        "budget_select": _budget,
        "shuffle_rank": _shuffle,
        "url_parts": _url_parts,
        "domain_blocklist_filter": _domain_filter,
        "cap_per_domain": _domain_cap,
        "url_dedup": _url_dedup,
        "domain_stats": _domain_stats,
        "domain_gate": _domain_gate,
        "epoch_upsample": _epoch,
        "quantile_gate": _qgate,
        "bpe_tokenize": _bpe,
        "bpe_train": _bpe_train,
        "holdout_split": _holdout,
        "kmeans_assign": _kmeans_assign,
        "kmeans_fit": _kmeans_fit,
        "cluster_balanced_sample": _cluster_balanced,
        "dsir_log_weights": _dsir_weights,
        "dsir_select": _dsir_select,
        "classifier_gate": _classifier,
    }


def run_sql_pipeline(
    spark: SparkSession, name: str, input_view: str, output_view: str, **params
) -> DataFrame:
    """Run a registered multi-stage pipeline over ``input_view`` and
    publish the result as ``output_view`` — the SQL-facing form of the
    operators that are whole PLANS (joins/shuffles/iteration), which no
    scalar SQL function can express. The result view is lazy: Catalyst
    plans it exactly as the DataFrame call, and downstream ``spark.sql``
    composes with it freely:

        run_sql_pipeline(spark, "minhash_dedup", "documents", "docs_dd",
                         threshold=0.8)
        spark.sql("SELECT source, COUNT(*) FROM docs_dd GROUP BY source")
    """
    pipes = _pipelines()
    if name not in pipes:
        raise ValueError(
            f"unknown pipeline {name!r}; available: {sorted(pipes)}"
        )
    out = pipes[name](spark, input_view, **params)
    out.createOrReplaceTempView(output_view)
    return out
