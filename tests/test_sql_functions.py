"""SQL-surface registration (SURVEY §7.0 'thin SQL registration layer'):
scalar SQL-body functions must be callable from spark.sql with values
bit-identical to the DataFrame operators, with zero Python in the plan;
pipeline operators run over views and publish views."""

from __future__ import annotations

from newsmaper_etl_spark.fixtures import values_df
from newsmaper_etl_spark.sql_functions import (
    register_sql_functions,
    run_sql_pipeline,
)

_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (2, "le chat est sur la table et le chien est dans le jardin aussi"),
    (3, "!!!"),
    (4, "der hund und die katze sind ein gutes team in dem haus"),
    (5, "the quick brown fox jumps over the lazy dog and runs away fast"),
]


def _docs(spark):
    return values_df(spark, _DOCS, ["doc_id", "text"])


def test_scalar_sql_functions_match_dataframe_operators(spark):
    from newsmaper_etl_spark.operators import text as TX

    names = register_sql_functions(spark)
    assert set(names) >= {"quality_score", "lang_id", "n_bpe",
                          "n_tokens", "doc_fingerprint"}
    _docs(spark).createOrReplaceTempView("sqlfn_docs")
    got = {
        r["doc_id"]: r
        for r in spark.sql(
            "SELECT doc_id, n_tokens(text) AS nt, quality_score(text) AS q, "
            "lang_id(text) AS lang, n_bpe(text) AS nb, "
            "doc_fingerprint(text) AS fp FROM sqlfn_docs"
        ).collect()
    }
    df = TX.fingerprint(
        TX.token_count_bpe(
            TX.language_id(TX.quality_score(TX.token_stats(_docs(spark)))),
        )
    )
    want = {r["doc_id"]: r for r in df.collect()}
    for i in want:
        assert got[i]["nt"] == want[i]["n_tokens"]
        assert got[i]["q"] == want[i]["quality"]
        assert got[i]["lang"] == want[i]["lang_pred"]
        assert got[i]["nb"] == want[i]["n_bpe"]
        assert got[i]["fp"] == want[i]["fp"]


def test_scalar_sql_functions_stay_jvm_side(spark):
    register_sql_functions(spark)
    _docs(spark).createOrReplaceTempView("sqlfn_docs2")
    plan = (
        spark.sql("SELECT quality_score(text) q, lang_id(text) l FROM sqlfn_docs2")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan and "PythonUDF" not in plan


def test_pipeline_over_views(spark):
    import pytest

    _docs(spark).createOrReplaceTempView("sqlfn_docs3")
    out = run_sql_pipeline(
        spark, "minhash_dedup", "sqlfn_docs3", "sqlfn_docs3_dd", threshold=0.9
    )
    # doc 5 is an exact copy of doc 1 -> dropped; composes with plain SQL
    ids = sorted(
        r["doc_id"]
        for r in spark.sql("SELECT doc_id FROM sqlfn_docs3_dd").collect()
    )
    assert ids == [1, 2, 3, 4]
    assert sorted(r["doc_id"] for r in out.collect()) == ids
    with pytest.raises(ValueError, match="unknown pipeline"):
        run_sql_pipeline(spark, "nope", "sqlfn_docs3", "x")


def test_pipeline_tag_country_over_views(spark):
    """The reference's country tagger through the SQL pipeline surface:
    the keyword dictionary is itself a view (references_view), resolved
    inside the pipeline wrapper; its output matches the DataFrame call."""
    import pytest as _pytest

    from newsmaper_etl_spark import fixtures as FX
    from newsmaper_etl_spark.operators.newsmaper import (
        tag_country,
        tokenize_text,
    )

    arts = tokenize_text(FX.articles_df(spark))
    refs = FX.references_df(spark)
    arts.createOrReplaceTempView("sqlfn_articles")
    refs.createOrReplaceTempView("sqlfn_refs")
    out = run_sql_pipeline(
        spark, "tag_country", "sqlfn_articles", "sqlfn_tagged",
        references_view="sqlfn_refs", row_key="article_id",
    )
    via_sql = sorted(
        (r["article_id"], r["id_country"])
        for r in spark.sql(
            "SELECT article_id, id_country FROM sqlfn_tagged"
        ).collect()
    )
    direct = sorted(
        (r["article_id"], r["id_country"])
        for r in tag_country(arts, refs, row_key="article_id")
        .select("article_id", "id_country").collect()
    )
    assert via_sql == direct and via_sql
    with _pytest.raises(Exception):
        # missing references_view is a loud error, not a silent default
        run_sql_pipeline(spark, "tag_country", "sqlfn_articles", "out_x")


def test_more_pipelines_over_views(spark):
    """exact_dedup / simhash_near_pairs / contamination_check through
    the pipeline surface, composing with plain SQL afterwards."""
    _docs(spark).createOrReplaceTempView("sqlfn_docs4")
    out = run_sql_pipeline(
        spark, "exact_dedup", "sqlfn_docs4", "sqlfn_docs4_dd",
        cols=["text"], id_col="doc_id",
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 3, 4]
    pairs = run_sql_pipeline(
        spark, "simhash_near_pairs", "sqlfn_docs4", "sqlfn_pairs",
        id_col="doc_id", text_col="text", max_hamming=0, checkpoint=False,
    )
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {(1, 5)}
    # contamination: eval set = doc 1's first tokens under a fresh id
    spark.sql(
        "SELECT doc_id + 100 AS doc_id, text FROM sqlfn_docs4 WHERE doc_id = 1"
    ).createOrReplaceTempView("sqlfn_eval")
    hits = run_sql_pipeline(
        spark, "contamination_check", "sqlfn_docs4", "sqlfn_hits",
        eval_view="sqlfn_eval", n=8,
    )
    flagged = {r["id"] for r in spark.sql("SELECT id FROM sqlfn_hits").collect()}
    assert flagged == {1, 5}  # both copies of the contaminated text


def test_incremental_pipelines_over_views(spark):
    """incremental_exact_dedup / incremental_minhash_dedup through the
    pipeline surface: the ingested corpus (and optionally its persisted
    band keys) arrive as VIEW names, like contamination's eval side."""
    from newsmaper_etl_spark.fixtures import values_df
    from newsmaper_etl_spark.operators.dedup import banded_signatures

    values_df(
        spark, [(1, "alpha beta gamma delta"), (2, "unrelated corpus doc")],
        ["doc_id", "text"],
    ).createOrReplaceTempView("sqlfn_seen")
    values_df(
        spark,
        [(10, "alpha beta gamma delta"), (11, "fresh new batch text")],
        ["doc_id", "text"],
    ).createOrReplaceTempView("sqlfn_newb")
    out = run_sql_pipeline(
        spark, "incremental_exact_dedup", "sqlfn_newb", "sqlfn_inc1",
        seen_view="sqlfn_seen", cols=["text"],
    )
    assert [r["doc_id"] for r in out.collect()] == [11]
    banded_signatures(
        spark.table("sqlfn_seen"), "doc_id", "text"
    ).createOrReplaceTempView("sqlfn_seen_bands")
    out2 = run_sql_pipeline(
        spark, "incremental_minhash_dedup", "sqlfn_newb", "sqlfn_inc2",
        seen_view="sqlfn_seen", seen_banded_view="sqlfn_seen_bands",
        threshold=1.0,
    )
    assert [r["doc_id"] for r in out2.collect()] == [11]


def test_run_sql_pipeline_r11_surfaces(spark):
    """The r11 operators are reachable from view-space: substring dedup
    (full + incremental through the seen_grams seam), span redaction,
    cluster export, and temperature sampling each run over temp views
    and agree with their DataFrame forms."""
    from newsmaper_etl_spark.operators import dedup as D
    from newsmaper_etl_spark.operators import sampling as SP
    from newsmaper_etl_spark.sql_functions import run_sql_pipeline

    span = " ".join(f"w{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, span + " a b"), (2, span), (3, "clean doc " + " ".join(f"c{i}" for i in range(6)))],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("__r11_docs")
    out = run_sql_pipeline(spark, "substring_dedup", "__r11_docs", "__o1", k=8)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, D.remove_duplicate_spans(docs, k=8).collect())
    )

    seen = spark.createDataFrame([(0, span)], "doc_id long, text string")
    seen.createOrReplaceTempView("__r11_seen")
    grams = D.corpus_gram_index(seen, k=8)
    grams.createOrReplaceTempView("__r11_grams")
    out = run_sql_pipeline(
        spark, "substring_dedup_incremental", "__r11_docs", "__o2",
        seen_grams_view="__r11_grams", k=8,
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple,
        D.incremental_remove_duplicate_spans(
            docs, None, k=8, seen_grams=grams).collect()))

    ev = spark.createDataFrame([(100, span)], "doc_id long, text string")
    ev.createOrReplaceTempView("__r11_eval")
    out = run_sql_pipeline(
        spark, "redact_contaminated_spans", "__r11_docs", "__o3",
        eval_view="__r11_eval", n=8,
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple,
        D.redact_contaminated_spans(docs, ev, n=8).collect()))

    out = run_sql_pipeline(
        spark, "minhash_dup_clusters", "__r11_docs", "__o4",
        threshold=1.0, num_hashes=8, bands=2,
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple,
        D.minhash_dup_clusters(
            docs, threshold=1.0, num_hashes=8, bands=2).collect()))

    langs = spark.createDataFrame(
        [(i, "en" if i < 80 else "sw") for i in range(100)],
        "doc_id long, lang string",
    )
    langs.createOrReplaceTempView("__r11_langs")
    out = run_sql_pipeline(
        spark, "temperature_sample", "__r11_langs", "__o5",
        group_col="lang", alpha=0.5, budget_frac=0.5,
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in SP.temperature_sample(
            langs, "lang", alpha=0.5, budget_frac=0.5).collect())


def test_r12_pipelines_over_views(spark):
    """The r12 operators through the SQL-registration surface:
    paragraph dedup (batch + incremental with a persisted-index view),
    html extraction, budget selection, shuffle rank — all resolve views
    and pass params like their DataFrame forms."""
    from newsmaper_etl_spark.operators.dedup import corpus_paragraph_index

    docs = spark.createDataFrame(
        [(1, "shared para\n\nalpha", "s1", 3),
         (2, "shared para\n\nbeta", "s1", 3),
         (3, "<p>hi &amp; bye</p>", "s2", 4)],
        "doc_id long, text string, source string, n long",
    )
    docs.createOrReplaceTempView("r12_docs")
    out = run_sql_pipeline(spark, "paragraph_dedup", "r12_docs", "r12_pd")
    got = {r["doc_id"]: r["text_dedup"] for r in out.collect()}
    assert got[2] == "beta"

    corpus_paragraph_index(
        docs.filter("doc_id = 1")
    ).createOrReplaceTempView("r12_paras")
    batch = spark.createDataFrame(
        [(10, "shared para\n\nnew one")], "doc_id long, text string"
    )
    batch.createOrReplaceTempView("r12_batch")
    inc = run_sql_pipeline(
        spark, "paragraph_dedup_incremental", "r12_batch", "r12_pi",
        seen_paras_view="r12_paras",
    )
    assert inc.collect()[0]["text_dedup"] == "new one"

    html = run_sql_pipeline(spark, "html_extract", "r12_docs", "r12_he")
    got = {r["doc_id"]: r["text_clean"] for r in html.collect()}
    assert got[3] == "hi & bye"

    sel = run_sql_pipeline(
        spark, "budget_select", "r12_docs", "r12_bs",
        tokens_col="n", budget=6, group_col="source",
    )
    assert 1 <= sel.count() <= 3

    rk = run_sql_pipeline(spark, "shuffle_rank", "r12_docs", "r12_sr")
    assert sorted(r["rank"] for r in rk.collect()) == [1, 2, 3]
    # composed view-space SQL over a published pipeline view
    n = spark.sql("SELECT COUNT(*) AS c FROM r12_sr").collect()[0]["c"]
    assert n == 3


def test_r13_web_pipelines_over_views(spark):
    """The r13 URL/domain operators through the SQL-registration
    surface: url_parts annotation, blocklist filter (inline list AND
    blocklist view), per-domain cap."""
    docs = spark.createDataFrame(
        [(1, "https://a.example.com/x"),
         (2, "https://b.blocked.net/y"),
         (3, "https://c.example.com/z"),
         (4, "https://d.example.com/w"),
         (5, "not a url at all://")],
        "doc_id long, url string",
    )
    docs.createOrReplaceTempView("r13_urls")
    parts = run_sql_pipeline(spark, "url_parts", "r13_urls", "r13_up")
    got = {r["doc_id"]: r["domain"] for r in parts.collect()}
    assert got[1] == "example.com" and got[2] == "blocked.net"

    filt = run_sql_pipeline(
        spark, "domain_blocklist_filter", "r13_urls", "r13_bl",
        url_col="url", blocklist=["blocked.net"],
    )
    assert sorted(r["doc_id"] for r in filt.collect()) == [1, 3, 4, 5]

    spark.createDataFrame(
        [("blocked.net",)], "domain string"
    ).createOrReplaceTempView("r13_blview")
    filt2 = run_sql_pipeline(
        spark, "domain_blocklist_filter", "r13_up", "r13_bl2",
        blocklist_view="r13_blview",
    )
    assert sorted(r["doc_id"] for r in filt2.collect()) == [1, 3, 4, 5]

    cap = run_sql_pipeline(
        spark, "cap_per_domain", "r13_urls", "r13_cap",
        k=2, url_col="url",
    )
    kept = [r["doc_id"] for r in cap.collect()]
    assert len([d for d in kept if d in (1, 3, 4)]) == 2 and 2 in kept


def test_r13_bpe_pipeline_over_views(spark):
    """bpe_tokenize through the SQL-registration surface."""
    spark.createDataFrame(
        [(1, "table scan"), (2, "zz")], "doc_id long, text string"
    ).createOrReplaceTempView("r13_bpe_docs")
    out = run_sql_pipeline(
        spark, "bpe_tokenize", "r13_bpe_docs", "r13_bpe",
        vocab=["table", "scan"],
    )
    got = {r["doc_id"]: r["n_tok"] for r in out.collect()}
    assert got == {1: 2, 2: 2}


def test_r13_url_dedup_pipeline_over_views(spark):
    """url_dedup through the SQL-registration surface."""
    spark.createDataFrame(
        [(1, "https://www.p.io/x?utm_source=a"),
         (2, "http://p.io/x/"),
         (3, "https://q.io/y")],
        "doc_id long, url string",
    ).createOrReplaceTempView("r13_ud")
    out = run_sql_pipeline(spark, "url_dedup", "r13_ud", "r13_ud_out")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


def test_r13_domain_and_epoch_pipelines_over_views(spark):
    """domain_stats / domain_gate / epoch_upsample through the SQL
    surface."""
    spark.createDataFrame(
        [(i, "https://big.com/" + str(i)) for i in range(3)]
        + [(9, "https://tiny.org/x")],
        "doc_id long, url string",
    ).createOrReplaceTempView("r13_dom")
    st = run_sql_pipeline(spark, "domain_stats", "r13_dom", "r13_ds",
                          url_col="url")
    assert {r["domain"]: r["n_docs"] for r in st.collect()} == {
        "big.com": 3, "tiny.org": 1}
    gt = run_sql_pipeline(spark, "domain_gate", "r13_dom", "r13_dg",
                          url_col="url", min_docs=2)
    assert sorted(r["doc_id"] for r in gt.collect()) == [0, 1, 2]
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, source string"
    ).createOrReplaceTempView("r13_ep")
    ep = run_sql_pipeline(spark, "epoch_upsample", "r13_ep", "r13_ep_out",
                          weights={"a": 2.0, "b": 0.0}, group_col="source")
    assert sorted((r["doc_id"], r["epoch"]) for r in ep.collect()) == [
        (1, 0), (1, 1)]


def test_r13_quantile_gate_pipeline_over_views(spark):
    spark.createDataFrame(
        [(i, "g", i) for i in range(10)], "doc_id long, src string, s long"
    ).createOrReplaceTempView("r13_qg")
    out = run_sql_pipeline(spark, "quantile_gate", "r13_qg", "r13_qg_out",
                           score_col="s", group_col="src", keep_frac=0.2)
    assert sorted(r["doc_id"] for r in out.collect()) == [8, 9]


def test_r14_selection_pipelines_over_views(spark):
    """dsir_log_weights / dsir_select / classifier_gate through the
    SQL-registration surface, weights both inline and as a view."""
    spark.createDataFrame(
        [(1, "spark query"), (2, "slow slow"), (3, "spark spark")],
        "doc_id long, text string",
    ).createOrReplaceTempView("r14_docs")
    w = {"spark": 0.5, "query": 0.25, "slow": -0.5}
    out = run_sql_pipeline(
        spark, "dsir_log_weights", "r14_docs", "r14_w", weights=w,
    )
    got = {r["doc_id"]: r["logw"] for r in out.collect()}
    assert got == {1: 0.75, 2: -1.0, 3: 1.0}
    sel = run_sql_pipeline(
        spark, "dsir_select", "r14_w", "r14_sel", k=2, seed=1,
    )
    assert sorted(r["doc_id"] for r in sel.collect()) == [1, 3]
    spark.createDataFrame(
        list(w.items()), "token string, logw double"
    ).createOrReplaceTempView("r14_wt")
    gate = run_sql_pipeline(
        spark, "classifier_gate", "r14_docs", "r14_gate",
        weights_view="r14_wt",
    )
    assert sorted(r["doc_id"] for r in gate.collect()) == [1, 3]


def test_r14_clustering_pipelines_over_views(spark):
    """kmeans_fit / kmeans_assign / cluster_balanced_sample through the
    SQL-registration surface."""
    rows = [(i, [10.0 if i % 2 == 0 else 0.0, 0.0 if i % 2 == 0 else 10.0])
            for i in range(20)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).createOrReplaceTempView("r14_vecs")
    cents = run_sql_pipeline(
        spark, "kmeans_fit", "r14_vecs", "r14_cents", k=2, iters=2,
        init_ids=[0, 1],
    )
    assert sorted(r["cluster"] for r in cents.collect()) == [0, 1]
    assigned = run_sql_pipeline(
        spark, "kmeans_assign", "r14_vecs", "r14_asg",
        centers_view="r14_cents",
    )
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert all(c == (0 if i % 2 == 0 else 1) for i, c in got.items())
    bal = run_sql_pipeline(
        spark, "cluster_balanced_sample", "r14_vecs", "r14_bal",
        centers=[[10.0, 0.0], [0.0, 10.0]], per_cluster=3,
        id_col="vec_id",
    )
    from collections import Counter

    assert Counter(r["cluster"] for r in bal.collect()) == {0: 3, 1: 3}


def test_r14_bpe_train_pipeline_over_views(spark):
    spark.createDataFrame(
        [(1, "xy xy xy")], "doc_id long, text string"
    ).createOrReplaceTempView("r14_tr")
    out = run_sql_pipeline(
        spark, "bpe_train", "r14_tr", "r14_merges", n_merges=3,
    )
    assert [(r["rank"], r["lhs"], r["rhs"]) for r in out.collect()] == [
        (0, "x", "y")
    ]
