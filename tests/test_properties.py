"""Property-based tests (SURVEY §5.2 item 4): semantics that must hold
for ALL inputs, not just fixtures — tie-break determinism under row
shuffling, tagger equivalence, keep-first stability, RFC-822 round-trip.

hypothesis settings: derandomized (stable CI), few examples (each example
runs a real Spark job on a VALUES relation — small but not free).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from newsmaper_etl_spark.fixtures import values_df
from newsmaper_etl_spark.operators.newsmaper import (
    dedup_keep_first,
    parse_pubdate,
    tag_country,
    tag_country_expr,
    tokenize_text,
)

_SETTINGS = dict(max_examples=8, deadline=None, derandomize=True)

_VOCAB = ["paris", "madrid", "berlin", "roma", "tokyo", "lyon", "kyoto", "x", "y"]
_KW_TO_ID = {"paris": 1, "madrid": 7, "berlin": 3, "roma": 2, "tokyo": 9}
_REFS = [
    (1, "fr", ["paris"]),
    (7, "es", ["madrid"]),
    (3, "de", ["berlin"]),
    (2, "it", ["roma"]),
    (9, "jp", ["tokyo"]),
]

_texts = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=6,
)


@settings(**_SETTINGS)
@given(texts=_texts, seed=st.integers(0, 2**16))
def test_tagger_order_invariant_and_equivalent(spark, texts, seed):
    """Both taggers agree with each other AND are invariant under input
    row permutation (L3's pinned tie-break makes the vote a pure function
    of the multiset of tokens)."""
    import random

    rows = [(i, t, "", "") for i, t in enumerate(texts)]
    shuffled = list(rows)
    random.Random(seed).shuffle(shuffled)

    def tag(rs, mode):
        df = tokenize_text(
            values_df(spark, rs, ["article_id", "title", "description", "x"]),
            cols=("title", "description"),
        )
        if mode == "expr":
            out = tag_country_expr(df, _KW_TO_ID)
        else:
            out = tag_country(df, values_df(spark, _REFS, ["id", "name", "words"]))
        return sorted((r["article_id"], r["id_country"]) for r in out.collect())

    base = tag(rows, "expr")
    assert tag(shuffled, "expr") == base
    assert tag(shuffled, "join") == base


@settings(**_SETTINGS)
@given(
    keys=st.lists(st.integers(0, 3), min_size=1, max_size=12),
    seed=st.integers(0, 2**16),
)
def test_dedup_keep_first_order_invariant(spark, keys, seed):
    """Survivors depend only on (key, id) content — never on row order or
    partitioning (L7: lowest id per key)."""
    import random

    rows = [(i, k) for i, k in enumerate(keys)]
    shuffled = list(rows)
    random.Random(seed).shuffle(shuffled)
    expected = sorted(
        min((i for i, k in rows if k == key)) for key in set(keys)
    )
    for rs in (rows, shuffled):
        df = values_df(spark, rs, ["id", "k"])
        got = sorted(r["id"] for r in dedup_keep_first(df, ("k",), "id").collect())
        assert got == expected


@settings(**_SETTINGS)
@given(
    ts=st.datetimes(
        min_value=datetime(1990, 1, 1), max_value=datetime(2035, 12, 28)
    ).map(lambda d: d.replace(microsecond=0)),  # RFC-822 has second grain
    offset_minutes=st.sampled_from([-600, -60, 0, 60, 330, 600]),
)
def test_pubdate_roundtrip_all_variants(spark, ts, offset_minutes):
    """All three RFC-822 shapes (4-digit +0000, named zone, 2-digit year)
    parse back to the printed wall clock in oracle mode; strict mode
    applies the numeric offset (L9)."""
    tz = timezone(timedelta(minutes=offset_minutes))
    aware = ts.replace(tzinfo=tz)
    variants = [
        aware.strftime("%a, %d %b %Y %H:%M:%S %z"),
        ts.strftime("%a, %d %b %Y %H:%M:%S GMT"),
        aware.strftime("%a, %d %b %y %H:%M:%S %z"),
    ]
    df = values_df(spark, [(i, v) for i, v in enumerate(variants)], ["i", "date"])
    oracle = {r["i"]: r["pub_ts"] for r in parse_pubdate(df).collect()}
    # oracle mode: printed wall clock, tz token ignored (L9)
    for i in range(3):
        got = oracle[i]
        assert (got.year % 100, got.month, got.day, got.hour, got.minute) == (
            ts.year % 100, ts.month, ts.day, ts.hour, ts.minute,
        ), variants[i]
    # 2-digit year: Spark's 'yy' pivots into 2000-2099
    assert oracle[2].year == 2000 + ts.year % 100
    # strict mode normalizes variant 0 to UTC
    strict = {r["i"]: r["pub_ts"] for r in parse_pubdate(df, strict=True).collect()}
    expect_utc = aware.astimezone(timezone.utc).replace(tzinfo=None)
    assert strict[0] == expect_utc


@given(
    vectors=st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=7, max_size=7,
        ),
        min_size=2, max_size=6,
    )
)
@settings(**_SETTINGS)
def test_tree_dot_matches_hof_dot_after_rounding(spark, vectors):
    """The balanced-tree unrolled dot (codegen SQL path) must agree with
    the sequential HOF dot after the round-before-compare convention —
    the property that licenses the re-association in
    operators/similarity._tree (module invariant 3)."""
    from newsmaper_etl_spark.operators import similarity as S
    rows = [(i, vectors[i], vectors[(i + 1) % len(vectors)]) for i in range(len(vectors))]
    df = spark.createDataFrame(rows, "i INT, a ARRAY<FLOAT>, b ARRAY<FLOAT>")
    out = df.select(
        F.round(F.expr(S._dot_sql("a", "b", 7)), 4).alias("tree"),
        F.round(S._dot(F.col("a"), F.col("b")), 4).alias("hof"),
    ).collect()
    for r in out:
        assert r["tree"] == r["hof"], (r["tree"], r["hof"])
