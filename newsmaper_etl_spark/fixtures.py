"""Reference-domain fixtures (FIXTURES.md §B) — single source of truth.

The literals below are used twice: (a) turned into Spark DataFrames for
the engine side, (b) rendered into DuckDB ``VALUES`` clauses for the
oracle side of ``q_newsmaper_e2e``. Everything is deterministic literal
data; edge rows exercise the SURVEY.md §2.11 ledger (L1–L7, L9).

The dictionary/articles are freshly authored (NOT copied from the
reference's data files); ids mirror the reference's *shape* — non-dense
country ids, default id 1 — per FIXTURES.md B3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# --- B1: sources -----------------------------------------------------------
SOURCES = [
    (i, f"outlet{i}", f"https://outlet{i}.example", f"https://outlet{i}.example/rss")
    for i in range(1, 11)
]

# --- B3: keyword dictionary (non-dense ids; mixed-case + shared keywords) --
# L2: 'europe' appears under ids 44 and 2 → lowest id (2) must win.
# L4: 'Roma' (mixed case) can never match a lowercased token in oracle mode.
REFERENCES = [
    (2, "germany", ["germany", "berlin", "europe"]),
    (3, "italy", ["italy", "Roma", "milan"]),
    (7, "spain", ["spain", "madrid"]),
    (44, "uk", ["uk", "london", "europe"]),
    (45, "usa", ["usa", "washington"]),
    (46, "japan", ["japan", "tokyo"]),
]

# --- B2: in-flight articles (edge rows per FIXTURES.md) --------------------
# (article_id, id_source, title, link, description, media, date_str)
# Wall-clock semantics (L9): the hour in the *string* is the hour used.
ARTICLES = [
    # plain keyword hit → germany (id 2); tz-offset date branch
    (1, 1, "berlin summit opens", "https://a/1", "germany economy in focus",
     "https://img/1", "Mon, 02 Jan 2023 15:04:05 +0100"),
    # no keyword at all → default country id 1 (L1); 'null' media (L6)
    (2, 2, "local sports roundup", "https://a/2", "weekend results inside",
     "null", "Mon, 02 Jan 2023 16:04:05 GMT"),
    # tie: one 'spain' vote vs one 'uk' vote → lowest id wins (7) (L3)
    (3, 3, "spain and uk talks", "https://a/3", "trade border",
     "null", "Tue, 03 Jan 23 09:30:00 +0000"),
    # token hygiene (L4): ',' ';' "'" → space so 'madrid' matches;
    # 'roma.' keeps its dot and 'Roma' is mixed-case → italy never matches
    (4, 4, "madrid,update;l'agenda", "https://a/4", "roma. visit planned",
     "https://img/4", "Wed, 04 Jan 2023 08:00:00 +0200"),
    # duplicate of an existing news row key → dropped by anti-join (L7)
    (5, 1, "berlin summit opens", "https://a/5", "duplicate wire copy",
     "null", "Mon, 02 Jan 2023 15:04:05 +0100"),
    # in-batch duplicate pair: BOTH pass the append filter (the reference
    # only checks against the target — Load.py:22; repair is a separate
    # maintenance op, dedup_keep_first)
    (6, 5, "tokyo exchange note", "https://a/6", "japan markets",
     "null", "Thu, 05 Jan 2023 11:00:00 GMT"),
    (7, 5, "tokyo exchange note", "https://a/7", "japan markets again",
     "null", "Thu, 05 Jan 2023 11:00:00 GMT"),
]

# --- B4: date dim (hour grain, surrogate id = yyyymmddhh) ------------------
# Complete over the articles' wall-clock hours; the L5 miss test uses
# date_dim_missing (drops the last row) in tests/test_newsmaper.py.
_DIM_HOURS = [
    (2023, 1, 2, 15),
    (2023, 1, 2, 16),
    (2023, 1, 3, 9),
    (2023, 1, 4, 8),
    (2023, 1, 5, 11),
]
DATE_DIM = [
    (y * 1000000 + m * 10000 + d * 100 + h, h, d, m, y) for (y, m, d, h) in _DIM_HOURS
]

# --- B6: pre-existing news rows -------------------------------------------
# (id, id_country, id_source, id_date, title, link, description, media)
# Row 1 collides with article 1/5's key (id_source=1, id_date of
# 2023-01-02T15, same title). Rows 2+3 are an internal dup group on the
# key → keep-first must keep id 2.
NEWS_EXISTING = [
    (1, 2, 1, 2023010215, "berlin summit opens", "https://old/1", "old copy", "null"),
    (2, 1, 9, 2023010216, "evening brief", "https://old/2", "old brief", "null"),
    (3, 7, 9, 2023010216, "evening brief", "https://old/3", "older brief", "null"),
]


# --------------------------------------------------------------------------
# Spark-side constructors
#
# Deliberately built as SQL VALUES (LocalRelation), NOT spark.createDataFrame
# over Python lists: the pickle path launches one Python worker per task to
# deserialize rows, and on this rig a cold Python worker boots in 10-15s —
# a literal table must never touch a Python worker. LocalRelation stays
# entirely JVM-side and broadcast-folds into whatever joins consume it.
# --------------------------------------------------------------------------

def _spark_lit(v) -> str:
    if v is None:
        return "CAST(NULL AS STRING)"
    if isinstance(v, str):
        # backslashes first: Spark SQL literals process backslash escapes
        # (escapedStringLiterals=false default) while the DuckDB _lit side
        # is literal — unescaped they'd silently diverge (ADVICE r1)
        return "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"
    if isinstance(v, list):
        return "array(" + ", ".join(_spark_lit(x) for x in v) + ")"
    return str(v)


def values_df(spark: SparkSession, rows: list[tuple], cols: list[str]) -> DataFrame:
    body = ", ".join("(" + ", ".join(_spark_lit(v) for v in row) + ")" for row in rows)
    return spark.sql(f"SELECT * FROM VALUES {body} AS t({', '.join(cols)})")


def sources_df(spark: SparkSession) -> DataFrame:
    return values_df(spark, SOURCES, ["id", "name", "website", "rss"])


def references_df(spark: SparkSession) -> DataFrame:
    return values_df(spark, REFERENCES, ["id", "name", "words"])


def articles_df(spark: SparkSession) -> DataFrame:
    return values_df(
        spark,
        ARTICLES,
        ["article_id", "id_source", "title", "link", "description", "media", "date"],
    )


def date_dim_df(spark: SparkSession, drop_last: bool = False) -> DataFrame:
    rows = DATE_DIM[:-1] if drop_last else DATE_DIM
    return values_df(spark, rows, ["id", "hours", "day", "month", "year"])


def news_existing_df(spark: SparkSession) -> DataFrame:
    return values_df(
        spark,
        NEWS_EXISTING,
        ["id", "id_country", "id_source", "id_date", "title", "link", "description", "media"],
    )


# --------------------------------------------------------------------------
# DuckDB-side VALUES rendering (for the e2e oracle SQL)
# --------------------------------------------------------------------------

def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def values_clause(rows: list[tuple], cols: list[str]) -> str:
    """Render rows as ``(SELECT * FROM (VALUES ...) t(c1, c2, ...))``."""
    body = ", ".join("(" + ", ".join(_lit(v) for v in row) + ")" for row in rows)
    return f"(SELECT * FROM (VALUES {body}) t({', '.join(cols)}))"


def flat_reference_rows() -> list[tuple]:
    """(ref_id, kw) pairs — the pre-explode form for the oracle."""
    return [(rid, w) for rid, _name, words in REFERENCES for w in words]
