"""q_newsmaper_e2e — the whole reference pipeline, golden-checked.

Spark side: ``operators.newsmaper.run_pipeline`` over the FIXTURES.md §B
data. Oracle side: a DuckDB SQL program implementing ledger L1–L7/L9
exactly, over the SAME literals (rendered as VALUES by fixtures.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from newsmaper_etl_spark import fixtures as FX
from newsmaper_etl_spark.operators.newsmaper import run_pipeline
from newsmaper_etl_spark.registry import query


def _e2e_oracle() -> str:
    articles = FX.values_clause(
        FX.ARTICLES,
        ["aid", "id_source", "title", "link", "description", "media", "date_str"],
    )
    refs = FX.values_clause(FX.flat_reference_rows(), ["ref_id", "kw"])
    date_dim = FX.values_clause(FX.DATE_DIM, ["id", "hours", "day", "month", "year"])
    news_existing = FX.values_clause(
        FX.NEWS_EXISTING,
        ["id", "id_country", "id_source", "id_date", "title", "link", "description", "media"],
    )
    # Wall-clock parse (L9): strip the tz token, then 4-digit-year format
    # first, 2-digit fallback (the reference's %Y is fixed-width-4, so a
    # 2-digit year never binds to the first branch — guard with a regex).
    return f"""
WITH articles AS {articles},
refs AS {refs},
refsmin AS (SELECT kw, MIN(ref_id) AS ref_id FROM refs GROUP BY kw),
date_dim AS {date_dim},
news_existing AS {news_existing},
parsed AS (
    SELECT *,
        CASE WHEN regexp_matches(stripped, '[0-9]{{4}} [0-9]{{2}}:')
             THEN try_strptime(stripped, '%a, %d %b %Y %H:%M:%S')
             -- Spark's 'yy' pivots EVERY 2-digit year into 2000-2099
             -- (the pinned L9 choice, property-tested); DuckDB's %y maps
             -- 69-99 to 1969-1999, so shift those forward a century
             WHEN EXTRACT(YEAR FROM try_strptime(
                      stripped, '%a, %d %b %y %H:%M:%S')) < 2000
             THEN try_strptime(stripped, '%a, %d %b %y %H:%M:%S')
                  + INTERVAL 100 YEAR
             ELSE try_strptime(stripped, '%a, %d %b %y %H:%M:%S')
        END AS pub_ts
    FROM (
        SELECT *, regexp_replace(
            date_str, '\\s+(\\+|-)[0-9]{{4}}$|\\s+[A-Za-z]{{2,5}}$', ''
        ) AS stripped
        FROM articles
    )
),
dated AS (
    SELECT p.*, d.id AS id_date
    FROM parsed p
    JOIN date_dim d
      ON d.hours = EXTRACT(HOUR FROM p.pub_ts)
     AND d.day   = EXTRACT(DAY FROM p.pub_ts)
     AND d.month = EXTRACT(MONTH FROM p.pub_ts)
     AND d.year  = EXTRACT(YEAR FROM p.pub_ts)
),
tokens AS (
    SELECT aid,
           unnest(string_split(
               lower(replace(replace(replace(title || ' ' || description,
                   ',', ' '), ';', ' '), '''', ' ')), ' ')) AS word
    FROM dated
),
votes AS (
    SELECT t.aid, r.ref_id, COUNT(*) AS cnt
    FROM tokens t JOIN refsmin r ON t.word = r.kw
    GROUP BY t.aid, r.ref_id
),
winners AS (
    SELECT aid, ref_id FROM (
        SELECT aid, ref_id,
               ROW_NUMBER() OVER (PARTITION BY aid ORDER BY cnt DESC, ref_id ASC) AS rn
        FROM votes
    ) WHERE rn = 1
),
tagged AS (
    SELECT d.*, CAST(COALESCE(w.ref_id, 1) AS INTEGER) AS id_country
    FROM dated d LEFT JOIN winners w USING (aid)
)
SELECT id_country, id_source, id_date, title, link, description, media
FROM tagged t
WHERE NOT EXISTS (
    SELECT 1 FROM news_existing e
    WHERE e.id_source IS NOT DISTINCT FROM t.id_source
      AND e.id_date IS NOT DISTINCT FROM t.id_date
      AND e.title IS NOT DISTINCT FROM t.title
)
"""


@query("q_newsmaper_e2e", oracle=_e2e_oracle(), tags=("E2E", "L1-L7", "L9"))
def q_newsmaper_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline over fixtures; sf_dir unused (fixture-driven).

    ``check_misses=False`` for the DECLARED query only: the oracle's
    inner date join silently drops an unparseable/dim-missing article,
    so the comparison must filter, not abort — a miss would otherwise
    crash the Spark side while the oracle returns the surviving rows
    (opposite semantics, no diff report). The pipeline's production
    default stays fail-fast (L5, raise_error)."""
    return run_pipeline(
        articles=FX.articles_df(spark),
        references=FX.references_df(spark),
        date_dim=FX.date_dim_df(spark),
        news_existing=FX.news_existing_df(spark),
        check_misses=False,
    )
