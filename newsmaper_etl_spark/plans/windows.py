"""Window functions, sorts, limits, top-k.

Covers SURVEY.md §2.5 (ranking/analytic/frame windows) and §2.6
(order/limit/top-k). The reference has no window functions; its closest
behavior (keep-first dedup, Main.py:39-42) is covered in aggregates.py.

Scale notes: each window shuffles once on its partition key; top-k global
uses orderBy+limit which Spark plans as TakeOrderedAndProject (per-partition
heaps + driver merge of k rows — no full sort). Per-group top-k ranks inside
the partition; with a heavy-hitter key, pre-aggregate or salt first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newsmaper_etl_spark.io import load_table
from newsmaper_etl_spark.registry import query

def _li_order():
    return (F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))


@query(
    "q_window_rank",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROW_NUMBER() OVER w AS rn,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk
        FROM lineitem
        WINDOW w AS (
            PARTITION BY l_returnflag
            ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        )
    """,
    tags=("W",),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(*_li_order())
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "q_window_lag_lead",
    oracle="""
        SELECT event_id,
               LAG(value)  OVER w AS lag_v,
               LEAD(value) OVER w AS lead_v
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    tags=("W",),
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return ev.select(
        "event_id",
        F.lag("value").over(w).alias("lag_v"),
        F.lead("value").over(w).alias("lead_v"),
    )


@query(
    "q_window_frame_sum",
    oracle="""
        SELECT event_id,
               ROUND(SUM(value) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS run_sum
        FROM events
    """,
    tags=("W",),
)
def q_window_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum over an explicit ROWS frame. The total order inside the
    partition makes the left-to-right double summation deterministic in
    both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", F.round(F.sum("value").over(w), 2).alias("run_sum")
    )


@query(
    "q_order_limit",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """,
    tags=("SORT",),
)
def q_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans orderBy+limit as TakeOrderedAndProject —
    no full sort at any scale. Tie-broken by key → deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q_topk_per_group",
    oracle="""
        SELECT l_returnflag, l_orderkey, l_linenumber, rn
        FROM (
            SELECT l_returnflag, l_orderkey, l_linenumber,
                   ROW_NUMBER() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
                   ) AS rn
            FROM lineitem
        ) WHERE rn <= 3
    """,
    tags=("SORT", "W"),
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per return flag via SALTED two-phase ranking.

    l_returnflag has 3 values — a single row_number window over it
    serializes the whole fact table into 3 tasks (5.2 s at sf0.1, and a
    straight scale-killer at 100 TB). Same cure as dedup_keep_first's
    skew path (operators/newsmaper.py): phase 1 ranks within
    (flag, salt) — parallelism × SALT — and keeps ≤ k rows per salted
    partition; phase 2 re-ranks the ≤ k·SALT·|flags| survivors. top-k is
    decomposable, so the result is identical to the unsalted window.
    Only the 4 output columns are projected before the phase-1 shuffle.
    """
    SALT = 32
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    # Phase 1 repartitions EXPLICITLY on (flag, salt) at width ≥ SALT:
    # the whole point of salting is |flags|×SALT-way parallelism, so the
    # shuffle width must not collapse to a small session
    # shuffle.partitions (4 at toy SF — measured 1.10 s vs 0.58 s at
    # width 32). The window's ClusteredDistribution(flag, salt) is
    # satisfied by this HashPartitioning, so no second exchange is
    # inserted; at real SF shuffle.partitions is cluster-sized and the
    # max() keeps the full configured width.
    n_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions")), SALT)
    w1 = Window.partitionBy("l_returnflag", "__salt").orderBy(*_li_order())
    cand = (
        li.withColumn(
            "__salt",
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT)),
        )
        .repartition(n_parts, "l_returnflag", "__salt")
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= 3)
        .drop("__rn", "__salt")
    )
    w2 = Window.partitionBy("l_returnflag").orderBy(*_li_order())
    return (
        cand.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "rn")
    )
