"""Composite analytics queries in the TPC-H shape (Q1 / Q3 / Q5 / Q6 /
Q10 / Q18 adapted to the synthetic star schema — the testdata lacks
o_shippriority and the TPC-H date ranges, so literals are shifted into
the generated 1995-2001 span).

The reference never aggregates anything numeric (SURVEY §2.4 A4); these
are the "full query surface" proof: multi-join + agg + top-k pipelines a
user of the engine would actually run, expressed so Catalyst produces
the canonical distributed plans —

- Q1: scan → partial hash-agg → exchange on the 6-value group key →
  final agg (map-side combine does ~all the work; the exchange moves a
  handful of rows).
- Q3: selective dim filter (customer segment) broadcast into the
  orders⋈lineitem join, then TakeOrderedAndProject for the top-10 (no
  global sort materialization).
- Q5: star joins with every dimension side broadcast; one exchange for
  the final per-nation agg.

Sums are ROUND(...,2)-stabilized (established convention: q_group_agg
proved sum/avg-of-double stability at these scales); ranked outputs
carry a full deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newsmaper_etl_spark.io import is_toy, load_table
from newsmaper_etl_spark.registry import query


def _bc(df: DataFrame, sf_dir: str) -> DataFrame:
    """Broadcast hint for DATA-SCALED sides, applied only at toy SF.

    supplier/part (and anything derived from them) shrink by a constant
    filter factor but grow linearly with data — at the 100 TB design
    point supplier is ~1 B rows, and ``F.broadcast`` is a directive AQE
    cannot override, so an unconditional hint is a guaranteed executor
    OOM at scale. At toy SF the hint is provably safe (the whole table
    is < the session's 32 MB autoBroadcastJoinThreshold, which would
    broadcast it anyway); at real scale the hint is withheld and AQE
    picks the strategy from runtime stats (same pattern as Q4's
    quarter-filtered orders side). Fixed-cardinality sides (nation = 25
    rows, region = 5, one-row scalar cutoffs) keep their unconditional
    ``F.broadcast`` — those never scale with data."""
    return F.broadcast(df) if is_toy(sf_dir) else df


@query(
    "q_tpch_q1",
    oracle="""
        WITH d AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(l_quantity AS DECIMAL(30,10)) AS qd,
                   CAST(l_extendedprice AS DECIMAL(30,10)) AS pd,
                   CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(30,10)) AS dpd,
                   CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                        AS DECIMAL(30,10)) AS chd,
                   CAST(l_discount AS DECIMAL(30,10)) AS dd
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1999-09-02 00:00:00'
        )
        SELECT l_returnflag, l_linestatus,
               CAST(ROUND(SUM(qd), 2) AS DOUBLE) AS sum_qty,
               CAST(ROUND(SUM(pd), 2) AS DOUBLE) AS sum_base_price,
               CAST(ROUND(SUM(dpd), 2) AS DOUBLE) AS sum_disc_price,
               CAST(ROUND(SUM(chd), 2) AS DOUBLE) AS sum_charge,
               CAST(ROUND(CAST(SUM(qd) AS DOUBLE) / COUNT(*), 2)
                    AS DOUBLE) AS avg_qty,
               CAST(ROUND(CAST(SUM(pd) AS DOUBLE) / COUNT(*), 2)
                    AS DOUBLE) AS avg_price,
               CAST(ROUND(CAST(SUM(dd) AS DOUBLE) / COUNT(*), 2)
                    AS DOUBLE) AS avg_disc,
               COUNT(*) AS count_order
        FROM d
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("TPCH",),
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary): the canonical scan→partial-agg→
    exchange→final-agg pipeline; the date predicate pushes into the
    parquet scan.

    Summands are cast to DECIMAL(30,10) BEFORE aggregation (round 6):
    double summation is order-dependent, and at sf1.0 a 1.8 M-row
    group's partial-agg tree rounds the 2nd decimal differently than
    the oracle's sequential sum — the sf1.0 parity sweep caught exactly
    one such flip. The per-row products are identical IEEE doubles in
    both engines; casting each to decimal makes the SUM associative and
    engine-exact at ANY scale (and partial aggregation still applies —
    decimal sums are mergeable). Averages derive from the exact decimal
    sums over COUNT for the same reason."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(30,10)"
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    qd = F.col("l_quantity").cast(dec)
    pd_ = F.col("l_extendedprice").cast(dec)
    dpd = disc_price.cast(dec)
    chd = (disc_price * (1 + F.col("l_tax"))).cast(dec)
    dd = F.col("l_discount").cast(dec)
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qd), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(pd_), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(dpd), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(chd), 2).cast("double").alias("sum_charge"),
            # divide AFTER casting the exact decimal sum to double: both
            # engines then divide bit-identical doubles, instead of each
            # applying its own decimal-division scale/rounding rules
            # (Spark reduces scale HALF_UP, DuckDB promotes — a quotient
            # near a .005 boundary could flip the rounded cent; ADVICE
            # r06, same convention as q_tpch_q8/q14's ratios)
            F.round(F.sum(qd).cast("double") / cnt, 2)
            .cast("double").alias("avg_qty"),
            F.round(F.sum(pd_).cast("double") / cnt, 2)
            .cast("double").alias("avg_price"),
            F.round(F.sum(dd).cast("double") / cnt, 2)
            .cast("double").alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@query(
    "q_tpch_q3",
    oracle="""
        SELECT l_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               o_orderdate
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    tags=("TPCH",),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): top-10 via TakeOrderedAndProject
    with a pinned (revenue DESC, l_orderkey) tie-break.

    customer scales WITH the data (unlike nation/region), so it carries
    no broadcast hint — AQE converts the join to broadcast when the
    filtered side is small at runtime, and falls back to shuffle joins
    at the 100 TB end where a hint would OOM the executors."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(
            orders, li.l_orderkey == orders.o_orderkey
        )
        .join(cust.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@query(
    "q_tpch_q5",
    oracle="""
        SELECT n_name,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(30,10))), 2) AS DOUBLE)
                   AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
    """,
    tags=("TPCH",),
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume): full star join. Only the
    fixed-cardinality dims (nation, region) carry broadcast hints;
    customer/supplier scale with the data, so their join strategy is
    left to AQE (broadcast at small SF, shuffle join at 100 TB). The
    local-supplier constraint (c_nationkey = s_nationkey) folds into
    the supplier join condition."""
    sf = lambda t: load_table(spark, sf_dir, t)  # noqa: E731
    orders = sf("orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    return (
        sf("lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            sf("customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            sf("supplier").select("s_suppkey", "s_nationkey"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(sf("nation")), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(sf("region")).filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            # decimal-cast summand: nation groups have FIXED cardinality,
            # so group size scales linearly and double-summation order
            # would eventually flip the rounded cents (the Q1 sf1.0
            # parity find); per-row products are identical IEEE doubles
            # in both engines, decimal SUM is associative and exact
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(30,10)")
                ),
                2,
            ).cast("double").alias("revenue")
        )
    )


@query(
    "q_tpch_q10",
    oracle="""
        SELECT c_custkey, c_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               ROUND(c_acctbal, 2) AS acctbal, n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    tags=("TPCH",),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): quarter + returnflag filters
    push into the scans, nation broadcasts, top-20 customers by lost
    revenue via TakeOrderedAndProject with a pinned tie-break."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
    )


@query(
    "q_tpch_q18",
    oracle="""
        SELECT c_custkey, o_orderkey, o_orderdate,
               ROUND(o_totalprice, 2) AS total,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
        HAVING SUM(l_quantity) > 300
    """,
    tags=("TPCH",),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume orders), aggregate-BEFORE-join: sum
    lineitem by ``l_orderkey`` and apply the ``HAVING > 300`` gate first,
    so only the tiny survivor set (a vanishing fraction of orders) ever
    reaches the orders/customer joins — at 100× scale this cuts the join
    input by ~1000× vs joining the full lineitem through first. The
    survivor side is left unhinted: AQE broadcasts it when it is small
    (always at these SFs) and falls back to a shuffle join if a future
    corpus makes it wide. HAVING gates on the raw (unrounded) sum; the
    grouping key is the join key, so the agg's exchange is the only
    lineitem shuffle in the plan."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__sq"))
        .filter(F.col("__sq") > 300)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("total"),
            F.round("__sq", 2).alias("sum_qty"),
        )
    )


@query(
    "q_tpch_q4",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
    tags=("TPCH",),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking; the testdata lacks
    commit/receipt dates, so the EXISTS predicate is "any line shipped
    after the order date").

    The EXISTS predicate is MONOTONE in an aggregate — "∃ line with
    l_shipdate > o_orderdate" ⟺ "max(l_shipdate) per orderkey >
    o_orderdate" — so lineitem is pre-aggregated to one (orderkey,
    max_shipdate) row BEFORE the join. That map-side combine collapses
    the fact table ~4× ahead of any data movement (the semi-join form
    instead carried every line into the join; measured 0.48 → 0.32 s at
    sf0.1) and is the plan that wins at 100 TB: the shuffle moves 12
    bytes per ORDER, not per line. The quarter-filtered orders side
    (~5 % of orders) gets an explicit broadcast hint only at toy SF
    (provably tiny there); at real scale the hint is withheld — a
    data-scaled broadcast would OOM — and Catalyst plans the equi-join
    co-located on the pre-aggregated key."""
    from newsmaper_etl_spark.io import is_toy

    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    if is_toy(sf_dir):
        orders = F.broadcast(orders)
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("__max_ship"))
    )
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("__max_ship") > F.col("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q_tpch_q7",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               CAST(ROUND(SUM(CAST(volume AS DECIMAL(30,10))), 2) AS DOUBLE)
                   AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("TPCH",),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations): the nation dim
    joins twice under different roles — both broadcast — and the
    pair-disjunction lands AFTER both lookups (it needs both names).
    Ship-date range pushes to the lineitem scan; the 2-nation filters
    shrink supplier/customer before their joins."""
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            # decimal-cast summand (scale-exact; see q_tpch_q5)
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(30,10)")
                ),
                2,
            ).cast("double").alias("revenue")
        )
    )


@query(
    "q_tpch_q8",
    oracle="""
        SELECT o_year,
               FLOOR(10000
                     * CAST(SUM(CAST(CASE WHEN nation = 'NATION_3'
                                     THEN volume ELSE 0 END
                                     AS DECIMAL(30,10))) AS DOUBLE)
                     / CAST(SUM(CAST(volume AS DECIMAL(30,10))) AS DOUBLE))
                   / 10000 AS mkt_share
        FROM (
            SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS nation
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        ) all_nations
        GROUP BY o_year
    """,
    tags=("TPCH",),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): the deepest join tree in the
    corpus — part prunes lineitem (selective type filter joins before the
    fact widens), fixed dims broadcast, and the share is a conditional
    aggregate over one pass (no self-join on the grouped frame).
    Ratio is floor-scaled (established oracle convention for ratio
    columns — ROUND's banker's-tie behavior diverges between engines)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = F.broadcast(load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    ))
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = F.broadcast(load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    ))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part.select("p_partkey"), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(region, F.col("n1_region") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            # both sums decimal-exact before the ratio (see q_tpch_q5):
            # the division then happens between two identical doubles
            (
                F.floor(
                    10000
                    * F.sum(
                        F.when(F.col("nation") == "NATION_3", vol)
                        .otherwise(0.0).cast("decimal(30,10)")
                    ).cast("double")
                    / F.sum(vol.cast("decimal(30,10)")).cast("double")
                )
                / 10000
            ).alias("mkt_share")
        )
    )


@query(
    "q_tpch_q12",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_returnflag
    """,
    tags=("TPCH",),
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority counts; the testdata lacks
    l_shipmode/commit/receipt dates, so the group key is l_returnflag and
    the filter is the ship-date year): pivot-style conditional counts in
    ONE aggregate pass over the join — no per-category scans."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q13",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
    """,
    tags=("TPCH",),
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): LEFT OUTER join so
    zero-order customers survive with c_count = 0; COUNT(o_orderkey)
    counts only matches (null-skipping). Two aggregations: the first
    reuses the join's c_custkey partitioning (no extra exchange), the
    second shuffles a #distinct-counts-sized frame — nothing at fact
    scale moves twice."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "q_tpch_q14",
    oracle="""
        SELECT FLOOR(10000 *
                   CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0 END AS DECIMAL(30,10))) AS DOUBLE)
                   / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(30,10))) AS DOUBLE)) / 10000
                   AS promo_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
    tags=("TPCH",),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): one month of lineitem joined to part
    for the type flag — the month filter cuts the fact ~98% before the
    join, and the share is a single conditional-aggregate pass. part
    scales with the data so it carries no hint (AQE broadcasts it while
    it fits)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            # decimal-exact sums before the ratio (scale-exact; see
            # q_tpch_q1's docstring for the Q1 sf1.0 parity find)
            (
                F.floor(
                    10000
                    * F.sum(
                        F.when(F.col("p_type") == "PROMO", vol)
                        .otherwise(0.0).cast("decimal(30,10)")
                    ).cast("double")
                    / F.sum(vol.cast("decimal(30,10)")).cast("double")
                )
                / 10000
            ).alias("promo_share")
        )
    )


@query(
    "q_tpch_q15",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                       AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        ),
        top AS (
            SELECT supplier_no, total_revenue FROM revenue
            ORDER BY total_revenue DESC, supplier_no LIMIT 1
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN top ON s_suppkey = supplier_no
    """,
    tags=("TPCH",),
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarter revenue per supplier, then the
    argmax via orderBy+limit — Spark plans TakeOrderedAndProject over the
    supplier-cardinality agg output (no global sort, no single-partition
    window). Tie-break pinned (revenue DESC, suppkey ASC) on the ROUNDED
    revenue so both engines rank identical values."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    top = revenue.orderBy(F.desc("total_revenue"), F.asc("supplier_no")).limit(1)
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return supp.join(
        F.broadcast(top), F.col("s_suppkey") == F.col("supplier_no")
    ).select("s_suppkey", "s_name", "total_revenue")


@query(
    "q_tpch_q17",
    oracle="""
        SELECT CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,10)))
                               AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN (
            SELECT l_partkey AS a_partkey,
                   0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(30,10)))
                               AS DOUBLE) / COUNT(*)) AS qty_cap
            FROM lineitem GROUP BY l_partkey
        ) caps ON a_partkey = p_partkey
        WHERE p_brand = 'Brand#3' AND p_size <= 5 AND l_quantity < qty_cap
    """,
    tags=("TPCH",),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue; correlated scalar
    subquery decorrelated by hand): the per-part 0.2×avg cap is an
    aggregate-before-join — computed once per part key, joined back on
    the same key, never a per-row subquery. The brand/size filter prunes
    part before it touches the fact."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 5)
    ).select("p_partkey")
    # Q20-style semi prune (r12): the cap is consumed ONLY for parts
    # that survive the brand/size filter, and the caps agg is
    # partition-wise over l_partkey, so restricting lineitem to the
    # qualifying part keys BEFORE the agg is result-identical — the
    # same "early restriction" argument written under Q20/Q2. Without
    # it the caps agg shuffles the ENTIRE lineitem by l_partkey to
    # compute caps that the part join then throws away (~99% of keys
    # at any SF) — at sf1.0 the full-fact shuffle was the single
    # biggest Spark time in the record (VERDICT r11 #2).
    li = li.join(_bc(part, sf_dir), li.l_partkey == part.p_partkey,
                 "left_semi")
    # the cap derives from an EXACT decimal SUM: double summation is
    # order-dependent even over a bounded group, and the cap VALUE
    # feeds the filter — an ulp flip at a quantity boundary would
    # change row membership (scale-exact convention; see q_tpch_q1).
    # The DIVISION happens after casting the exact sum to double so
    # both engines divide bit-identical inputs — decimal division
    # itself is engine-specific (scale reduction vs promotion;
    # ADVICE r06)
    caps = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            0.2
            * (
                F.sum(F.col("l_quantity").cast("decimal(30,10)"))
                .cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_cap")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(caps, F.col("a_partkey") == F.col("p_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(30,10)"))
                .cast("double")
                / 7.0,
                2,
            ).cast("double").alias("avg_yearly")
        )
    )


@query(
    "q_tpch_q19",
    oracle="""
        SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(30,10))), 2) AS DOUBLE)
                   AS revenue
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 5
               AND l_quantity >= 1 AND l_quantity <= 11)
           OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 10
               AND l_quantity >= 10 AND l_quantity <= 20)
           OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    tags=("TPCH",),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): the OR of
    per-branch conjunctions spans both tables, but each side's derivable
    envelope (brand ∈ {4,14,24} + size ≤ 15; quantity ∈ [1,30]) is pushed
    to its scan by Catalyst's constraint propagation — the join only sees
    rows that can satisfy SOME branch; the exact disjunction lands after
    the join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            # decimal-exact global sum (scale-exact; see q_tpch_q1)
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(30,10)")
                ),
                2,
            ).cast("double").alias("revenue")
        )
    )


@query(
    "q_tpch_q22",
    oracle="""
        WITH pool AS (
            SELECT c_custkey, c_nationkey, c_acctbal FROM customer
            WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        ),
        cutoff AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,10))) AS DOUBLE)
                   / COUNT(*) AS avg_bal
            FROM pool WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey AS cntrycode,
               COUNT(*) AS numcust,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(30,10))), 2)
                    AS DOUBLE) AS totacctbal
        FROM pool, cutoff
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
    """,
    tags=("TPCH",),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity; country code = nation key —
    the testdata has no phone column): a scalar aggregate broadcast as a
    cross-join cutoff, then an ANTI join against orders for "never
    ordered". The anti join's build side is just order custkeys (one
    column); the scalar cutoff is a 1-row broadcast, not a re-scan per
    row."""
    pool = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    ).select("c_custkey", "c_nationkey", "c_acctbal")
    # the cutoff VALUE feeds a filter, so it must be engine-exact: an
    # avg-of-double ulp flip at scale would change row MEMBERSHIP, not
    # just a displayed decimal (scale-exact convention; see q_tpch_q1)
    cutoff = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(30,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        pool.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(30,10)")), 2
            ).cast("double").alias("totacctbal"),
        )
    )


@query(
    "q_tpch_q6",
    oracle="""
        SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount
                                   AS DECIMAL(30,10))), 2) AS DOUBLE)
                   AS revenue,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    tags=("TPCH",),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the pure filter-and-sum —
    every predicate pushes to the parquet scan, the agg is a single
    global partial+final pair; the query that shows pushdown working or
    not at a glance."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # decimal-exact global sum (scale-exact; see q_tpch_q1)
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount"))
                    .cast("decimal(30,10)")
                ),
                2,
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
# Round-4 additions: the six remaining TPC-H shapes (Q2, Q9, Q11, Q16,
# Q20, Q21), completing the 22-query corpus. The testdata has no
# partsupp table and no commit/receipt dates, so the established
# adaptation convention applies: lineitem serves as the part↔supplier
# catalog (unit cost = l_extendedprice / l_quantity), and Q21's
# "received late" becomes l_returnflag = 'R'. The decorrelation
# patterns — aggregate-before-join, broadcast scalar cutoffs, semi/anti
# joins with residual non-equi conditions — are the point; they are
# exactly the shapes these queries exist to exercise.
# --------------------------------------------------------------------------


@query(
    "q_tpch_q2",
    oracle="""
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        eu AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ),
        offers AS (
            SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
                   unit_cost
            FROM part
            JOIN cost ON l_partkey = p_partkey
            JOIN eu ON s_suppkey = l_suppkey
            WHERE p_size = 15 AND p_type = 'STANDARD'
        ),
        best AS (
            SELECT p_partkey AS b_partkey, MIN(unit_cost) AS min_cost
            FROM offers GROUP BY p_partkey
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               ROUND(unit_cost, 2) AS supply_cost
        FROM offers JOIN best ON p_partkey = b_partkey
        WHERE unit_cost = min_cost
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    tags=("TPCH",),
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): the correlated MIN subquery is
    decorrelated into a per-part MIN window over the region's offers —
    NOT a self-join on a min aggregate, which plans the whole offers
    subtree (incl. the fact-scale cost aggregate) twice unless
    ReuseExchange happens to fire (it did not here: the broadcast sides
    of the two instances canonicalize differently, so r04's shape
    scanned lineitem twice; VERDICT r04 "what's wrong" #4). The window
    shuffles only the part-filtered offers — a few rows per part after
    the p_size/p_type predicate — and the single fact-scale
    (partkey, suppkey) aggregate runs once. The min comparison is on
    the RAW division (identical double in both engines); rounding
    happens only at output."""
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    # Star-schema prune: broadcast-SEMI the highly selective part filter
    # UNDER the fact aggregate (Catalyst won't reorder an agg past a
    # join on the group key itself). The per-(part, supp) min is
    # partition-wise over l_partkey, so restricting partkeys first is
    # result-identical and shrinks the aggregate's input by the filter's
    # selectivity (~1/250) — the same shape that wins at 100 TB, where
    # aggregating the whole fact to then drop 99.6 % of groups is pure
    # waste.
    li_f = li.join(
        _bc(part.select("p_partkey"), sf_dir),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    cost = li_f.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        cost.join(_bc(part, sf_dir), F.col("p_partkey") == F.col("l_partkey"))
        .join(_bc(eu, sf_dir), F.col("s_suppkey") == F.col("l_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.round("unit_cost", 2).alias("supply_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"),
        )
        .limit(100)
    )


@query(
    "q_tpch_q9",
    oracle="""
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - 0.6 * p_retailprice * l_quantity
                         AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN orders ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%gear%'
        GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
    """,
    tags=("TPCH",),
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit; supply cost surrogate =
    0.6 × p_retailprice per unit — no partsupp table): the five-way join
    keeps every fixed-cardinality side broadcast (part is pre-filtered
    by the name pattern, supplier/nation are dims); lineitem⋈orders is
    the only data-scaled join and AQE picks its strategy. One final
    exchange on the (nation, year) group key.

    The profit sum runs in DECIMAL(18,4): the amount is a DIFFERENCE of
    products, so double summation is cancellation-noisy enough that
    ROUND(...,2) landed on a .xx5 boundary at sf0.01 (417321.125 — one
    ulp apart between engines). Decimal addition is exact and
    order-independent; both engines round the identical decimal, then
    the result goes back to DOUBLE for the hash."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    ).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(_bc(part, sf_dir), F.col("p_partkey") == F.col("l_partkey"))
        .join(_bc(supp, sf_dir), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(F.sum(amount.cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
    )


@query(
    "q_tpch_q11",
    oracle="""
        WITH nat AS (
            SELECT l_partkey,
                   SUM(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(30,10))) AS part_value
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            WHERE s_nationkey = 7
            GROUP BY l_partkey
        ),
        total AS (
            SELECT SUM(part_value) AS total_value, COUNT(*) AS n_parts
            FROM nat
        )
        SELECT l_partkey,
               CAST(ROUND(part_value, 2) AS DOUBLE) AS part_value
        FROM nat, total
        WHERE CAST(part_value AS DOUBLE)
              > 3.0 * CAST(total_value AS DOUBLE) / n_parts
    """,
    tags=("TPCH",),
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock; value surrogate = discounted revenue
    per part from one nation's suppliers — no partsupp): the HAVING-
    against-a-scalar-total decorrelates into a 1-row broadcast cutoff
    cross-joined over the per-part aggregate, never a re-aggregation per
    row. The threshold compares the raw sums (identical inputs; the
    boundary sits nowhere near a representable tie at these magnitudes);
    output rounds for the hash."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") == 7
    ).select("s_suppkey")
    nat = (
        li.join(_bc(supp, sf_dir), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(
            # decimal-exact per-part value: the scalar TOTAL sums over a
            # part count that scales with data, and the threshold it
            # feeds decides row MEMBERSHIP (scale-exact; see q_tpch_q1)
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(30,10)")
            ).alias("part_value")
        )
    )
    total = nat.agg(
        F.sum("part_value").alias("total_value"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        nat.crossJoin(F.broadcast(total))
        .filter(
            F.col("part_value").cast("double")
            > 3.0 * F.col("total_value").cast("double") / F.col("n_parts")
        )
        .select(
            "l_partkey",
            F.round("part_value", 2).cast("double").alias("part_value"),
        )
    )


@query(
    "q_tpch_q16",
    oracle="""
        WITH ok_supp AS (
            SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0
        ),
        links AS (
            SELECT DISTINCT p_brand, p_type, p_size, l_suppkey
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
              AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
              AND l_suppkey IN (SELECT s_suppkey FROM ok_supp)
        )
        SELECT p_brand, p_type, p_size,
               COUNT(*) AS supplier_cnt
        FROM links
        GROUP BY p_brand, p_type, p_size
    """,
    tags=("TPCH",),
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (supplier relationship; the "complaints" exclusion is
    s_acctbal < 0 — no comment column): NOT-IN-complaints runs as a
    broadcast LEFT SEMI against the ok-suppliers keys, and the
    COUNT(DISTINCT supplier) is a two-level aggregate — distinct
    (attrs, suppkey) pairs first (map-side combinable), then a plain
    count — instead of a distinct-expand over the fact rows."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    ok_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") >= 0
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    links = (
        li.join(_bc(part, sf_dir), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            _bc(ok_supp, sf_dir),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return links.groupBy("p_brand", "p_type", "p_size").agg(
        F.count(F.lit(1)).alias("supplier_cnt")
    )


@query(
    "q_tpch_q20",
    oracle="""
        WITH shipped AS (
            SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l_partkey, l_suppkey
        ),
        part_total AS (
            SELECT l_partkey AS t_partkey, SUM(supp_qty) AS total_qty
            FROM shipped GROUP BY l_partkey
        ),
        dominant AS (
            SELECT DISTINCT l_suppkey
            FROM shipped
            JOIN part_total ON l_partkey = t_partkey
            JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE 'small%' AND supp_qty > 0.15 * total_qty
        )
        SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
        FROM supplier
        WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
          AND s_nationkey < 13
    """,
    tags=("TPCH",),
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion; "availqty > half of shipped"
    becomes "supplier shipped > 15 % of the part's year volume" — no
    partsupp): nested aggregate-before-join (per-pair qty → per-part
    total), then the supplier list applies as a LEFT SEMI join — the
    original's IN-subquery chain with every correlation flattened to
    equi-joins. The part-name filter prunes before the dominance test."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    # Same star-schema prune as Q2: the part-name filter is applied as a
    # broadcast SEMI join under BOTH aggregates — per-part totals of
    # non-"small" parts were aggregated only to be dropped by the final
    # part join, and both aggs are partition-wise over l_partkey, so the
    # early restriction is result-identical.
    li_f = li.join(
        _bc(part, sf_dir),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    shipped = li_f.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    # Per-part totals as a WINDOW over the per-(part, supplier) aggregate
    # instead of a second aggregation self-joined back (r16, guide §3 /
    # §2.4): the self-join shape re-planned the whole lineitem aggregate
    # under BOTH join sides — two scans + two aggregations of the fact
    # table per evaluation, plus the join's exchanges (4 jobs / 12
    # stages by statusTracker; VERDICT r15 'do this' #6). The window
    # consumes the ONE aggregate output (≤ |part×supp| rows, fact-scale
    # gone) and partitions by l_partkey — never single-partition. Same
    # math: total_qty = SUM(supp_qty) over the part's suppliers, summed
    # in arbitrary order either way.
    from pyspark.sql import Window

    w_part = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("total_qty", F.sum("supp_qty").over(w_part))
        .filter(F.col("supp_qty") > 0.15 * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 13)
    return (
        supp.join(
            _bc(dominant, sf_dir),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


@query(
    "q_tpch_q21",
    oracle="""
        WITH l1 AS (
            SELECT l_orderkey, l_suppkey
            FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey
            WHERE l_returnflag = 'R' AND o_orderstatus = 'F'
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM l1
        JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE s_nationkey < 13
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_returnflag = 'R'
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    tags=("TPCH",),
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting; "received late"
    surrogate = l_returnflag 'R' — no receipt/commit dates), rewritten
    Q4-style as a SINGLE-SCAN monotone-aggregate plan.

    The EXISTS / NOT EXISTS pair over l2/l3 is a per-ORDER property:
    for a flagged line (o, s) of an 'F' order,
      EXISTS other-supplier line      ⟺ countDistinct(suppkey | order) ≥ 2
      NOT EXISTS other flagged supp   ⟺ countDistinct(flagged suppkey | order) = 1
    and COUNT(*) counts the flagged LINES of the unique flagged
    supplier. So one lineitem scan aggregates to per-(order, supplier)
    rows first (map-side combinable: any_flagged, flagged_line_count),
    then per-order: supplier count, flagged-supplier count, the unique
    flagged supplier, and its line count. The r06 shape instead scanned
    lineitem twice and shuffled every LINE through a semi AND an anti
    join (the top real TPC-H offender: 3.1× at sf0.1, 4.6× at sf1.0).

    ONE fact exchange (r13, VERDICT r12 #5): lineitem is repartitioned
    by l_orderkey ONCE, and hash(l_orderkey) satisfies the clustered
    distribution of BOTH downstream aggregates — groupBy(l_orderkey,
    l_suppkey) and groupBy(l_orderkey) — so neither adds an exchange.
    The prior shape paid two fact-scale exchanges (pair keys, then
    order keys); profiled at sf1.0 the pair aggregate compacts almost
    NOTHING on TPC-H-shaped data (6.00 M lines → 5.99 M pairs — each
    line is its own (order, supplier)), so the second exchange
    re-shuffled effectively the whole fact. Measured: 2.01 → 1.71 s
    sf1.0, 1.27 → 0.67 s sf0.1 (warm best-of-3, cache off), identical
    output. Trade disclosed: the explicit repartition shuffles RAW
    lines without map-side partial aggregation, so on a corpus with
    many lines per (order, supplier) pair AND input files clustered by
    order, the old two-exchange shape can shuffle fewer bytes — for
    TPC-H's ~1 line/pair the single exchange wins at any scale.
    Orders ('F' filter, ~half) and the supplier dim join by hash join
    under AQE; no data-scaled side is force-broadcast (see ``_bc``;
    a force-broadcast early orders semi measured 1.39 s sf1.0 but
    orders is fact-scale — unsafe, withheld). Top-20 via
    TakeOrderedAndProject with the (numwait DESC, s_name) tie-break."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_returnflag") == "R").cast("int").alias("__flag"),
    ).repartition("l_orderkey")
    pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("__flag").alias("__has_flag"),
        F.sum("__flag").alias("__flag_lines"),
    )
    per_order = pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__n_supp"),
        F.sum("__has_flag").alias("__n_flagged_supp"),
        F.max(
            F.when(F.col("__has_flag") == 1, F.col("l_suppkey"))
        ).alias("__flagged_supp"),
        F.sum(
            F.when(F.col("__has_flag") == 1, F.col("__flag_lines"))
        ).alias("__numwait_lines"),
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") < 13
    ).select("s_suppkey", "s_name")
    waiting = (
        per_order.filter(
            (F.col("__n_supp") >= 2) & (F.col("__n_flagged_supp") == 1)
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
    )
    return (
        waiting.join(
            _bc(supp, sf_dir), F.col("s_suppkey") == F.col("__flagged_supp")
        )
        .groupBy("s_name")
        .agg(F.sum("__numwait_lines").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
