"""Aggregations: group/agg, count-distinct, having, rollup/cube/sets,
mode-per-group, distinct, keep-first dedup.

Covers SURVEY.md §2.4 (A1–A4) and the dedup ledger items L3/L7.
Reference semantics (citations into /root/reference):

- mode / majority vote   dags/Transform.py:29  → count + rank with the
  pinned deterministic tie-break (count DESC, key ASC) — ledger L3.
- keep-first dedup       dags/Main.py:28-47    → row_number over the dup
  key ordered by id; survivors rn=1 — ledger L7.

Scale notes: every groupBy here is a hash aggregate with map-side partial
aggregation (automatic in Spark), so the shuffle carries only per-group
partials. Mode-per-group is two hash aggs + one window over the already
grouped (small) frame rather than a window over the raw fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from newsmaper_etl_spark.io import load_table
from newsmaper_etl_spark.registry import query


@query(
    "q_group_agg",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            COUNT(*) AS c,
            CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,10))), 2)
                 AS DOUBLE) AS sum_price,
            CAST(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,10)))
                            AS DOUBLE) / COUNT(*), 2)
                 AS DOUBLE) AS avg_qty,
            strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
            strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("A3", "A4"),
)
def q_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped multi-aggregate (the agg surface the reference
    lacks entirely — it only ever counts, Main.py:37)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("c"),
        # decimal-exact sum/avg: the (flag, status) groups hold a fixed
        # 6-way split of the fact, so group size scales with data and
        # double-sum order would eventually flip the cents (the same
        # class as TPC-H Q1's sf1.0 parity find; see plans/tpch.py)
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(30,10)")), 2
        ).cast("double").alias("sum_price"),
        # divide AFTER casting the exact decimal sum to double (both
        # engines then divide bit-identical inputs; decimal division
        # semantics are engine-specific — ADVICE r06, see plans/tpch.py)
        (
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(30,10)"))
                .cast("double")
                / F.count(F.lit(1)),
                2,
            ).cast("double")
        ).alias("avg_qty"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("min_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_ship"),
    )


@query(
    "q_count_distinct",
    oracle="""
        SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS cd
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("A4",),
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct (expands to a two-phase partial dedup + count;
    at 100 TB prefer approx_count_distinct when tolerance allows)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("cd")
    )


@query(
    "q_having",
    oracle="""
        SELECT c_nationkey, COUNT(*) AS c
        FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 5
    """,
    tags=("A4",),
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 5)
    )


def _customer_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)


_CNR_ORACLE_FROM = """
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
"""


@query(
    "q_rollup",
    oracle=f"""
        SELECT r_name, n_name, COUNT(*) AS c, CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(30,10))), 2) AS DOUBLE) AS bal
        {_CNR_ORACLE_FROM}
        GROUP BY ROLLUP(r_name, n_name)
    """,
    tags=("A4",),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _customer_region(spark, sf_dir)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("c"), F.round(F.sum(F.col("c_acctbal").cast("decimal(30,10)")), 2).cast("double").alias("bal"))
    )


@query(
    "q_cube",
    oracle=f"""
        SELECT r_name, c_mktsegment, COUNT(*) AS c
        {_CNR_ORACLE_FROM}
        GROUP BY CUBE(r_name, c_mktsegment)
    """,
    tags=("A4",),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _customer_region(spark, sf_dir)
        .cube("r_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("c"))
    )


@query(
    "q_grouping_sets",
    oracle=f"""
        SELECT r_name, n_name, COUNT(*) AS c
        {_CNR_ORACLE_FROM}
        GROUP BY GROUPING SETS ((r_name), (r_name, n_name), ())
    """,
    tags=("A4",),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's DataFrame.groupingSets — no temp-view detour: the SQL
    form needed createOrReplaceTempView, a session-global side effect
    that made this the one non-pure query builder in the file."""
    df = _customer_region(spark, sf_dir)
    return df.groupingSets(
        [["r_name"], ["r_name", "n_name"], []], "r_name", "n_name"
    ).agg(F.count(F.lit(1)).alias("c"))


@query(
    "q_mode_per_group",
    oracle="""
        WITH counted AS (
            SELECT o_custkey, o_orderpriority, COUNT(*) AS cnt
            FROM orders GROUP BY o_custkey, o_orderpriority
        ),
        ranked AS (
            SELECT o_custkey, o_orderpriority, cnt,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY cnt DESC, o_orderpriority ASC
                   ) AS rn
            FROM counted
        )
        SELECT o_custkey, o_orderpriority AS mode_priority FROM ranked WHERE rn = 1
    """,
    tags=("A1", "L3"),
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority vote with pinned tie-break (count DESC, value ASC).

    The reference's country vote (Transform.py:29,
    ``value_counts().idxmax()``) is tie-nondeterministic; ledger L3 pins
    the smallest value on ties so the oracle can hash-match. Built as two
    hash aggregates + a window over the per-group counts — the window
    input is |groups × distinct values|, far smaller than the fact.
    """
    orders = load_table(spark, sf_dir, "orders")
    counted = orders.groupBy("o_custkey", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("cnt"), F.asc("o_orderpriority")
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderpriority").alias("mode_priority"))
    )


@query(
    "q_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    tags=("A2",),
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q_dedup_keep_first",
    oracle="""
        SELECT o_orderkey AS keep_id
        FROM (
            SELECT o_orderkey,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
                       ORDER BY o_orderkey
                   ) AS rn
            FROM orders
        ) WHERE rn = 1
    """,
    tags=("A2", "U2", "S7", "L7"),
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup as a ranking window (ledger L7: lowest id wins).

    Set-oriented replacement for the reference's full-scan +
    per-duplicate-DELETE maintenance loop (Main.py:28-47): one shuffle on
    the dup key, zero per-row round trips, survivors selected by rn=1.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy(
        "o_custkey", F.to_date("o_orderdate")
    ).orderBy("o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("o_orderkey").alias("keep_id"))
    )
