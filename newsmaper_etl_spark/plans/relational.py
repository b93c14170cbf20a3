"""Scans, projections, filters, joins, and set operations.

Covers SURVEY.md §2.1 (S2/S3), §2.2 (P1–P6), §2.3 (J1–J6), §2.7 (U1–U3).
Reference semantics being re-expressed (citations into /root/reference):

- anti-join append filter   dags/Load.py:8-25   → left_anti hash join
- 4-key dim surrogate join  dags/Transform.py:36-47 → broadcast equi-join
- star-schema FK joins      dags/sql/news.sql:4-6   → BHJ over small dims
- union-all accumulation    dags/Extract.py:40-42   → unionByName

Scale notes: every join here either broadcasts its dimension side
(dims are orders of magnitude smaller than facts — the 100 TB posture)
or is a key-partitioned hash join that AQE can re-plan; no operator
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newsmaper_etl_spark.io import load_table
from newsmaper_etl_spark.registry import query


# --------------------------------------------------------------------------
# Scans / projections / filters
# --------------------------------------------------------------------------

@query(
    "q_scan_project",
    oracle="SELECT o_orderkey AS okey, o_orderstatus AS status FROM orders",
    tags=("S2", "S3", "P1", "P2", "P3"),
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + rename; Catalyst prunes the parquet scan to 2 columns
    (replaces the reference's manual ``data[COLUMNS]`` at Transform.py:88)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderstatus").alias("status"),
    )


@query(
    "q_filter",
    oracle="""
        SELECT l_orderkey, l_linenumber
        FROM lineitem
        WHERE l_quantity > 25 AND l_returnflag = 'R'
    """,
    tags=("P4", "P5", "P6"),
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicate; pushed down into the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") > 25) & (F.col("l_returnflag") == "R")).select(
        "l_orderkey", "l_linenumber"
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@query(
    "q_join_multi_key",
    oracle="""
        WITH dim AS (
            SELECT DISTINCT
                EXTRACT(YEAR FROM o_orderdate)  AS y,
                EXTRACT(MONTH FROM o_orderdate) AS m,
                EXTRACT(DAY FROM o_orderdate)   AS d
            FROM orders
        ),
        dim2 AS (SELECT CAST(y*10000 + m*100 + d AS BIGINT) AS dkey, y, m, d FROM dim)
        SELECT l.l_orderkey, l.l_linenumber, dim2.dkey
        FROM lineitem l
        JOIN dim2
          ON EXTRACT(YEAR FROM l.l_shipdate) = dim2.y
         AND EXTRACT(MONTH FROM l.l_shipdate) = dim2.m
         AND EXTRACT(DAY FROM l.l_shipdate) = dim2.d
    """,
    tags=("J2", "P6"),
)
def q_join_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column surrogate-key dim lookup.

    Re-expresses the reference's per-row N+1 date-dimension lookup
    (Transform.py:36-47: one SELECT per input row on a 4-col equality) as a
    broadcast hash join on the composite key — the dim is derived, tiny,
    and broadcast, so the fact side never shuffles.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        orders.select(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.dayofmonth("o_orderdate").alias("d"),
        )
        .distinct()
        .withColumn("dkey", (F.col("y") * 10000 + F.col("m") * 100 + F.col("d")).cast("bigint"))
    )
    fact = li.select(
        "l_orderkey",
        "l_linenumber",
        F.year("l_shipdate").alias("y"),
        F.month("l_shipdate").alias("m"),
        F.dayofmonth("l_shipdate").alias("d"),
    )
    return fact.join(F.broadcast(dim), on=["y", "m", "d"], how="inner").select(
        "l_orderkey", "l_linenumber", "dkey"
    )


@query(
    "q_star_join",
    oracle="""
        SELECT r_name, COUNT(*) AS c
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    tags=("J5", "A3"),
)
def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema FK join (news.sql:4-6's declared analytics shape).

    Both dims broadcast → zero shuffle on the fact side until the final
    partial+final aggregation on r_name.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("c"))
    )


@query(
    "q_anti_join",
    oracle="""
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("J1", "P4", "L7"),
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti hash join — the set-oriented form of the reference's
    O(n·m) Python existence loop (Load.py:8-9,23-24)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, how="left_anti"
    ).select("c_custkey")


@query(
    "q_semi_join",
    oracle="""
        SELECT c_custkey FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("J6",),
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, how="left_semi"
    ).select("c_custkey")


@query(
    "q_theta_join",
    oracle="""
        SELECT s.s_suppkey, c.c_custkey
        FROM supplier s
        JOIN customer c
          ON s.s_nationkey = c.c_nationkey AND c.c_acctbal > s.s_acctbal
    """,
    tags=("J6",),
)
def q_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + theta residual: Catalyst plans the equality as the hash
    key and evaluates the inequality as a post-join residual — no
    nested-loop blowup."""
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    cond = (supplier.s_nationkey == customer.c_nationkey) & (
        customer.c_acctbal > supplier.s_acctbal
    )
    return supplier.join(customer, cond, how="inner").select("s_suppkey", "c_custkey")


@query(
    "q_cross_join",
    oracle="""
        SELECT r1.r_name AS r1_name, r2.r_name AS r2_name
        FROM region r1 CROSS JOIN region r2
    """,
    tags=("J6",),
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join kept to dim×dim cardinality (5×5); at scale a cross join
    is only ever sane against a broadcastable side."""
    region = load_table(spark, sf_dir, "region")
    r1 = region.select(F.col("r_name").alias("r1_name"))
    r2 = region.select(F.col("r_name").alias("r2_name"))
    return r1.crossJoin(F.broadcast(r2))


@query(
    "q_token_dict_join",
    oracle="""
        WITH dict(word, label) AS (
            VALUES
                ('join', 'db'), ('query', 'db'), ('table', 'db'), ('index', 'db'),
                ('stream', 'streaming'), ('batch', 'streaming'), ('window', 'streaming'),
                ('vector', 'ml'), ('embedding', 'ml'), ('model', 'ml')
        ),
        toks AS (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        )
        SELECT d.label, COUNT(*) AS cnt
        FROM toks t JOIN dict d ON t.word = d.word
        GROUP BY d.label
    """,
    tags=("J3", "F8", "L2"),
)
def q_token_dict_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword containment join: explode tokens, broadcast-join the
    dictionary, aggregate per label.

    This is the distributed form of the reference's word-by-word Python
    membership scan against references.json (Transform.py:19-26): the
    dictionary side is tiny → broadcast; the exploded token stream never
    shuffles until the final count.
    """
    docs = load_table(spark, sf_dir, "documents")
    dict_rows = [
        ("join", "db"), ("query", "db"), ("table", "db"), ("index", "db"),
        ("stream", "streaming"), ("batch", "streaming"), ("window", "streaming"),
        ("vector", "ml"), ("embedding", "ml"), ("model", "ml"),
    ]
    from newsmaper_etl_spark.fixtures import values_df

    dict_df = values_df(spark, dict_rows, ["word", "label"])
    tokens = docs.select(F.explode(F.split("text", " ", -1)).alias("word"))
    return (
        tokens.join(F.broadcast(dict_df), on="word")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

@query(
    "q_union_all",
    oracle="""
        SELECT c_custkey AS k FROM customer
        UNION ALL
        SELECT s_suppkey AS k FROM supplier
    """,
    tags=("U1",),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName — the set form of the reference's per-feed list
    concatenation (Extract.py:40-42)."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_custkey").alias("k")).unionByName(
        supplier.select(F.col("s_suppkey").alias("k"))
    )


@query(
    "q_intersect",
    oracle="""
        SELECT c_nationkey AS nk FROM customer
        INTERSECT
        SELECT s_nationkey AS nk FROM supplier
    """,
    tags=("U3",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nk")).intersect(
        supplier.select(F.col("s_nationkey").alias("nk"))
    )


@query(
    "q_except",
    oracle="""
        SELECT c_nationkey AS nk FROM customer
        EXCEPT
        SELECT s_nationkey AS nk FROM supplier
    """,
    tags=("U3",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("nk")).subtract(
        supplier.select(F.col("s_nationkey").alias("nk"))
    )


@query(
    "q_range_join",
    oracle="""
        WITH iv AS (
            SELECT p_partkey,
                   (p_partkey % 45) * 10.0 AS lo,
                   (p_partkey % 45) * 10.0 + 15.0 AS hi
            FROM part WHERE p_partkey <= 300
        )
        SELECT p_partkey, COUNT(*) AS n_points,
               MIN(value) AS min_v, MAX(value) AS max_v
        FROM iv JOIN events e ON e.value >= lo AND e.value <= hi
        GROUP BY p_partkey
    """,
    tags=("J6", "RANGE"),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range (interval) join — no equi key anywhere: points
    (events.value) against derived value bands. Spark's native plan for
    this predicate is BroadcastNestedLoopJoin; operators.rangejoin turns
    it into a bucketized hash join (interval → covered buckets, point →
    its bucket, equi-join + exact refine) — the shape that survives when
    neither side broadcasts. Aggregates are COUNT/MIN/MAX (order-free,
    bit-stable across engines)."""
    from newsmaper_etl_spark.operators.rangejoin import range_join

    part = load_table(spark, sf_dir, "part")
    events = load_table(spark, sf_dir, "events")
    lo = (F.col("p_partkey") % 45) * 10.0
    intervals = part.filter(F.col("p_partkey") <= 300).select(
        "p_partkey", lo.alias("lo"), (lo + 15.0).alias("hi")
    )
    points = events.select("value")
    joined = range_join(points, intervals, "value", "lo", "hi", bucket_width=10.0)
    return joined.groupBy("p_partkey").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
