"""Relational core: SURVEY.md §2.B rows B1–B15.

These are pure built-in DataFrame plans — no UDFs, no collect loops —
so Catalyst gives predicate pushdown / column pruning / join selection
for free and the whole pipeline stays inside whole-stage codegen.

Scale notes common to this module:
- Joins against ``nation``/``region``/``part``/``supplier`` broadcast
  (dims are O(100) rows at any SF); fact-fact joins (orders⋈lineitem,
  customer⋈orders) shuffle on the join key and AQE handles skew.
- Aggregations are hash aggregates with map-side partial aggregation;
  grouping keys here are low-cardinality, so the shuffle is tiny
  regardless of input size.
- Window functions partition by bounded keys (custkey) — state per
  partition is small; a 100 TB run shuffles once on the partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_sandbox_spark.catalog import table
from kafka_streams_sandbox_spark.functions.numeric import (
    lsum_final,
    lsum_partial,
    sql_lsum,
)
from kafka_streams_sandbox_spark.registry import query


# --------------------------------------------------------------------------
# B1: projection + filter + scalar arithmetic
# --------------------------------------------------------------------------
@query(
    "b01_scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_discount > 0.02
    """,
)
def b01_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered projection; filter + column pruning reach the parquet scan."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") > 0.02)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


# --------------------------------------------------------------------------
# B2: hash aggregation, TPC-H Q1 shape — the flagship query
# --------------------------------------------------------------------------
B02_ORACLE = f"""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           {sql_lsum('l_extendedprice')} AS sum_base_price,
           {sql_lsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {sql_lsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           (SUM(l_quantity) / COUNT(*)) AS avg_qty,
           ({sql_lsum('l_extendedprice')} / COUNT(*)) AS avg_price,
           ({sql_lsum('l_discount', 4)} / COUNT(*)) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


@query("b02_tpch_q1_agg", oracle=B02_ORACLE)
def b02_tpch_q1_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate hash agg by (returnflag, linestatus).

    l_quantity is integer-valued, so plain SUM is exact; price-derived
    aggregates go through the scaled-long two-phase path (see
    functions/numeric.py lsum_*) for cross-engine determinism at
    long-accumulator speed with overflow safety delegated to the
    decimal(38) final.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # Two-phase scaled-long exact sums (functions/numeric.py lsum_*):
    # partials per (group keys, partition id) accumulate in plain LONG
    # — Spark's fast agg path — and the final phase sums the bounded
    # partial set exactly in decimal(38,0). Integer addition is
    # associative, so the result is identical to a one-phase decimal
    # sum but ~2x faster; the extra shuffle moves |groups x partitions|
    # rows, i.e. nothing.
    partials = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy(
            "l_returnflag",
            "l_linestatus",
            F.spark_partition_id().alias("__pid"),
        )
        .agg(
            F.sum("l_quantity").alias("_qty"),
            lsum_partial("l_extendedprice").alias("_base"),
            lsum_partial(disc_price, 4).alias("_dp"),
            lsum_partial(charge, 6).alias("_ch"),
            lsum_partial("l_discount", 4).alias("_disc"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    return partials.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("_qty").alias("sum_qty"),
        lsum_final("_base").alias("sum_base_price"),
        lsum_final("_dp", 4).alias("sum_disc_price"),
        lsum_final("_ch", 6).alias("sum_charge"),
        (F.sum("_qty") / F.sum("_n")).alias("avg_qty"),
        (lsum_final("_base") / F.sum("_n")).alias("avg_price"),
        (lsum_final("_disc", 4) / F.sum("_n")).alias("avg_disc"),
        F.sum("_n").alias("count_order"),
    )


# --------------------------------------------------------------------------
# B3: inner equi-join (fact ⋈ fact — shuffles on the key)
# --------------------------------------------------------------------------
@query(
    "b03_join_orders_customer",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    """,
)
def b03_join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    cust = table(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "c_mktsegment", "o_totalprice"
    )


# --------------------------------------------------------------------------
# B4: multi-way join + agg (TPC-H Q5 shape over 5 tables)
# --------------------------------------------------------------------------
B04_ORACLE = f"""
    SELECT n.n_name,
           {sql_lsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
"""


@query("b04_multiway_join_agg", oracle=B04_ORACLE)
def b04_multiway_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer⋈orders⋈lineitem⋈nation⋈region, revenue by nation.

    nation/region are broadcast (no shuffle); the two fact joins
    shuffle on orderkey/custkey. The region filter prunes *before* the
    fact joins because Catalyst pushes it through the broadcast join.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("n_name", F.spark_partition_id().alias("__pid"))
        .agg(
            lsum_partial(revenue, 4).alias("_rev"),
            F.count(F.lit(1)).alias("_n"),
        )
        .groupBy("n_name")
        .agg(
            lsum_final("_rev", 4).alias("revenue"),
            F.sum("_n").alias("n_rows"),
        )
    )


# --------------------------------------------------------------------------
# B5: broadcast join (fact ⋈ tiny dim), explicit hint
# --------------------------------------------------------------------------
B05_ORACLE = f"""
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           SUM(l.l_quantity) AS sum_qty,
           {sql_lsum('l.l_extendedprice')} AS sum_price
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type = 'ECONOMY'
    GROUP BY p.p_brand
"""


@query("b05_broadcast_join_agg", oracle=B05_ORACLE)
def b05_broadcast_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ broadcast(part): zero-shuffle join; only the final
    low-cardinality agg shuffles. At 100 TB this is the difference
    between a map-only stage and a multi-TB shuffle."""
    li = table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", F.spark_partition_id().alias("__pid"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("l_quantity").alias("_qty"),
            lsum_partial("l_extendedprice").alias("_price"),
        )
        .groupBy("p_brand")
        .agg(
            F.sum("_n").alias("n_items"),
            F.sum("_qty").alias("sum_qty"),
            lsum_final("_price").alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# B6/B7/B8: outer / semi / anti joins
# --------------------------------------------------------------------------
@query(
    "b06_left_outer_join",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    """,
)
def b06_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cond = (o.o_custkey == c.c_custkey) & (o.o_orderstatus == "F")
    return c.join(o, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "b07_left_semi_join",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
)
def b07_left_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "b08_left_anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def b08_left_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no pending ('P') order — 'P' is rare, so the
    anti-join output is non-degenerate at every SF."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# B9: window functions — rank / row_number / lag / moving sum
# --------------------------------------------------------------------------
B09_ORACLE = """
    SELECT o_orderkey, o_custkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS BIGINT) AS price_rank,
           LAG(o_totalprice) OVER w AS prev_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query("b09_window_functions", oracle=B09_ORACLE)
def b09_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + offset + frame aggregation in one pass.

    All four windows share the o_custkey partitioning, so Spark plans a
    single shuffle; ordering includes o_orderkey as a unique tiebreak
    so row_number/lag are deterministic.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_price = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    w_frame = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w_price).alias("price_rank"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w_frame)
        .cast("double")
        .alias("moving_sum3"),
    )


# --------------------------------------------------------------------------
# B10: top-K per group
# --------------------------------------------------------------------------
B10_ORACLE = """
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
"""


@query("b10_topk_per_group", oracle=B10_ORACLE)
def b10_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. Spark pushes a per-partition rank
    limit into the window exec (WindowGroupLimit) — no full sort of
    each group at scale."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# B11: global sort + limit
# --------------------------------------------------------------------------
B11_ORACLE = """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
"""


@query("b11_global_sort_limit", oracle=B11_ORACLE)
def b11_global_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT: Spark plans TakeOrderedAndProject — a per-
    partition top-100 then a single driver merge, never a full global
    sort. Order is total (unique key tiebreak) for determinism."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


# --------------------------------------------------------------------------
# B12: distinct + count distinct
# --------------------------------------------------------------------------
B12_ORACLE = """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(COUNT(DISTINCT (l_returnflag || '|' || l_linestatus)) AS BIGINT) AS n_status_pairs,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
"""


@query("b12_distinct_count", oracle=B12_ORACLE)
def b12_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — Spark expands to a two-phase partial
    aggregate. (approx_count_distinct is the 100 TB fast path but can
    never hash-match an oracle, so it stays out of the checked set.)"""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(
            F.concat_ws("|", "l_returnflag", "l_linestatus")
        ).alias("n_status_pairs"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# B13: set operations — union / intersect / except
# --------------------------------------------------------------------------
B13_ORACLE = """
    WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    SELECT 'union' AS op, c_custkey FROM (SELECT c_custkey FROM a UNION SELECT c_custkey FROM b)
    UNION ALL
    SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM a INTERSECT SELECT c_custkey FROM b)
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (SELECT c_custkey FROM a EXCEPT SELECT c_custkey FROM b)
"""


@query("b13_set_operations", oracle=B13_ORACLE)
def b13_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops with SQL semantics: subtract() IS EXCEPT DISTINCT, so
    the shape stays correct even if the left side carries duplicates
    (exceptAll().distinct() only coincides when it doesn't)."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return (
        a.union(b).distinct().select(F.lit("union").alias("op"), "c_custkey")
        .unionAll(a.intersect(b).select(F.lit("intersect").alias("op"), "c_custkey"))
        .unionAll(a.subtract(b).select(F.lit("except").alias("op"), "c_custkey"))
    )


# --------------------------------------------------------------------------
# B14: rollup (and cube shape) aggregation
# --------------------------------------------------------------------------
B14_ORACLE = f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           SUM(l_quantity) AS sum_qty,
           {sql_lsum('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("b14_rollup_agg", oracle=B14_ORACLE)
def b14_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grand-total hierarchy via partial-aggregation reuse: the
    fact table aggregates ONCE to the finest grouping (flag × status,
    a handful of rows), and the rollup's Expand runs over that base
    instead of the input. A direct rollup expands every input row
    3× before the shuffle — at 100 TB that's 3× shuffle volume for
    sums that are associative anyway. Exactness holds: counts are
    longs, qty is integer-valued (order-free), price partials stay
    DECIMAL until the final cast."""
    li = table(spark, sf_dir, "lineitem")
    base = li.groupBy(
        "l_returnflag", "l_linestatus", F.spark_partition_id().alias("__pid")
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("l_quantity").alias("_qty"),
        lsum_partial("l_extendedprice").alias("_price"),
    )
    return base.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("_n").alias("n_rows"),
        F.sum("_qty").alias("sum_qty"),
        lsum_final("_price").alias("sum_price"),
    )


# --------------------------------------------------------------------------
# B15: scalar string / date / math functions
# --------------------------------------------------------------------------
B15_ORACLE = """
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
           CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
           DATE_TRUNC('month', o_orderdate) AS order_month_start,
           UPPER(o_orderpriority) AS prio_upper,
           SUBSTRING(o_orderpriority, 1, 1) AS prio_code,
           CAST(LENGTH(o_orderstatus) AS INTEGER) AS status_len,
           (o_orderstatus || '/' || o_orderpriority) AS status_prio,
           CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS price_bucket,
           ABS(o_totalprice - 100000.0) AS price_dist
    FROM orders
"""


@query("b15_scalar_functions", oracle=B15_ORACLE)
def b15_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function surface: date parts, truncation, string ops,
    integer-exact math (floor/abs — no double rounding functions, whose
    half-even behavior differs across engines)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", "o_orderdate")
        .cast("timestamp_ntz")
        .alias("order_month_start"),
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderstatus").alias("status_len"),
        F.concat_ws("/", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.floor(F.col("o_totalprice") / 1000).alias("price_bucket"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("price_dist"),
    )
