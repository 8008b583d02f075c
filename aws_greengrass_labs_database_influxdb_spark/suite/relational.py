"""Relational queries over the TPC-H-ish tables (joins, aggregations,
pivots, set ops) — the extended surface of the engine (InfluxQL
subqueries ≈ DataFrame composition; `sql.from` ≈ jdbc/parquet reads).

Decimal-exact sums keep float parity with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.io import load_table
from . import q


@q(
    "rel_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           cast(sum(cast(l_quantity as decimal(12,2))) as double) AS sum_qty,
           cast(sum(cast(l_extendedprice as decimal(14,2))) as double) AS sum_base_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY 1, 2
    """,
)
def rel_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary (filter → groupBy → decimal sums)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(14,2)")).cast("double").alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@q(
    "rel_region_revenue",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           cast(sum(cast(o.o_totalprice as decimal(16,2))) as double) AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def rel_region_revenue(spark, sf_dir):
    """Star-join rollup: orders ⋈ customer ⋈ nation ⋈ region.

    nation/region are tiny dims → broadcast; customer joins via AQE
    (broadcast at sf≤1, shuffle beyond). No manual repartition needed.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(16,2)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@q(
    "rel_top_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, epoch_ms(o_orderdate) AS od_ms
    FROM (
      SELECT *, row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) rn
      FROM orders) WHERE rn <= 25
    """,
)
def rel_top_orders(spark, sf_dir):
    """Global top-N with deterministic tie-break. orderBy+limit plans
    TakeOrderedAndProject — per-partition top-25 heaps merged on the
    driver, so the at-scale variant needs no pre-filter and no
    single-partition window (r10, verdict r9 #3)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select(
            "o_orderkey", "o_custkey", "o_totalprice",
            # parquet ms-timestamps arrive as TIMESTAMP_NTZ; the session
            # is UTC so the cast matches DuckDB's naive-as-UTC epoch_ms
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("od_ms"),
        )
    )


@q(
    "rel_semi_anti",
    """
    SELECT
      (SELECT count(*) FROM customer c WHERE EXISTS
        (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_with_orders,
      (SELECT count(*) FROM customer c WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_without_orders
    """,
)
def rel_semi_anti(spark, sf_dir):
    """left_semi (EXISTS) + left_anti (NOT EXISTS) joins."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").count()
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").count()
    return spark.createDataFrame(
        [(semi, anti)], "n_with_orders long, n_without_orders long"
    )


@q(
    "rel_subquery_avg",
    """
    SELECT c_mktsegment, count(*) AS n_above,
           cast(sum(cast(c_acctbal as decimal(14,2))) as double) AS sum_bal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    GROUP BY 1
    """,
)
def rel_subquery_avg(spark, sf_dir):
    """Scalar subquery (InfluxQL nested-query analog): customers above
    the global mean balance.

    The scalar stays IN the plan: a broadcast crossJoin of the 1-row
    aggregate feeds the filter — one Spark job, no driver-side
    ``first()`` pre-scan blocking plan construction.
    """
    c = load_table(spark, sf_dir, "customer")
    avg_df = c.agg(F.avg("c_acctbal").alias("_avg_bal"))
    return (
        c.crossJoin(F.broadcast(avg_df))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.sum(F.col("c_acctbal").cast("decimal(14,2)")).cast("double").alias("sum_bal"),
        )
    )


@q(
    "rel_rollup",
    """
    SELECT coalesce(l_returnflag, '∅') AS rf, coalesce(l_linestatus, '∅') AS ls,
           count(*) AS n,
           cast(sum(cast(l_quantity as decimal(12,2))) as double) AS qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rel_rollup(spark, sf_dir):
    """ROLLUP grouping sets (free Spark extension beyond Flux/InfluxQL —
    SURVEY.md §2.2.4 notes the reference has none)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("∅")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("∅")).alias("ls"),
            "n",
            "qty",
        )
    )


@q(
    "rel_events_customer_join",
    f"""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             count(*) AS n_events,
             cast(sum(cast(value as decimal(12,2))) as double) AS sum_value
      FROM events GROUP BY 1, 2)
    SELECT c.c_mktsegment, count(*) AS n_user_days,
           cast(sum(cast(d.sum_value as decimal(18,2))) as double) AS total_value
    FROM daily d JOIN customer c ON d.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def rel_events_customer_join(spark, sf_dir):
    """Fact-to-dim enrichment: daily per-user event rollup joined to the
    customer dim (events.user_id ⋈ customer.c_custkey), re-aggregated by
    segment. Dim side broadcasts; the fact aggregates before the join so
    the join input is days×users, not raw events."""
    from ..sources.io import events_points

    ev = events_points(spark, sf_dir)
    c = load_table(spark, sf_dir, "customer")
    daily = (
        ev.groupBy("user_id", F.date_trunc("day", F.col("time")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("f_float").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
    )
    return (
        daily.join(F.broadcast(c), daily.user_id == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_user_days"),
            F.sum(F.col("sum_value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )


@q(
    "rel_supplier_part_agg",
    """
    SELECT p.p_brand, count(DISTINCT l.l_suppkey) AS n_suppliers,
           count(*) AS n_lines,
           cast(sum(cast(l.l_extendedprice as decimal(14,2))) as double) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 10
    GROUP BY 1
    """,
)
def rel_supplier_part_agg(spark, sf_dir):
    """Join + COUNT DISTINCT (exact) + filter pushdown through a dim."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 10)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(14,2)")).cast("double").alias("revenue"),
        )
    )


@q(
    "rel_shipping_priority",
    """
    SELECT l.l_orderkey,
           cast(sum(cast(l.l_extendedprice as decimal(14,2))
                    * (1 - cast(l.l_discount as decimal(4,2)))) as double) AS revenue,
           epoch_ms(o.o_orderdate) AS o_date_ms
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY 1, 3
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def rel_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join (two broadcastable dims into the
    fact), disjoint date predicates pushed to each scan, decimal-exact
    discounted revenue, global top-10 by revenue. The classic join-
    order/pushdown exercise."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01"
    )
    rev = F.col("l_extendedprice").cast("decimal(14,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            # parquet NTZ timestamp → TZ for unix_millis (UTC session)
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("o_date_ms"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@q(
    "rel_top_order_per_segment",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice
    FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
    WHERE rn <= 3
    """,
)
def rel_top_order_per_segment(spark, sf_dir):
    """Window ranking after a dim join: top-3 orders per market
    segment — row_number per partition (no global sort of the fact)."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
    )


@q(
    "rel_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           cast(sum(cast(l.l_extendedprice as decimal(14,2))
                    * (1 - cast(l.l_discount as decimal(4,2)))) as double) AS revenue,
           count(*) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_name <> n2.n_name
    GROUP BY 1, 2, 3
    """,
)
def rel_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: the nation-to-nation trade-flow matrix. Two
    broadcast dims (nation ×2, supplier at small SF), the fact joined
    through orders→customer; cross-nation filter after the dim joins.
    Shuffle only on the two fact-fact joins; everything else broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(14,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year(F.col("l_shipdate").cast("timestamp")).alias("l_year"),
        )
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@q(
    "rel_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           cast(sum(cast(l.l_extendedprice as decimal(14,2))
                    * (1 - cast(l.l_discount as decimal(4,2)))) as double) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def rel_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: who returned the most revenue this year. Date
    + returnflag predicates push to the scans; nation broadcasts;
    global top-20 with an explicit key tie-break so the LIMIT is
    deterministic on both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(14,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )
