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
