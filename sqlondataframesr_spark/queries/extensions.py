"""Relational operators BEYOND the reference surface.

SURVEY.md §2.6/§2.8 lists what the reference never uses: set
operations, outer/anti joins, grouping sets, window functions,
percentiles. A user migrating from the reference will reach for these
the first week, and Spark has them built in — each gets the same
dual-form (fluent + oracle) treatment as the core six so the coverage
is *checked*, not claimed.

Scale notes are per query below; the common theme: every one of these
lowers to a single keyed shuffle (or none), and the window queries
partition by a key whose group fits an executor at any SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import load_table

RICH_BAL = 9000.0
RECENT = "1998-01-01"


def q7_rollup_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP(priority, status): subtotal lattice in ONE
    pass — Spark expands grouping sets map-side; no extra shuffle vs a
    plain two-key aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderpriority", "o_orderstatus")
    )


Q7_ORACLE = """
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
ORDER BY o_orderpriority, o_orderstatus
"""


def q8_union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two differently-shaped relations projected to a
    common schema — concatenation of scans, zero shuffle."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.lit("customer").alias("role"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("role"),
        F.round("s_acctbal", 2).alias("acctbal"),
    )
    return cust.unionByName(supp).orderBy("role", "name")


Q8_ORACLE = """
SELECT c_name AS name, 'customer' AS role, ROUND(c_acctbal, 2) AS acctbal FROM customer
UNION ALL
SELECT s_name AS name, 'supplier' AS role, ROUND(s_acctbal, 2) AS acctbal FROM supplier
ORDER BY role, name
"""


def q9_anti_recent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with NO order since 1998-01-01 — left ANTI join
    (Catalyst's lowering of NOT EXISTS). One shuffle on custkey; the
    filter on orders is pushed to its scan first."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(RECENT)
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


Q9_ORACLE = f"""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '{RECENT}'
)
ORDER BY c_custkey
"""


def q10_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend — windowed SUM ordered by
    (o_orderdate, o_orderkey) (the key tie-break makes the cumulative
    value deterministic). One shuffle on custkey; each customer's
    history sorts within a partition."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


Q10_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS UNBOUNDED PRECEDING), 2) AS running_total
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


def q11_quantity_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles of quantity per return flag
    (percentile = sort-based exact; for 100 TB dashboards swap in
    approx_percentile — t-digest, mergeable, one pass). Quantity is
    integral, so quartile interpolation is dyadic (x.0/.25/.5/.75)
    and bit-exact across engines — cent-valued prices land on .005
    rounding ties that SQL dialects break differently."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.25)").alias("p25"),
            F.expr("percentile(l_quantity, 0.50)").alias("p50"),
            F.expr("percentile(l_quantity, 0.75)").alias("p75"),
        )
        .orderBy("l_returnflag")
    )


Q11_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.50) AS p50,
       quantile_cont(l_quantity, 0.75) AS p75
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q12_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations having BOTH a rich customer and a rich supplier —
    INTERSECT (distinct semantics; lowers to an aggregate + semi
    join)."""
    rich_c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > RICH_BAL)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    rich_s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > RICH_BAL)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return rich_c.intersect(rich_s).orderBy("nationkey")


Q12_ORACLE = f"""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > {RICH_BAL}
INTERSECT
SELECT s_nationkey FROM supplier WHERE s_acctbal > {RICH_BAL}
ORDER BY nationkey
"""


def q13_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations with a rich customer but NO rich supplier — EXCEPT."""
    rich_c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > RICH_BAL)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    rich_s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > RICH_BAL)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    # subtract == SQL EXCEPT (distinct semantics); exceptAll would be
    # bag-difference and leak duplicated left values past the filter
    return rich_c.subtract(rich_s).orderBy("nationkey")


Q13_ORACLE = f"""
SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > {RICH_BAL}
EXCEPT
SELECT s_nationkey FROM supplier WHERE s_acctbal > {RICH_BAL}
ORDER BY nationkey
"""


QUERIES = {
    "q7_rollup_order_counts": q7_rollup_order_counts,
    "q8_union_all_parties": q8_union_all_parties,
    "q9_anti_recent_customers": q9_anti_recent_customers,
    "q10_running_totals": q10_running_totals,
    "q11_quantity_quantiles": q11_quantity_quantiles,
    "q12_set_intersect": q12_set_intersect,
    "q13_set_except": q13_set_except,
}

ORACLES = {
    "q7_rollup_order_counts": Q7_ORACLE,
    "q8_union_all_parties": Q8_ORACLE,
    "q9_anti_recent_customers": Q9_ORACLE,
    "q10_running_totals": Q10_ORACLE,
    "q11_quantity_quantiles": Q11_ORACLE,
    "q12_set_intersect": Q12_ORACLE,
    "q13_set_except": Q13_ORACLE,
}

SPARK_SQL: dict[str, str] = {}
