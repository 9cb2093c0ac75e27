"""Tier-B relational surface, part 3: the remaining TPC-H decorrelation
shapes — Q2 (correlated min subquery), Q21 (EXISTS + NOT-EXISTS
self-joins on the correlation key), Q22 (scalar-average threshold +
anti join).

The driver's tables omit ``partsupp``, ``l_receiptdate``/``l_commitdate``
and ``c_phone`` (TESTDATA.md), so each query keeps its reference
decorrelation SHAPE verbatim but binds it to available columns — the
point is the plan (how Catalyst executes the correlation), not the
catalog trivia. Scale discipline as in relational.py: aggregate before
join where it shrinks the fact side, broadcast only provably-small
sides, no cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xml_hive_spark.operators import dsum, query, t


@query(
    "q2_min_cost_supplier",
    oracle="""
WITH unit AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price
  FROM lineitem
)
SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name,
       u.unit_price AS min_unit_price
FROM part p
JOIN unit u ON u.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = u.l_suppkey
WHERE p.p_size <= 5
  AND u.unit_price = (SELECT min(u2.unit_price) FROM unit u2
                      WHERE u2.l_partkey = p.p_partkey)
ORDER BY p.p_partkey, s.s_suppkey
""",
    tags=("join", "subquery", "tpch"),
)
def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery — for each part, the
    supplier(s) offering the minimum unit price (lineitem stands in for
    the absent partsupp as the part↔supplier bridge).

    Decorrelation: the subquery becomes a per-part MIN aggregate joined
    back on the correlation key — one shuffle on l_partkey for the agg,
    one co-keyed join, instead of re-running the subquery per outer row.
    The equality compares the SAME IEEE division on both sides, so the
    match set is exact in both engines."""
    li = t(spark, sf, "lineitem")
    unit = li.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    min_unit = unit.groupBy("l_partkey").agg(
        F.min("unit_price").alias("min_price")
    )
    part = t(spark, sf, "part").filter(F.col("p_size") <= 5)
    sup = t(spark, sf, "supplier")
    return (
        unit.join(min_unit, "l_partkey")
        .filter(F.col("unit_price") == F.col("min_price"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            F.col("unit_price").alias("min_unit_price"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n.n_name = 'NATION_7'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
""",
    tags=("join", "semi", "anti", "subquery", "tpch"),
)
def q21_waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape: the sole-blame pattern — a supplier's line in a
    multi-supplier order where NO other supplier shares the fault flag.
    (Reference uses receipt-past-commit; the driver tables lack those
    dates, so l_returnflag = 'R' is the fault condition.)

    Decorrelation: EXISTS → left-semi join on (orderkey, suppkey≠);
    NOT EXISTS → left-anti join with the extra flag predicate. Both
    correlate on l_orderkey, so all three lineitem sides shuffle on the
    same key and co-partition — no re-scan per outer row."""
    sup = t(spark, sf, "supplier")
    nat = t(spark, sf, "nation").filter(F.col("n_name") == "NATION_7")
    orders = t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    li = t(spark, sf, "lineitem")

    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.alias("l2")
    l3 = li.filter(F.col("l_returnflag") == "R").alias("l3")

    blamed = (
        l1.join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
    )
    return (
        blamed.join(
            orders, F.col("l1.l_orderkey") == F.col("o_orderkey")
        )
        .join(
            F.broadcast(sup.join(F.broadcast(nat),
                                 F.col("s_nationkey") == F.col("n_nationkey"))),
            F.col("l1.l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) / count(*) AS a
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment AS segment, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
ORDER BY segment
""",
    tags=("join", "anti", "subquery", "tpch"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar-average threshold + NOT
    EXISTS anti join (c_mktsegment stands in for the absent phone
    country code; "has never placed an URGENT order" stands in for "has
    no orders", which is empty in the synthetic data).

    Decorrelation: the scalar average is a 1-row aggregate broadcast
    into the filter (no per-row subquery); NOT EXISTS is a left-anti
    join against orders on the correlation key. The average is a
    decimal sum / count — IEEE division of bit-identical operands, so
    the threshold comparison agrees across engines."""
    cust = t(spark, sf, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum("c_acctbal", 6) / F.count(F.lit(1))).alias("a")
    )
    orders = t(spark, sf, "orders")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("segment")
    )


@query(
    "nested_denormalize_roundtrip",
    oracle="""
SELECT o.o_orderstatus,
       CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       CAST(MAX(per_order.max_lines) AS BIGINT) AS max_lines
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN (
  SELECT l_orderkey, count(*) AS max_lines
  FROM lineitem GROUP BY l_orderkey
) per_order ON per_order.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
ORDER BY o.o_orderstatus
""",
    tags=("nested", "denormalize", "higher-order"),
)
def nested_denormalize_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Nested-data engineering round trip: lineitems are DENORMALIZED
    into an array-of-structs per order (the document-model layout the
    XML reader produces and lakehouses store), per-order metrics are
    computed INSIDE the nested column with higher-order functions
    (``aggregate`` for the quantity fold, ``size`` for the line
    count — no explode, no second shuffle), and the nested results
    aggregate to the same numbers the flat relational oracle computes
    with joins. Round-tripping relational ⇄ nested without moving a
    row twice is the capability that makes the nested layout cheap to
    keep.

    Scale shape: ONE orderkey-keyed shuffle builds the nested column
    (bounded by basket size); the HOF evaluation is per-row codegen;
    the final agg is domain-sized. The flat oracle needs the
    lineitem join TWICE (rows + per-order counts) — the nested form
    reads each lineitem once."""
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    orders = t(spark, sf, "orders").select("o_orderkey", "o_orderstatus")
    nested = (
        li.groupBy("l_orderkey")
        .agg(F.collect_list(F.struct("l_quantity")).alias("lines"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        nested.select(
            "o_orderstatus",
            F.size("lines").alias("n_lines"),
            F.expr(
                "aggregate(lines, 0L, (acc, x) ->"
                " acc + CAST(x.l_quantity AS LONG))"
            ).alias("qty"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("qty").cast("long").alias("total_qty"),
            F.max("n_lines").cast("long").alias("max_lines"),
        )
        .orderBy("o_orderstatus")
    )
