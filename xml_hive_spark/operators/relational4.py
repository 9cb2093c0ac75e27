"""Tier-B relational surface, part 4: the remaining TPC-H query shapes —
Q7 (bidirectional nation-pair volume), Q8 (market share ratio), Q9
(profit with computed cost), Q11 (group value vs global-threshold
scalar), Q13 (outer-join histogram), Q15 (argmax-by-scalar view), Q19
(disjunctive pushdown predicates).

The driver's tables omit ``partsupp`` and several comment/phone columns
(TESTDATA.md), so Q9/Q11/Q13 bind their reference shapes to available
columns — the decorrelation/plan shape is the point, not catalog trivia.
Determinism follows the repo convention: money sums via decimal-cast
addends (``dsum``), ratios as divisions of bit-identical doubles, no
final rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xml_hive_spark.operators import dsum, query, t


@query(
    "q7_volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)
           AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    tags=("join", "tpch"),
)
def q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7: trade volume between a nation pair, both directions,
    by year. Plan shape: the two nation dims broadcast into the
    supplier/customer sides; the nation-pair disjunction is applied
    AFTER both joins (it spans both sides), while the shipdate range
    pushes into the lineitem scan."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    n1 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    sup = t(spark, sf, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk")
    )
    cust = t(spark, sf, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t(spark, sf, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
WITH all_nations AS (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n1.n_regionkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
)
SELECT o_year,
       CAST(sum(CAST(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0.0 END
                AS DECIMAL(30,6))) AS DOUBLE)
       / CAST(sum(CAST(volume AS DECIMAL(30,6))) AS DOUBLE) AS mkt_share
FROM all_nations
GROUP BY o_year
ORDER BY o_year
""",
    tags=("join", "agg", "tpch"),
)
def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's volume in a part
    segment, by order year. The share is a division of two decimal-sum
    doubles (both order-independent), so the ratio is bit-stable. All
    dims broadcast; the only big shuffles are lineitem→orders and
    orders→customer."""
    n1 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    region = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    cust = (
        t(spark, sf, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("c_rk"))
        .select("c_custkey")
    )
    n2 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    sup = t(spark, sf, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk")
    ).select("s_suppkey", "nation")
    part = t(spark, sf, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t(spark, sf, "lineitem")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("nation"),
        )
        .groupBy("o_year")
        .agg(
            (
                dsum(
                    F.when(F.col("nation") == "NATION_7", F.col("volume")).otherwise(
                        0.0
                    )
                )
                / dsum("volume")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_type_profit",
    oracle="""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     - 0.1 * p_retailprice * l_quantity
                AS DECIMAL(30,6))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
""",
    tags=("join", "agg", "tpch"),
)
def q9_product_type_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9: profit by supplier nation and order year over a part-name
    segment. The driver tables have no partsupp, so supply cost is
    computed as 10% of retail price — same join/agg shape, same
    per-row-arithmetic-then-decimal-sum determinism."""
    part = t(spark, sf, "part").filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    nat = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    sup = t(spark, sf, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("s_nk")
    ).select("s_suppkey", "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        t(spark, sf, "lineitem")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t(spark, sf, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q11_important_stock",
    oracle="""
WITH pv AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(30,6))) AS DOUBLE)
             AS value
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name IN ('NATION_2', 'NATION_12', 'NATION_22')
  GROUP BY l_partkey
)
SELECT l_partkey, value
FROM pv, (SELECT CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) * 0.0001
              AS threshold FROM pv) th
WHERE value > threshold
ORDER BY value DESC, l_partkey
""",
    tags=("agg", "subquery", "tpch"),
)
def q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11: per-part inventory value within a nation group,
    keeping parts above a fraction of the GLOBAL total — an uncorrelated
    scalar aggregate reused against its own grouped input. The per-part
    aggregate is computed once, the 1-row total broadcasts into the
    filter (no second scan of lineitem)."""
    nat = t(spark, sf, "nation").filter(
        F.col("n_name").isin("NATION_2", "NATION_12", "NATION_22")
    )
    sup = t(spark, sf, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    pv = (
        t(spark, sf, "lineitem")
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    th = pv.agg((dsum("value") * F.lit(0.0001)).alias("threshold"))
    return (
        pv.crossJoin(F.broadcast(th))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@query(
    "q13_customer_distribution",
    oracle="""
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    tags=("join", "outer", "agg", "tpch"),
)
def q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13: order-count histogram over ALL customers — the outer
    join keeps zero-order customers (count(o_orderkey) skips the null),
    then a second, much smaller aggregation histograms the counts. Two
    shuffles, each on the natural key; the second input is one row per
    customer, so the histogram shuffle is tiny."""
    cust = t(spark, sf, "customer").select("c_custkey")
    orders = t(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    tags=("join", "subquery", "agg", "tpch"),
)
def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — a
    grouped view consumed twice (once for the argmax scalar, once for
    the equality filter). The revenue aggregate is computed once and
    reused; the 1-row max broadcasts. Equality compares two decimal-sum
    doubles produced by the same pipeline — exact in both engines."""
    rev = (
        t(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(
            F.broadcast(t(spark, sf, "supplier")),
            F.col("s_suppkey") == F.col("supplier_no"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q19_discounted_revenue",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
            AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
    tags=("join", "filter", "tpch"),
)
def q19_discounted_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19: disjunctive brand/size/quantity predicates across the
    join — the classic OR-of-ANDs pushdown test. Catalyst extracts the
    common l_quantity/p_size bounds below the join (seen as
    PushedFilters on both scans) and evaluates the residual disjunction
    after it; part is broadcast."""
    li = t(spark, sf, "lineitem")
    part = t(spark, sf, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@query(
    "agg_percentiles",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS qty_p25,
       quantile_cont(l_quantity, 0.5) AS qty_p50,
       quantile_cont(l_quantity, 0.75) AS qty_p75,
       quantile_cont(l_extendedprice, 0.9) AS price_p90,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT percentiles (Hive's ``percentile`` UDAF surface): linear
    interpolation at (n-1)·q, the same definition as DuckDB
    ``quantile_cont`` — measured bit-identical on this data, so it is
    oracle-checked rather than rows-only like ``approx_percentile``.

    The quartiles come back as SCALAR columns (one ``percentile`` call
    with an array arg, split with ``element_at`` — the sort of each
    group's buffer happens once, not three times); the driver's
    pandas-based canonicalizer can't hash array cells, so arrays stay
    out of oracled results (the array-returning shape lives in
    :func:`agg_percentiles_array` as a rows-only twin).

    Scale note: exact percentiles sort each group's values inside the
    aggregation buffer — fine for bounded groups; at unbounded-group
    100 TB scale the swap is ``approx_percentile`` (t-digest-style
    bounded sketch), the same exact→sketch trade documented for
    count-distinct (SCALE.md)."""
    li = t(spark, sf, "lineitem")
    q = F.expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.element_at(q, 1).alias("qty_p25"),
            F.element_at(q, 2).alias("qty_p50"),
            F.element_at(q, 3).alias("qty_p75"),
            F.expr("percentile(l_extendedprice, 0.9D)").alias("price_p90"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_percentiles_array",
    oracle="""
SELECT l_returnflag,
       to_json(quantile_cont(l_quantity, [0.25, 0.5, 0.75])) AS qty_quartiles,
       quantile_cont(l_extendedprice, 0.9) AS price_p90,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("agg", "percentile"),
)
def agg_percentiles_array(spark: SparkSession, sf: str) -> DataFrame:
    """Array-returning twin of :func:`agg_percentiles` — the natural
    Spark surface (``percentile(col, array(...))`` → ``array<double>``).
    The quartile array is serialized with ``to_json`` into one STRING
    column (the driver's pandas-based canonicalizer cannot hash raw list
    cells — r5's only red row), which also unlocks a full DuckDB value
    oracle via ``to_json(quantile_cont(col, [...]))``.  Both engines
    JSON-render these interpolated quartiles (small magnitudes, .25-step
    fractions — exact in binary, no scientific notation) byte-identically.
    Equality with the scalar variant is pinned in pytest."""
    li = t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.to_json(
                F.expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))")
            ).alias("qty_quartiles"),
            F.expr("percentile(l_extendedprice, 0.9D)").alias("price_p90"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "variant_json_access",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    tags=("json", "variant"),
)
def variant_json_access(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` ingests the JSON once into the binary variant
    encoding and ``variant_get`` path-extracts with a target type —
    the modern replacement for repeated ``get_json_object`` string
    re-parsing (each get_json_object call re-parses the whole string;
    variant parses once and navigates a binary tree). Oracle via
    DuckDB ``json_extract`` on the same paths."""
    from pyspark.sql.functions import parse_json, variant_get

    ev = t(spark, sf, "events")
    k = variant_get(parse_json(F.col("props")), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "window_range_frame",
    oracle="""
SELECT o_custkey, o_orderdate,
       CAST(count(*) OVER w AS BIGINT) AS n_30d,
       CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) OVER w AS DOUBLE)
           AS spend_30d
FROM (
  SELECT o_custkey, o_orderdate, o_totalprice,
         date_diff('day', DATE '1992-01-01', o_orderdate) AS day
  FROM orders
)
WINDOW w AS (PARTITION BY o_custkey ORDER BY day
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderdate
""",
    tags=("window", "range-frame"),
)
def window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """RANGE window frame — the value-based frame type the ROWS-frame
    queries (running_sum, moving_avg) don't exercise: per customer, the
    rolling 30-day order count and spend. RANGE frames include all
    peers of the current order-by value, so same-day orders see
    identical frames and the result is deterministic without a
    tie-break; one shuffle on the partition key, like every keyed
    window."""
    from pyspark.sql import Window

    o = t(spark, sf, "orders").withColumn(
        "day", F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-30, Window.currentRow)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderdate",
            F.count(F.lit(1)).over(w).alias("n_30d"),
            F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
            .over(w)
            .cast("double")
            .alias("spend_30d"),
        )
        .orderBy("o_custkey", "o_orderdate")
    )


@query(
    "window_value_functions",
    oracle="""
SELECT o_orderkey, o_custkey,
       first_value(o_totalprice) OVER w AS first_spend,
       last_value(o_totalprice)  OVER w AS last_spend,
       nth_value(o_totalprice, 2) OVER w AS second_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY o_orderkey
""",
    tags=("window", "value-functions"),
)
def window_value_functions(spark: SparkSession, sf: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit full-
    partition frame — the value-function family lag/lead doesn't cover.
    The frame must be UNBOUNDED on both sides: last_value over the
    default frame (up to current row) is the current row, the classic
    window-frame gotcha both engines share. (o_orderdate, o_orderkey) ordering
    makes every value deterministic under ties."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    o = t(spark, sf, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.first("o_totalprice").over(w).alias("first_spend"),
            F.last("o_totalprice").over(w).alias("last_spend"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_spend"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "explode_outer_empty_arrays",
    oracle=r"""
SELECT lang,
       CAST(count(*) AS BIGINT)   AS n_rows,
       CAST(count(num) AS BIGINT) AS n_nums
FROM (
  SELECT lang,
         unnest(CASE WHEN len(nums) = 0 THEN [NULL] ELSE nums END) AS num
  FROM (
    SELECT lang, regexp_extract_all(text, '[0-9]+', 0) AS nums
    FROM documents
  )
)
GROUP BY lang ORDER BY lang
""",
    tags=("array", "lateral", "outer"),
)
def explode_outer_empty_arrays(spark: SparkSession, sf: str) -> DataFrame:
    """``explode_outer`` — the null-preserving lateral: documents with
    no numeric tokens still produce one (null) row, so the per-language
    row count equals document count plus extra matches, never silently
    dropping empty-array rows the way plain explode does. The oracle
    emulates outer semantics by substituting ``[NULL]`` for empty
    lists before unnest."""
    docs = t(spark, sf, "documents")
    nums = F.expr("regexp_extract_all(text, '[0-9]+', 0)")
    return (
        docs.select("lang", F.explode_outer(nums).alias("num"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("num").alias("n_nums"),
        )
        .orderBy("lang")
    )


@query(
    "agg_grouping_id",
    oracle="""
SELECT coalesce(l_returnflag, '∅') AS rf,
       coalesce(l_linestatus, '∅') AS ls,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, rf, ls
""",
    tags=("agg", "rollup", "grouping"),
)
def agg_grouping_id(spark: SparkSession, sf: str) -> DataFrame:
    """``grouping_id()`` disambiguates rollup subtotal NULLs from data
    NULLs — the bitmask (one bit per rollup column, 1 = aggregated
    away) that makes rollup output machine-consumable. Spark's
    grouping_id() and DuckDB's GROUPING(a, b) compute the same mask."""
    li = t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().alias("gid"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("∅")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("∅")).alias("ls"),
            F.col("gid").cast("bigint"),
            F.col("n").cast("bigint"),
        )
        .orderBy("gid", "rf", "ls")
    )


@query(
    "array_higher_order",
    oracle="""
SELECT doc_id,
       CAST(len(list_filter(ws, w -> length(w) > 4)) AS INTEGER) AS n_long,
       array_to_string(list_slice(list_transform(ws, w -> upper(w)), 1, 3), ',')
           AS first3_upper,
       list_sort(ws)[1] AS first_sorted
FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
ORDER BY doc_id
""",
    tags=("array", "higher-order"),
)
def array_higher_order(spark: SparkSession, sf: str) -> DataFrame:
    """The lambda higher-order functions as a dedicated entry: filter,
    transform, slice, array_sort — all expression-level (no shuffle, no
    Python), the idiomatic way to process repeated XML elements
    in-place instead of explode→aggregate round trips. ASCII word data
    keeps both engines' binary string sort identical."""
    docs = t(spark, sf, "documents")
    ws = F.split(F.col("text"), " ")
    return (
        docs.select(
            "doc_id",
            F.size(F.filter(ws, lambda w: F.length(w) > 4)).alias("n_long"),
            F.array_join(
                F.slice(F.transform(ws, F.upper), 1, 3), ","
            ).alias("first3_upper"),
            F.element_at(F.array_sort(ws), 1).alias("first_sorted"),
        )
        .orderBy("doc_id")
    )


@query("agg_approx_percentiles", tags=("agg", "percentile", "sketch"))
def agg_approx_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """SKETCHED percentiles — the 100 TB swap for :func:`agg_percentiles`
    the exact variant's docstring promises: ``approx_percentile`` keeps a
    bounded quantile sketch per group (merges associatively map-side)
    instead of buffering and sorting every value, so memory per group is
    O(accuracy), not O(rows). accuracy=10000 → rank error ≤ 1/10000.
    Rows-only driver check (sketch internals are engine-specific); the
    error bound vs the exact quartiles is pinned in
    tests/test_operators.py."""
    li = t(spark, sf, "lineitem")
    q = F.expr(
        "approx_percentile(l_quantity, array(0.25D, 0.5D, 0.75D), 10000)"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.element_at(q, 1).alias("qty_p25"),
            F.element_at(q, 2).alias("qty_p50"),
            F.element_at(q, 3).alias("qty_p75"),
            F.expr("approx_percentile(l_extendedprice, 0.9D, 10000)").alias(
                "price_p90"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )
