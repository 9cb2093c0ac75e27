"""Tier-B relational surface, part 2: subquery shapes (EXISTS, scalar,
semi-chains, HAVING-feeds-join), pivot/unpivot, conditional and
JSON-construction functions, ALL-variant set ops, sampling, SORT BY.

Same scale discipline as relational.py: aggregate before join where the
agg shrinks the fact table, broadcast only provably-small sides, express
everything declaratively for Catalyst.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (resolves pandas_udf string hints)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xml_hive_spark.operators import dsum, query, t

# ----------------------------------------------------- subquery shapes


@query(
    "q4_priority_exists",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 45 DAY)
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY o_orderpriority
""",
    tags=("join", "semi", "subquery", "tpch"),
)
def q4_priority_exists(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS → left-semi join on the
    correlation key + range predicate."""
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf, "lineitem")
    return (
        orders.join(
            li,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q12_priority_lines",
    oracle="""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
""",
    tags=("join", "agg", "case", "tpch"),
)
def q12_priority_lines(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape: CASE-conditional aggregation over a join."""
    orders = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_effect",
    oracle="""
SELECT 100.0 * CAST(sum(CAST(CASE WHEN p_type = 'ECONOMY'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END
                 AS DECIMAL(30,6))) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(30,6))) AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01'
  AND l_shipdate <  TIMESTAMP '1997-07-01'
""",
    tags=("join", "agg", "case", "tpch"),
)
def q14_promo_effect(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of conditional to total aggregate. part is
    broadcast (small dim at any SF relative to lineitem)."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = F.broadcast(t(spark, sf, "part"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg((F.lit(100.0) * dsum(promo) / dsum(rev)).alias("promo_revenue_pct"))
    )


@query(
    "q16_supplier_variety",
    oracle="""
SELECT p_brand, p_type,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size >= 20
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
""",
    tags=("join", "anti", "distinct", "tpch"),
)
def q16_supplier_variety(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN exclusion subquery (anti join) + distinct
    count over a join."""
    li = t(spark, sf, "lineitem")
    part = F.broadcast(t(spark, sf, "part").filter(F.col("p_size") >= 20))
    bad_supp = t(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
WITH part_avg AS (
  SELECT l_partkey AS pk,
         0.5 * (CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / count(*))
             AS half_avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0
           AS avg_yearly
FROM lineitem JOIN part_avg ON l_partkey = pk
WHERE l_quantity < half_avg_qty
""",
    tags=("join", "agg", "subquery", "tpch"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average) as an
    aggregate-then-self-join — the agg shrinks lineitem to part grain
    before the join, the scalable decorrelation."""
    li = t(spark, sf, "lineitem")
    from xml_hive_spark.operators import davg

    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.5) * davg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(part_avg, li.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


@query(
    "q20_heavy_supplier_chain",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > 3000
)
""",
    tags=("join", "semi", "subquery", "tpch"),
)
def q20_heavy_supplier_chain(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries → semi-join chain with an
    aggregate in the middle."""
    part = t(spark, sf, "part").filter(F.col("p_size") >= 40).select("p_partkey")
    li = t(spark, sf, "lineitem")
    heavy = (
        li.join(part, li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 3000)
        .select("l_suppkey")
    )
    supp = t(spark, sf, "supplier")
    return supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


@query(
    "scalar_subquery_ratio",
    oracle="""
SELECT o_orderkey,
       o_totalprice / (SELECT max(o_totalprice) FROM orders) AS price_ratio
FROM orders WHERE o_orderkey < 500
""",
    tags=("subquery", "scalar"),
)
def scalar_subquery_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """Uncorrelated scalar subquery → broadcast single-row cross join
    (max is deterministic; the division of identical doubles is exact)."""
    orders = t(spark, sf, "orders")
    mx = F.broadcast(orders.agg(F.max("o_totalprice").alias("mx")))
    return (
        orders.filter(F.col("o_orderkey") < 500)
        .crossJoin(mx)
        .select(
            "o_orderkey", (F.col("o_totalprice") / F.col("mx")).alias("price_ratio")
        )
    )


# ------------------------------------------------------- pivot / unpivot


@query(
    "pivot_status_counts",
    oracle="""
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS P
FROM orders GROUP BY o_orderpriority
""",
    tags=("pivot", "agg"),
)
def pivot_status_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot (explicit value list — at scale always enumerate pivot values;
    inference does an extra distinct pass over the fact table)."""
    orders = t(spark, sf, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
    )


@query(
    "unpivot_part_metrics",
    oracle="""
SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
UNION ALL
SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS val FROM part
""",
    tags=("unpivot",),
)
def unpivot_part_metrics(spark: SparkSession, sf: str) -> DataFrame:
    part = t(spark, sf, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "metric", "val")


# ------------------------------------------------- conditional / json fns


@query(
    "conditional_functions",
    oracle="""
SELECT l_orderkey, l_linenumber,
       coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_flag,
       greatest(l_tax, l_discount)             AS max_rate,
       least(l_tax, l_discount)                AS min_rate,
       CASE WHEN l_quantity >= 40 THEN 'bulk'
            WHEN l_quantity >= 10 THEN 'mid' ELSE 'small' END AS qty_band
FROM lineitem WHERE l_orderkey < 300
""",
    tags=("functions", "conditional"),
)
def conditional_functions(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif("l_discount", F.lit(0.0)), F.lit(-1.0)).alias(
            "disc_or_flag"
        ),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "mid")
        .otherwise("small")
        .alias("qty_band"),
    )


@query(
    "string_predicates",
    oracle="""
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_type LIKE '%ECON%'
  AND starts_with(p_brand, 'Brand#1')
  AND contains(p_name, ' ')
  AND regexp_matches(p_name, '^[a-z]+ [a-z]+$')
""",
    tags=("functions", "string", "filter"),
)
def string_predicates(spark: SparkSession, sf: str) -> DataFrame:
    """LIKE / prefix / contains / regexp predicates (Hive WHERE-clause
    string surface) — all pushable or codegen'd."""
    part = t(spark, sf, "part")
    return part.filter(
        F.col("p_type").like("%ECON%")
        & F.col("p_brand").startswith("Brand#1")
        & F.col("p_name").contains(" ")
        & F.col("p_name").rlike("^[a-z]+ [a-z]+$")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "json_construction",
    oracle="""
SELECT c_custkey,
       to_json(struct_pack(cust := c_name, seg := c_mktsegment,
                           nat := c_nationkey)) AS payload
FROM customer WHERE c_custkey < 50
""",
    tags=("functions", "json"),
)
def json_construction(spark: SparkSession, sf: str) -> DataFrame:
    """Row → JSON document construction (to_json over a struct) — the
    export shape for feeding JSON consumers."""
    cust = t(spark, sf, "customer").filter(F.col("c_custkey") < 50)
    return cust.select(
        "c_custkey",
        F.to_json(
            F.struct(
                F.col("c_name").alias("cust"),
                F.col("c_mktsegment").alias("seg"),
                F.col("c_nationkey").alias("nat"),
            )
        ).alias("payload"),
    )


# --------------------------------------------------------- set ops (ALL)


@query(
    "set_intersect_all",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
INTERSECT ALL
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
""",
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return r.intersectAll(a)


@query(
    "set_except_all",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
EXCEPT ALL
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
""",
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return r.exceptAll(a)


# ------------------------------------------------------ sampling / SORT BY


@query(
    "sample_deterministic",
    oracle="""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_sampled
FROM lineitem
WHERE CAST('0x' || substr(md5('42|' || CAST(l_orderkey * 8 + l_linenumber
                                             AS VARCHAR)), 1, 12)
           AS BIGINT) < 28147497671065
GROUP BY l_returnflag
""",
    tags=("sample",),
)
def sample_deterministic(spark: SparkSession, sf: str) -> DataFrame:
    """Seeded Bernoulli sample at fraction 0.1 (TABLESAMPLE semantics),
    made ENGINE-PORTABLE (r9 rows-only conversion): admit a row iff the
    first 48 md5 bits of '<seed>|<row key>' fall below fraction * 2^48.
    Spark's native ``df.sample(seed=)`` gives the same statistical
    contract but an engine-specific RNG stream, which forced a
    rows-only check; the md5 threshold is the SAME sample in any engine
    with md5 — so the driver now hash-checks the realized sample, not
    just its shape. Still a pure scan-level filter: embarrassingly
    parallel, no shuffle before the aggregation, and the sampled subset
    is REPRODUCIBLE across engines/cluster sizes — the property a
    training-data ablation actually needs (native .sample determinism
    per engine is still pinned in tests). Row key = l_orderkey*8 +
    l_linenumber (injective: l_linenumber is 1-7)."""
    li = t(spark, sf, "lineitem")
    frac_threshold = (1 << 48) // 10  # fraction 0.1 of the 48-bit space
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("42|"),
                    (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast(
                        "string"
                    ),
                ).cast("binary")
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    return (
        li.filter(h < F.lit(frac_threshold))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


@query(
    "sort_within_partitions",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey
FROM lineitem WHERE l_orderkey < 1000
""",
    tags=("sort",),
)
def sort_within_partitions(spark: SparkSession, sf: str) -> DataFrame:
    """HiveQL SORT BY ≙ sortWithinPartitions: per-partition order without a
    global shuffle (the cheap pre-step for downstream merge consumers).
    Row SET is order-insensitive-identical to the plain projection, which
    is what the oracle checks."""
    li = t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.sortWithinPartitions("l_orderkey", "l_linenumber").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )


@query(
    "apply_in_pandas_centered",
    oracle="""
WITH m AS (
  SELECT c_nationkey,
         CAST(sum(CAST(floor(c_acctbal * 1048576.0) AS BIGINT)) AS BIGINT)
             / 1048576.0 / count(*) AS mean_bal
  FROM customer GROUP BY c_nationkey
)
SELECT c_custkey, c_nationkey, c_acctbal - mean_bal AS centered_bal
FROM customer JOIN m USING (c_nationkey)
""",
    tags=("udf", "pandas", "udtf"),
)
def apply_in_pandas_centered(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas — the Hive UDTF surface):
    per-nation balance centering, whole group as one Arrow batch.

    Determinism: the group mean quantizes addends with floor(x * 2^20)
    (power-of-two scaling is IEEE-exact, integer sums are associative), so
    the mean — and therefore the subtraction — is bit-identical across
    engines and row arrival orders."""
    import math

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        q = [math.floor(x * 1048576.0) for x in pdf["c_acctbal"]]
        mean = sum(q) / 1048576.0 / len(pdf)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_nationkey": pdf["c_nationkey"],
                "centered_bal": pdf["c_acctbal"] - mean,
            }
        )

    cust = t(spark, sf, "customer")
    return cust.groupBy("c_nationkey").applyInPandas(
        center, schema="c_custkey long, c_nationkey int, centered_bal double"
    )


@query(
    "from_json_struct",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_parsed,
       CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket
FROM events WHERE event_id < 2000
""",
    tags=("functions", "json"),
)
def from_json_struct(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-directed JSON parsing (``from_json`` → typed struct, then
    dotted access) — the typed cousin of get_json_object."""
    ev = t(spark, sf, "events").filter(F.col("event_id") < 2000)
    parsed = ev.select(
        "event_id", F.from_json("props", "k INT").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_parsed"),
        (F.col("p.k") % 10).alias("k_bucket"),
    )


@query(
    "map_functions",
    oracle="""
SELECT p_partkey,
       2                                   AS n_keys,
       p_brand                             AS brand_val,
       upper(p_type)                       AS type_val
FROM part WHERE p_partkey < 100
""",
    tags=("functions", "map"),
)
def map_functions(spark: SparkSession, sf: str) -> DataFrame:
    """MapType construction + access (Hive str_to_map/map surface; the
    reference has no map type — SURVEY.md §1.2 — but our engine exposes
    Spark's). The oracle validates the values read back out of the map."""
    p = t(spark, sf, "part").filter(F.col("p_partkey") < 100)
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"),
        F.lit("type"), F.upper("p_type"),
    )
    return p.select(
        "p_partkey",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "brand").alias("brand_val"),
        F.element_at(m, "type").alias("type_val"),
    )


@query(
    "date_arithmetic",
    oracle="""
SELECT o_orderkey,
       CAST(last_day(o_orderdate) AS DATE)          AS month_end,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
       CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
       dayofweek(o_orderdate)                        AS dow
FROM orders WHERE o_orderkey < 2000
""",
    tags=("functions", "date"),
)
def date_arithmetic(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar arithmetic: month-end, add-months, week truncation,
    day-of-week (note DuckDB dayofweek is 0=Sunday vs Spark 1=Sunday —
    normalized here)."""
    o = t(spark, sf, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months(F.col("o_orderdate").cast("date"), 3).alias("plus_3m"),
        F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
    )


@query(
    "salted_join_agg",
    oracle="""
SELECT o_orderpriority, count(*) AS n_lines,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    tags=("join", "skew"),
)
def salted_join_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Salted equi-join (static skew mitigation, n_salts=8): the fact side
    is salted, the dimension side replicated, join key becomes
    (key, salt) — a hot orderkey spreads over 8 tasks. The oracle is the
    PLAIN join: salting must be result-invariant, which is exactly what
    the driver check proves."""
    from xml_hive_spark.plans.skew import salted_join

    li = t(spark, sf, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(li, orders, "l_orderkey", "o_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum("l_extendedprice").alias("sum_price"),
    )
