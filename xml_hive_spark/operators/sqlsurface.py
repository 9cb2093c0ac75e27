"""Advanced SQL surface: recursive CTEs, LATERAL correlated joins,
null-safe equality, and time-series gap filling.

These are the SQL shapes that separate a full analytics engine from a
SELECT/JOIN/GROUP BY subset — all four run through ``spark.sql`` (the
same Catalyst surface the reference's Hive users would hit) and every
one carries a full DuckDB oracle.

Scale notes (100 TB): the recursion depth is logarithmic in the node
count (each iteration is one co-keyed equi-join); the LATERAL top-n
de-correlates into a ranked window partitioned by the outer key; the
gap fill explodes only (last-first) days per key and fills with a
per-key ordered frame — no global windows, no cartesians.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xml_hive_spark.operators import query, register_views, t, table_bytes


@query(
    "recursive_cte_hierarchy",
    oracle="""
WITH RECURSIVE walk(custkey, node, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT custkey, node // 2, depth + 1
  FROM walk WHERE node > 1
)
SELECT depth AS root_depth, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(min(custkey) AS BIGINT) AS min_custkey,
       CAST(max(custkey) AS BIGINT) AS max_custkey
FROM walk WHERE node <= 1
GROUP BY root_depth
ORDER BY root_depth
""",
    tags=("sql", "recursive-cte", "hierarchy"),
)
def recursive_cte_hierarchy(spark: SparkSession, sf: str) -> DataFrame:
    """WITH RECURSIVE over a synthetic reporting hierarchy (customer k
    reports to k/2 — the implicit binary-heap org chart): walk every
    customer up to the root and histogram the depths.

    Near-identical recursive SQL on both engines (Spark 4's recursive
    CTE support; the one dialect delta is integer division — DuckDB's
    `/` on BIGINT returns DOUBLE, so the oracle uses `//` where Spark
    CASTs). Scale shape: each recursion step is one equi-join of the
    frontier against nothing but itself (pure projection here), depth
    is O(log N) — the classic bounded-iteration transitive walk; the
    final agg is domain-sized (max depth ~ log2 of the key space).

    The walk materializes n·log2(max_key) rows total, which crosses
    Spark's default 1 M recursion-row safety valve at ~60 k customers
    — the r11 10x scale probe hit RECURSION_ROW_LIMIT_EXCEEDED on
    correct code. The limit is a valve, not a plan property, so size
    it to the data: rows ≈ n·depth, with n bounded cheaply by disk
    bytes (≥ ~25 B/row in parquet) and depth by the 64-bit key space."""
    register_views(spark, sf, "customer")
    est_rows = max(1, table_bytes(sf, "customer") // 25)
    spark.conf.set("spark.sql.cteRecursionRowLimit",
                   str(max(1_000_000, est_rows * 64)))
    return spark.sql(
        """
WITH RECURSIVE walk(custkey, node, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT custkey, CAST(node / 2 AS BIGINT), depth + 1
  FROM walk WHERE node > 1
)
SELECT depth AS root_depth, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(min(custkey) AS BIGINT) AS min_custkey,
       CAST(max(custkey) AS BIGINT) AS max_custkey
FROM walk WHERE node <= 1
GROUP BY root_depth
ORDER BY root_depth
"""
    )


@query(
    "lateral_topn_per_group",
    oracle="""
SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) l
WHERE c.c_custkey < 100
ORDER BY c_custkey, o_totalprice DESC, o_orderkey
""",
    tags=("sql", "lateral", "topn"),
)
def lateral_topn_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL join: each customer's top-2 orders by price —
    the "index lookup per outer row" SQL shape. Catalyst de-correlates
    it into a ranked window partitioned by the outer key (no per-row
    re-scan of orders, and no global window); DuckDB executes the same
    text natively. Deterministic via the (price DESC, orderkey) total
    order."""
    register_views(spark, sf, "customer", "orders")
    return spark.sql(
        """
SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) l
WHERE c.c_custkey < 100
ORDER BY c_custkey, o_totalprice DESC, o_orderkey
"""
    )


@query(
    "join_null_safe_eq",
    oracle="""
WITH a AS (
  SELECT c_custkey, nullif(c_nationkey % 5, 0) AS grp FROM customer
),
b AS (
  SELECT s_suppkey, nullif(s_nationkey % 5, 0) AS grp FROM supplier
)
SELECT a.grp AS grp, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(min(a.c_custkey) AS BIGINT) AS min_cust,
       CAST(min(b.s_suppkey) AS BIGINT) AS min_supp
FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp
GROUP BY a.grp
ORDER BY grp NULLS FIRST
""",
    tags=("sql", "join", "null-safe"),
)
def join_null_safe_eq(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equality join (Spark `<=>` ≡ SQL IS NOT DISTINCT FROM):
    NULL keys match each other instead of vanishing — the semantic an
    inner equi-join silently loses. Keys are made nullable with
    nullif() on both engines so the NULL bucket is exercised for real.
    Scale note: `<=>` still plans as a hash join (null-safe equality is
    hashable); the NULL group is ONE key and skews like any hot key —
    salt it if it dominates."""
    a = t(spark, sf, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("grp")
    )
    b = t(spark, sf, "supplier").select(
        "s_suppkey", F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("grp")
    )
    return (
        a.join(b, a["grp"].eqNullSafe(b["grp"]))
        .groupBy(a["grp"].alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min("c_custkey").cast("long").alias("min_cust"),
            F.min("s_suppkey").cast("long").alias("min_supp"),
        )
        .orderBy(F.col("grp").asc_nulls_first())
    )


@query(
    "timeseries_gap_fill",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id, day
),
span AS (
  SELECT user_id,
         unnest(generate_series(min(day), max(day), INTERVAL 1 DAY))
           AS day
  FROM daily GROUP BY user_id
),
joined AS (
  SELECT s.user_id, CAST(s.day AS DATE) AS day, d.cents
  FROM span s LEFT JOIN daily d
    ON d.user_id = s.user_id AND d.day = CAST(s.day AS DATE)
)
SELECT user_id, day,
       CAST(coalesce(cents,
         last_value(cents IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT)
         AS cents_filled,
       cents IS NULL AS was_gap
FROM joined
ORDER BY user_id, day
""",
    tags=("sql", "timeseries", "gap-fill"),
)
def timeseries_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward:
    per user, the daily value series is completed over the user's own
    [first, last] day span (sequence + explode builds the spine) and
    missing days inherit the most recent observed value; `was_gap`
    marks synthesized rows.

    Scale shape: the spine explode is (days-in-span) rows per user —
    output-sized, not corpus-sized; the fill is a per-user ordered
    frame (one shuffle keyed on user_id shared by the spine agg, the
    left join, and the window). LOCF = last(col, ignorenulls) over an
    UNBOUNDED PRECEDING..CURRENT ROW rows frame — identical semantics
    to DuckDB's last_value IGNORE NULLS."""
    from pyspark.sql import Window

    ev = t(spark, sf, "events")
    daily = (
        ev.groupBy(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    span = daily.groupBy("user_id").agg(
        F.expr("sequence(min(day), max(day), interval 1 day)").alias("days")
    )
    spine = span.select("user_id", F.explode("days").alias("day"))
    joined = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.coalesce(F.col("cents"), F.last("cents", ignorenulls=True).over(w))
        .cast("long")
        .alias("cents_filled"),
        F.col("cents").isNull().alias("was_gap"),
    ).orderBy("user_id", "day")


@query(
    "sql_registered_udf",
    oracle="""
SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS tier,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(o_orderkey) AS BIGINT) AS min_orderkey
FROM orders
GROUP BY tier ORDER BY tier
""",
    tags=("sql", "udf", "ddl", "function-registration"),
)
def sql_registered_udf(spark: SparkSession, sf: str) -> DataFrame:
    """SQL-surface function registration — the Spark twin of Hive's
    ``CREATE FUNCTION`` (the reference's users register UDFs into the
    session and call them from HiveQL; SURVEY.md §2.B UDF row):
    a Python function is registered under a SQL name via
    ``spark.udf.register`` and invoked from a plain ``spark.sql``
    query, grouped on its result. The function (price tier = floor of
    totalprice / 50000) is integer-deterministic so the DuckDB oracle
    replicates it in pure SQL and the hash gate checks the registered
    function's values end to end.

    Scale note: a row-at-a-time Python UDF in the hot path is the slow
    path by design (see ``udf_python_scalar`` vs its pandas twin); this
    entry exists for the REGISTRATION surface. The tier expression
    itself would be codegen'd in production (the oracle shows the
    equivalent)."""
    from pyspark.sql.types import LongType

    register_views(spark, sf, "orders")
    spark.udf.register(
        "price_tier", lambda p: int(p // 50000), LongType()
    )
    return spark.sql(
        """
SELECT price_tier(o_totalprice) AS tier,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(o_orderkey) AS BIGINT) AS min_orderkey
FROM orders
GROUP BY tier ORDER BY tier
"""
    )


@query(
    "rls_masked_view",
    oracle="""
SELECT md5(c_name) AS masked_name,
       c_mktsegment,
       CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_band
FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                      WHERE n_regionkey = 1)
""",
    tags=("sql", "governance", "masking", "rls"),
)
def rls_masked_view(spark: SparkSession, sf: str) -> DataFrame:
    """Row-level security + column masking as a governed VIEW — the
    warehouse governance surface (Hive users ship this as views over
    the SerDe tables; SURVEY §2.B delegation): PII masked by
    deterministic hash (md5 of the name — joinable across datasets,
    not reversible), the balance generalized to a $1000 band
    (k-anonymity-style), and rows RESTRICTED to one region via a
    predicate subquery. Consumers query the view; the base table never
    reaches them. The full oracle replicates mask + band + row policy,
    so the governance transform itself is value-checked.

    Scale shape: the view is pure per-row codegen over a scan with the
    region predicate pushed as a broadcast semi-join — governance costs
    nothing at read time beyond the policy predicate."""
    register_views(spark, sf, "customer", "nation")
    spark.sql(
        """
CREATE OR REPLACE TEMPORARY VIEW customer_masked AS
SELECT md5(c_name) AS masked_name,
       c_mktsegment,
       CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_band
FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                      WHERE n_regionkey = 1)
"""
    )
    return spark.sql("SELECT * FROM customer_masked")


@query(
    "hive_script_transform",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
FROM orders
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    tags=("sql", "hive", "transform", "script"),
)
def hive_script_transform(spark: SparkSession, sf: str) -> DataFrame:
    """HiveQL SCRIPT TRANSFORM — the `SELECT TRANSFORM(...) USING
    'cmd'` surface Hive users pipe rows through external programs with
    (the reference's users have this via Hive delegation; Spark runs
    the no-serde mode natively, no Hive installation): every order row
    crosses the process boundary as tab-separated text through
    ``cat`` and is re-parsed, cast, and aggregated — the oracle on the
    source table proves the row→TSV→subprocess→TSV→row boundary is
    lossless.

    Scale shape: the script runs per task (executor-side pipes, no
    driver involvement) — the same distribution contract as any UDF;
    per-row subprocess text IO is the slow path by design (this entry
    exists for the SURFACE, like ``udf_python_scalar``)."""
    register_views(spark, sf, "orders")
    piped = spark.sql(
        """
SELECT TRANSFORM(o_orderkey, o_orderpriority)
USING 'cat' AS (k STRING, prio STRING)
FROM orders
"""
    )
    return (
        piped.select(
            F.col("prio").alias("o_orderpriority"),
            F.col("k").cast("long").alias("k"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("k").cast("long").alias("key_sum"),
        )
        .orderBy("o_orderpriority")
    )
