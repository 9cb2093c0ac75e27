"""Warehouse maintenance operators: SCD2 MERGE and engine-portable
deterministic sampling.

The reference delivers its relational surface by Hive delegation
(SURVEY.md §2.B) and HiveQL ships MERGE/TABLESAMPLE; Spark SQL without a
lakehouse format has neither, so both are expressed here as first-class
DataFrame compositions — the capability a reference user would expect,
re-derived Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xml_hive_spark.operators import query, t


@query(
    "scd2_merge",
    oracle="""
WITH dim AS (
  SELECT c_custkey AS cust_id, c_acctbal AS tracked_val,
         DATE '1992-01-01' AS effective_from,
         CAST(NULL AS DATE) AS effective_to, TRUE AS is_current
  FROM customer WHERE c_custkey < 100
),
upd AS (
  SELECT o_custkey AS cust_id, o_totalprice AS new_val,
         CAST(o_orderdate AS DATE) AS eff_date
  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01')
  WHERE rn = 1
)
SELECT d.cust_id, d.tracked_val, d.effective_from,
       CASE WHEN u.cust_id IS NOT NULL AND u.new_val <> d.tracked_val
            THEN u.eff_date ELSE d.effective_to END AS effective_to,
       CASE WHEN u.cust_id IS NOT NULL AND u.new_val <> d.tracked_val
            THEN FALSE ELSE d.is_current END AS is_current
FROM dim d LEFT JOIN upd u USING (cust_id)
UNION ALL
SELECT u.cust_id, u.new_val AS tracked_val, u.eff_date AS effective_from,
       CAST(NULL AS DATE) AS effective_to, TRUE AS is_current
FROM upd u LEFT JOIN dim d USING (cust_id)
WHERE d.cust_id IS NULL OR u.new_val <> d.tracked_val
""",
    tags=("merge", "scd2", "warehouse"),
)
def scd2_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Slowly-changing-dimension type-2 MERGE: apply an update batch to a
    versioned dimension — close out changed current rows (stamp
    ``effective_to``, clear ``is_current``), open a new current version
    per changed key, insert brand-new keys, pass unchanged rows through.

    Inputs are derived deterministically from the driver tables: the
    dimension is customers < 100 as an open 1992 version; the update
    batch is each customer's latest pre-1997 order (latest by order
    date, order key as tie-break), its total price standing in as the
    tracked attribute. Keys ≥ 100 exercise the insert branch; keys with
    no pre-1997 order exercise pass-through.

    ONE-PASS plan: a single full-outer join on the dimension key, then
    every MERGE branch is a conditional row-expansion (array-of-structs
    → explode) over the join output — no second join, no re-scan of
    either side, exactly one key shuffle each for dim and updates (the
    update window rides the same hash partitioning). This is how MERGE
    scales: Delta/Iceberg MERGE is the same co-keyed outer join
    underneath. The double-valued tracked attribute passes through both
    engines unmodified (no arithmetic), so the DuckDB value hash is
    exact."""
    dim = (
        t(spark, sf, "customer")
        .filter(F.col("c_custkey") < 100)
        .select(
            F.col("c_custkey").alias("cust_id"),
            F.col("c_acctbal").alias("tracked_val"),
            F.to_date(F.lit("1992-01-01")).alias("effective_from"),
            F.lit(None).cast("date").alias("effective_to"),
            F.lit(True).alias("is_current"),
        )
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    upd = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("cust_id"),
            F.col("o_totalprice").alias("new_val"),
            F.col("o_orderdate").cast("date").alias("eff_date"),
        )
    )

    j = dim.join(upd, "cust_id", "full_outer")
    matched = F.col("new_val").isNotNull() & F.col("tracked_val").isNotNull()
    changed = matched & (F.col("new_val") != F.col("tracked_val"))
    insert = F.col("tracked_val").isNull()  # right-only: brand-new key

    old_row = F.struct(
        F.col("tracked_val").alias("tracked_val"),
        F.col("effective_from").alias("effective_from"),
        F.when(changed, F.col("eff_date"))
        .otherwise(F.col("effective_to"))
        .alias("effective_to"),
        F.when(changed, F.lit(False))
        .otherwise(F.col("is_current"))
        .alias("is_current"),
    )
    new_row = F.struct(
        F.col("new_val").alias("tracked_val"),
        F.col("eff_date").alias("effective_from"),
        F.lit(None).cast("date").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    rows = (
        F.when(changed, F.array(old_row, new_row))
        .when(insert, F.array(new_row))
        .otherwise(F.array(old_row))  # unmatched-left or matched-unchanged
    )
    return j.select("cust_id", F.explode(rows).alias("r")).select(
        "cust_id", "r.tracked_val", "r.effective_from", "r.effective_to",
        "r.is_current"
    )


@query(
    "sample_hash_bucket",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 4) < '199a'
""",
    tags=("sampling", "hash"),
)
def sample_hash_bucket(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic ~10 % sample by key hash — the distributed sampling
    shape that actually ships: ``md5(key)`` prefix compared against a
    threshold ('199a'₁₆/10000₁₆ ≈ 10.0 %), so membership is a pure
    function of the key. Unlike ``rand()``-Bernoulli (per-task RNG:
    different rows per run, per partition layout, per engine) the same
    rows are selected on every run, on every engine, at every
    parallelism — which is what makes samples joinable across pipeline
    stages and auditable cross-engine (this oracle IS the cross-engine
    proof: both engines lowercase-hex md5 the same key bytes). The
    predicate is embarrassingly parallel — evaluated at the scan, no
    shuffle, no coordination; at 100 TB a sample is a filter, never a
    collect. Spark's own ``df.sample`` stays available for seeded
    Bernoulli (``sample_deterministic``); this is the portable variant."""
    return (
        t(spark, sf, "orders")
        .filter(
            F.substring(
                F.md5(F.col("o_orderkey").cast("string").cast("binary")), 1, 4
            )
            < "199a"
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "sample_weighted_poisson",
    oracle="""
WITH w AS (
  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
    AS w_sum
  FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders, w
WHERE CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12)
                AS BIGINT) AS DOUBLE) * w.w_sum
      < 100.0 * o_totalprice * 281474976710656.0
""",
    tags=("sampling", "weighted", "hash"),
)
def sample_weighted_poisson(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic WEIGHTED Poisson sampling (expected k=100 rows,
    inclusion probability ∝ o_totalprice): item i is kept iff
    u_i < k·w_i / W, with u_i a 48-bit md5-derived uniform — the
    importance-sampling primitive of pipeline auditing (sample heavy
    orders more) with ``sample_hash_bucket``'s portability contract:
    membership is a pure function of the key, identical on every run,
    engine, and parallelism. The comparison is written as
    u48 · W < k · w · 2^48 with W the DECIMAL-summed (exact,
    associative) total weight, the same operand association on both
    engines — every multiply is IEEE-identical, so the oracle IS the
    cross-engine proof. Items with k·w > W are always kept (their
    inclusion probability caps at 1), the standard Poisson-sampling
    boundary.

    Scale shape: one scalar aggregate (W) broadcast into a scan-level
    filter — no shuffle, no coordination, no collect of data rows; at
    100 TB the sample is a filter pass exactly like the uniform
    variant."""
    orders = t(spark, sf, "orders")
    w_sum = orders.agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
        .cast("double")
        .alias("w_sum")
    )
    u48 = F.conv(
        F.substring(
            F.md5(F.col("o_orderkey").cast("string").cast("binary")), 1, 12
        ),
        16,
        10,
    ).cast("long")
    return (
        orders.crossJoin(F.broadcast(w_sum))
        .filter(
            u48.cast("double") * F.col("w_sum")
            < F.lit(100.0) * F.col("o_totalprice") * F.lit(281474976710656.0)
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "dq_expectations",
    oracle="""
SELECT 'orders_null_custkey' AS rule,
       CAST(count(*) AS BIGINT) AS violations
FROM orders WHERE o_custkey IS NULL
UNION ALL
SELECT 'orders_orphan_custkey',
       CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS (
  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem_nonpositive_price',
       CAST(count(*) AS BIGINT)
FROM lineitem WHERE l_extendedprice <= 0
UNION ALL
SELECT 'orders_duplicate_orderkey',
       CAST(count(*) AS BIGINT)
FROM (SELECT o_orderkey FROM orders
      GROUP BY o_orderkey HAVING count(*) > 1)
UNION ALL
SELECT 'lineitem_ship_before_order',
       CAST(count(*) AS BIGINT)
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate < o.o_orderdate
UNION ALL
SELECT 'lineitem_discount_out_of_range',
       CAST(count(*) AS BIGINT)
FROM lineitem WHERE l_discount < 0 OR l_discount > 1
""",
    tags=("quality", "dq", "warehouse"),
)
def dq_expectations(spark: SparkSession, sf: str) -> DataFrame:
    """Data-quality expectation suite (Deequ/Great-Expectations shape):
    six declarative rules — null check, referential integrity (orphan
    foreign keys via anti join, never a per-row subquery), domain range,
    uniqueness, and a cross-table temporal invariant — each reduced to a
    single violation COUNT and unioned into one report.

    Scale shape: every rule is a filtered partial+final count (grouping
    cardinality 1) or an anti-join/HAVING aggregate — nothing
    materializes violating rows; the report is six numbers regardless of
    table size, and all six scans prune to the columns each rule
    touches. This is the pre-ingestion gate a 100 TB pipeline runs
    before promoting a batch; the DuckDB oracle recomputes every count
    exactly."""
    orders = t(spark, sf, "orders")
    cust = t(spark, sf, "customer")
    li = t(spark, sf, "lineitem")

    def one(rule: str, cnt_df: DataFrame) -> DataFrame:
        return cnt_df.select(
            F.lit(rule).alias("rule"),
            F.count(F.lit(1)).cast("bigint").alias("violations"),
        )

    checks = [
        one("orders_null_custkey",
            orders.filter(F.col("o_custkey").isNull())),
        one("orders_orphan_custkey",
            orders.join(cust, orders.o_custkey == cust.c_custkey,
                        "left_anti")),
        one("lineitem_nonpositive_price",
            li.filter(F.col("l_extendedprice") <= 0)),
        one("lineitem_ship_before_order",
            li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
                F.col("l_shipdate") < F.col("o_orderdate"))),
        one("lineitem_discount_out_of_range",
            li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1))),
    ]
    dup = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    out = one("orders_duplicate_orderkey", dup)
    res = checks[0]
    for c in checks[1:] + [out]:
        res = res.unionAll(c)
    return res


@query(
    "scd2_point_in_time_join",
    oracle="""
WITH dim AS (
  SELECT c_custkey AS cust_id, c_acctbal AS tracked_val,
         DATE '1992-01-01' AS effective_from,
         CAST(NULL AS DATE) AS effective_to, TRUE AS is_current
  FROM customer WHERE c_custkey < 100
),
upd AS (
  SELECT o_custkey AS cust_id, o_totalprice AS new_val,
         CAST(o_orderdate AS DATE) AS eff_date
  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01')
  WHERE rn = 1
),
scd AS (
  SELECT d.cust_id, d.tracked_val, d.effective_from,
         CASE WHEN u.cust_id IS NOT NULL AND u.new_val <> d.tracked_val
              THEN u.eff_date ELSE d.effective_to END AS effective_to
  FROM dim d LEFT JOIN upd u USING (cust_id)
  UNION ALL
  SELECT u.cust_id, u.new_val, u.eff_date, CAST(NULL AS DATE)
  FROM upd u LEFT JOIN dim d USING (cust_id)
  WHERE d.cust_id IS NULL OR u.new_val <> d.tracked_val
)
SELECT o.o_orderkey, s.cust_id, s.tracked_val AS val_at_order,
       s.effective_from AS version_from
FROM orders o JOIN scd s
  ON s.cust_id = o.o_custkey
 AND CAST(o.o_orderdate AS DATE) >= s.effective_from
 AND (s.effective_to IS NULL
      OR CAST(o.o_orderdate AS DATE) < s.effective_to)
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
""",
    tags=("merge", "scd2", "asof", "warehouse"),
)
def scd2_point_in_time_join(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time (as-of) fact→dimension join — the query SCD2 exists
    FOR: every post-1997 order is joined to the dimension VERSION that
    was valid on its order date, so a fact never sees attribute values
    from its future (the classic training-data leakage bug that a
    latest-version join silently commits).

    Composes directly on :func:`scd2_merge`'s output. Plan shape: an
    EQUI-join on the dimension key carries the work; the effective-range
    predicate rides the same hash join as a post-join filter (version
    ranges PARTITION time per key, so each fact matches at most one
    row — no fan-out, no de-dup pass, no theta join). At 100 TB this is
    one co-keyed shuffle of facts against a dimension that is small per
    key regardless of history depth."""
    dim = scd2_merge(spark, sf).select(
        "cust_id", "tracked_val", "effective_from", "effective_to"
    )
    orders = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .select(
            "o_orderkey",
            F.col("o_custkey").alias("cust_id"),
            F.col("o_orderdate").cast("date").alias("od"),
        )
    )
    return (
        orders.join(dim, "cust_id")
        .filter(
            (F.col("od") >= F.col("effective_from"))
            & (
                F.col("effective_to").isNull()
                | (F.col("od") < F.col("effective_to"))
            )
        )
        .select(
            "o_orderkey",
            "cust_id",
            F.col("tracked_val").alias("val_at_order"),
            F.col("effective_from").alias("version_from"),
        )
    )


@query(
    "cdc_apply_changes",
    oracle="""
WITH snap AS (
  SELECT c_custkey AS id, c_name AS name, c_acctbal AS bal
  FROM customer WHERE c_custkey <= 1000
),
cdc AS (
  -- deterministic change batch derived from orders: the latest
  -- pre-1996 order per customer drives an upsert (D for keys divisible
  -- by 10, U otherwise); keys > 1000 with orders become inserts
  SELECT o_custkey AS id,
         CASE WHEN o_custkey % 10 = 0 THEN 'D'
              WHEN o_custkey <= 1000 THEN 'U' ELSE 'I' END AS op,
         'cdc-' || CAST(o_orderkey AS VARCHAR) AS name,
         o_totalprice AS bal
  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01')
  WHERE rn = 1
)
SELECT s.id, coalesce(c.name, s.name) AS name,
       coalesce(c.bal, s.bal) AS bal
FROM snap s LEFT JOIN cdc c USING (id)
WHERE c.op IS NULL OR c.op = 'U'
UNION ALL
SELECT c.id, c.name, c.bal
FROM cdc c LEFT JOIN snap s USING (id)
WHERE c.op = 'I' AND s.id IS NULL
""",
    tags=("cdc", "merge", "warehouse"),
)
def cdc_apply_changes(spark: SparkSession, sf: str) -> DataFrame:
    """Change-data-capture APPLY: merge an (op, key, values) change
    batch — I/U/D per key — into a snapshot in ONE co-keyed pass:
    deletes drop the row, updates overwrite in place, inserts add new
    keys, untouched rows pass through. This is the ingestion half of
    the lakehouse MERGE family (``scd2_merge`` keeps history; CDC apply
    keeps only current state — both are one full/left outer join plus
    conditional projection, no row explosion).

    The change batch derives deterministically from orders (latest
    pre-1996 order per customer; op by key arithmetic) so the oracle
    reconstructs it exactly. Scale shape: snapshot and batch shuffle
    once on the key; at 100 TB the batch side is typically
    broadcast-sized and AQE demotes the shuffle — either way a single
    join, never a per-row driver loop."""
    snap = (
        t(spark, sf, "customer")
        .filter(F.col("c_custkey") <= 1000)
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("bal"),
        )
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    cdc = (
        t(spark, sf, "orders")
        .filter(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("id"),
            F.when(F.col("o_custkey") % 10 == 0, "D")
            .when(F.col("o_custkey") <= 1000, "U")
            .otherwise("I")
            .alias("op"),
            F.concat(F.lit("cdc-"), F.col("o_orderkey").cast("string"))
            .alias("name"),
            F.col("o_totalprice").alias("bal"),
        )
    )
    # ONE co-keyed full-outer join covers every branch (scd2_merge's
    # plan discipline): snap-only → pass-through; matched U → overwrite;
    # matched D (or a matched I, which this batch derivation never
    # produces) → drop; cdc-only I → insert; cdc-only U/D → no-op.
    c = cdc.select(
        F.col("id").alias("c_id"), "op",
        F.col("name").alias("c_name"), F.col("bal").alias("c_bal"),
    )
    j = snap.join(c, snap["id"] == c["c_id"], "full_outer")
    keep = (
        (F.col("c_id").isNull())  # snap-only: untouched
        | (F.col("id").isNotNull() & (F.col("op") == "U"))  # update
        | (F.col("id").isNull() & (F.col("op") == "I"))  # insert
    )
    return j.filter(keep).select(
        F.coalesce("id", "c_id").alias("id"),
        F.coalesce("c_name", "name").alias("name"),
        F.coalesce("c_bal", "bal").alias("bal"),
    )


@query(
    "incremental_agg_merge",
    oracle="""
SELECT o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
         AS total_price,
       CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
         / count(*) AS avg_price
FROM orders
WHERE o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY o_orderpriority
ORDER BY priority
""",
    tags=("warehouse", "incremental", "materialized-view"),
)
def incremental_agg_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental materialized-view maintenance: a per-priority
    (count, decimal-sum) aggregate over orders before 1996 is
    MATERIALIZED to parquet (the view as of the last refresh); when the
    1996-Q1 delta lands, the refresh merges the delta's partial
    aggregate INTO the stored partials — sum-of-counts, sum-of-sums,
    avg re-derived from the merged pair — without ever rescanning the
    base fact rows. The oracle computes the same view directly over the
    full range: the incremental path must be value-identical to the
    full recompute.

    This works because count/sum are MERGEABLE aggregates (the same
    algebra Spark's own partial+final hash-agg exploits inside one
    query, lifted across refresh cycles); avg is NOT mergeable and must
    be stored as its (sum, count) parts — storing avg itself is the
    classic incremental-view bug. Decimal sums keep the merge exact, so
    cross-engine doubles agree bit-for-bit. At 100 TB the refresh cost
    is O(delta) + O(|view|), independent of base-table size — the
    entire reason materialized views scale."""
    from xml_hive_spark.session import scratch_dir

    orders = t(spark, sf, "orders")

    def partial(df):
        return df.groupBy(
            F.col("o_orderpriority").alias("priority")
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,6)")).alias("sum_dec"),
        )

    view_path = scratch_dir("mview-") + "/orders_by_priority"
    partial(
        orders.filter(
            F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
        )
    ).write.mode("overwrite").parquet(view_path)

    delta = partial(
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
    )
    merged = (
        spark.read.parquet(view_path)
        .unionByName(delta)
        .groupBy("priority")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("sum_dec").alias("sum_dec"),
        )
    )
    return merged.select(
        "priority",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("sum_dec").cast("double").alias("total_price"),
        (F.col("sum_dec").cast("double") / F.col("n_orders"))
        .alias("avg_price"),
    ).orderBy("priority")


@query(
    "sample_stratified_exact",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
         ) AS rk
  FROM orders
)
SELECT o_orderpriority, o_orderkey, o_totalprice
FROM ranked WHERE rk <= 20
""",
    tags=("sampling", "stratified", "hash"),
)
def sample_stratified_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic EXACT stratified sampling: exactly 20 orders per
    priority stratum, selected by md5 rank — the guaranteed-quota
    variant beside ``sample_hash_bucket`` (expected-rate) and
    ``sample_weighted_poisson`` (expected-k): eval-set construction
    wants exact per-stratum counts, not expectations. Selection is a
    pure function of the key (same rows on every run, engine, and
    parallelism — the portability contract), and the md5 order makes
    the quota a uniform draw within each stratum.

    Scale shape: one ranking window PARTITIONED BY the stratum —
    strata process in parallel and the rank early-outs at the quota
    under WindowGroupLimit (Spark pushes rk <= 20 into the window as
    a per-partition top-k), so no stratum ever materializes a full
    sort of itself on the reduce side."""
    orders = t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string").cast("binary")),
        "o_orderkey",
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 20)
        .drop("rk")
    )


@query(
    "scd2_early_arriving_fact",
    oracle="""
WITH dim AS (  -- versions valid [eff, end): one per customer half-year
  SELECT c_custkey,
         CAST('1995-01-01' AS DATE) AS eff,
         CAST('1996-07-01' AS DATE) AS endd,
         c_mktsegment
  FROM customer WHERE c_custkey % 7 <> 0  -- 1-in-7 dims arrive LATE
)
SELECT coalesce(d.c_mktsegment, 'UNKNOWN') AS segment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unmatched,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders o
LEFT JOIN dim d
  ON d.c_custkey = o.o_custkey
 AND o.o_orderdate >= CAST(d.eff AS TIMESTAMP)
 AND o.o_orderdate <  CAST(d.endd AS TIMESTAMP)
WHERE o.o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY segment ORDER BY segment
""",
    tags=("warehouse", "scd2", "early-arriving-fact"),
)
def scd2_early_arriving_fact(spark: SparkSession, sf: str) -> DataFrame:
    """EARLY-ARRIVING FACTS (late-arriving dimension) handling — the
    other half of the SCD2 contract beside the point-in-time join:
    facts whose dimension member hasn't arrived yet (1-in-7 customers
    withheld) must NOT be dropped or mis-joined; they route to the
    'UNKNOWN' member via LEFT join + coalesce and are counted so the
    backfill job knows its backlog. The oracle value-checks both the
    routing and the unmatched accounting.

    Scale shape: one equi-join on the key with the validity-range
    predicate as a post-join filter (version ranges partition time —
    the ``scd2_point_in_time_join`` shape) kept LEFT so unmatched
    facts survive; the unknown-member branch is a per-row coalesce,
    free at any scale."""
    cust = t(spark, sf, "customer")
    dim = cust.filter(F.col("c_custkey") % 7 != 0).select(
        "c_custkey",
        F.lit("1995-01-01").cast("date").alias("eff"),
        F.lit("1996-07-01").cast("date").alias("endd"),
        "c_mktsegment",
    )
    orders = t(spark, sf, "orders").filter(
        F.col("o_orderdate") < "1996-07-01"
    )
    joined = orders.join(
        dim,
        (dim.c_custkey == orders.o_custkey)
        & (orders.o_orderdate >= dim.eff.cast("timestamp"))
        & (orders.o_orderdate < dim.endd.cast("timestamp")),
        "left",
    )
    return (
        joined.groupBy(
            F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(
                F.when(F.col("c_custkey").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_unmatched"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .orderBy("segment")
    )
