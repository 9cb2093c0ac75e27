"""Product/behavioral analytics over the ``events`` stream table plus
table-profiling utilities: cohort retention, Markov transition matrices,
time-range rolling windows, per-column data profiling, argmax/argmin
aggregates, and fixed-width histograms.

The reference delegates all relational analytics to Hive
(AvroFromXmlSerde.scala:13); this module exercises the equivalent
Catalyst surface on the shapes a production events pipeline actually
runs. Every query carries a full DuckDB oracle.

Scale notes (100 TB): each query is one or two hash-shuffles keyed on a
natural high-cardinality key (user_id, doc bucket, column name); no
driver-side state beyond single scalars; windows are always PARTITIONed
(never the global-window funnel pinned in test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xml_hive_spark.operators import query, t


@query(
    "cohort_retention",
    oracle="""
WITH cohort AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
  FROM events
),
sizes AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
  FROM cohort GROUP BY cohort_week
)
SELECT c.cohort_week AS cohort_week,
       CAST(date_diff('day', c.cohort_week, a.active_week) / 7 AS INT)
         AS week_offset,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(count(*) AS DOUBLE) / any_value(s.cohort_size) AS retention
FROM active a
JOIN cohort c USING (user_id)
JOIN sizes s ON s.cohort_week = c.cohort_week
GROUP BY c.cohort_week, week_offset
ORDER BY cohort_week, week_offset
""",
    tags=("analytics", "cohort", "retention"),
)
def cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their first
    event; for each (cohort week, week offset) the count of cohort
    members still active and the retention fraction.

    Scale shape: two hash-aggs keyed on user_id (co-partitioned — one
    shuffle feeds both), a user-keyed equi-join, then a small final agg
    on (cohort, offset); the cohort-size side is weeks-count rows and
    broadcast by AQE. Retention is an exact int/int IEEE division —
    bit-stable cross-engine. date_trunc('week') is cast to DATE on both
    sides (DuckDB returns DATE, Spark TIMESTAMP)."""
    ev = t(spark, sf, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("active_week")
    ).distinct()
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        active.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
)
SELECT src, dst, CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) AS DOUBLE)
         / sum(count(*)) OVER (PARTITION BY src) AS p
FROM seq WHERE dst IS NOT NULL
GROUP BY src, dst
ORDER BY src, dst
""",
    tags=("analytics", "markov", "sequence"),
)
def event_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix of user event sequences:
    for each ordered pair of consecutive event types (per user, by
    time), the transition count and row-normalized probability.

    Scale shape: ONE shuffle keyed on user_id for the lead() window
    (per-user partitions — never global), a hash-agg on (src, dst)
    whose output is |event_types|² rows, and a trivially small window
    over that for row normalization. p is an exact int/int division."""
    ev = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    counts = seq.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wsrc = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wsrc)).alias("p"),
    ).orderBy("src", "dst")


@query(
    "window_rolling_1h",
    oracle="""
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
         AS cents_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
""",
    tags=("analytics", "window", "range-frame"),
)
def window_rolling_1h(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user rolling 1-hour event count and value sum (a true
    time-RANGE frame, not a row frame): every event sees the aggregate
    of the trailing hour including itself.

    Scale shape: one shuffle keyed on user_id; the range frame runs as
    a per-partition streaming frame scan (Spark's WindowExec sliding
    accumulator), never materializing per-row frames. The value sum is
    pre-quantized to integer cents so the rolling sum is exact and
    order-free — the repo's standard cross-engine double-sum dodge
    (see dsum); epoch microseconds give both engines the identical
    integer ordering key."""
    ev = t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_1h"),
        F.sum(cents).over(w).cast("long").alias("cents_1h"),
    ).orderBy("event_id")


_PROFILE_INT_COLS = ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
_PROFILE_STR_COLS = ("l_returnflag", "l_linestatus")


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_INT_COLS + _PROFILE_STR_COLS:
        parts.append(
            f"""
SELECT '{c}' AS col_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_val,
       CAST(max({c}) AS VARCHAR) AS max_val
FROM lineitem"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


@query(
    "table_profile",
    oracle=_profile_oracle(),
    tags=("analytics", "profiling", "quality"),
)
def table_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Per-column data profile of lineitem (row/null/distinct counts,
    min/max rendered as strings) — the first step of any data-quality
    or schema-drift pipeline.

    Scale shape: ONE table scan; all 6 columns' stats are computed in a
    single aggregate (Spark plans the multi-DISTINCT via one Expand —
    data ×6 through one shuffle, still one pass over storage) and then
    unpivoted with stack(). At 100 TB you'd swap count(DISTINCT) for
    approx_count_distinct to drop the Expand; the exact form is kept
    here because the oracle hashes exact values. min/max string casts
    are int→string and varchar→varchar — both engines render them
    identically (no float formatting in play)."""
    cols = _PROFILE_INT_COLS + _PROFILE_STR_COLS
    li = t(spark, sf, "lineitem")
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"{c}__null"),
            F.count_distinct(F.col(c)).cast("long").alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__distinct, {c}__min, {c}__max"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_rows, n_null, n_distinct, min_val, max_val)"
        )
    ).orderBy("col_name")


@query(
    "agg_argmax_argmin",
    oracle="""
SELECT p_brand,
       arg_max(p_name, CAST(round(p_retailprice * 100) AS BIGINT) * 100000
                       + p_partkey) AS priciest_part,
       arg_min(p_name, CAST(round(p_retailprice * 100) AS BIGINT) * 100000
                       + p_partkey) AS cheapest_part,
       CAST(round(max(p_retailprice) * 100) AS BIGINT) AS max_cents,
       CAST(round(min(p_retailprice) * 100) AS BIGINT) AS min_cents
FROM part
GROUP BY p_brand
ORDER BY p_brand
""",
    tags=("analytics", "argmax", "aggregate"),
)
def agg_argmax_argmin(spark: SparkSession, sf: str) -> DataFrame:
    """arg_max / arg_min (Spark max_by/min_by): per brand, the name of
    the priciest and cheapest part plus the price extremes in integer
    cents.

    The ordering value is price-cents * 100000 + partkey — a single
    integer that is unique per row, making the argmax DETERMINISTIC
    under price ties (max_by/arg_max tie-breaking is otherwise
    engine-defined). round-then-cast is used because bare double→int
    casts disagree across engines (Spark truncates, DuckDB rounds).
    Scale: one partial+final hash-agg, output |brands| rows."""
    ordv = (F.round(F.col("p_retailprice") * 100).cast("long") * 100000
            + F.col("p_partkey"))
    return (
        t(spark, sf, "part")
        .groupBy("p_brand")
        .agg(
            F.expr(
                "max_by(p_name, CAST(round(p_retailprice * 100) AS BIGINT)"
                " * 100000 + p_partkey)"
            ).alias("priciest_part"),
            F.expr(
                "min_by(p_name, CAST(round(p_retailprice * 100) AS BIGINT)"
                " * 100000 + p_partkey)"
            ).alias("cheapest_part"),
            F.round(F.max("p_retailprice") * 100).cast("long").alias("max_cents"),
            F.round(F.min("p_retailprice") * 100).cast("long").alias("min_cents"),
        )
        .orderBy("p_brand")
    )


@query(
    "histogram_doc_length",
    oracle="""
SELECT CAST(floor(n_chars / 100.0) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY bucket
ORDER BY bucket
""",
    tags=("analytics", "histogram",),
)
def histogram_doc_length(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width histogram of document length (100-char buckets) with
    per-bucket extrema — the distribution profile step of a corpus
    length-filter pipeline.

    Scale shape: single partial+final hash-agg on the computed bucket
    key; output is O(max_length / width) rows regardless of corpus
    size."""
    docs = t(spark, sf, "documents")
    bucket = F.floor(F.col("n_chars") / 100.0).cast("long").alias("bucket")
    return (
        docs.groupBy(bucket)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .orderBy("bucket")
    )


@query(
    "anomaly_zscore_events",
    oracle="""
WITH s AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sv,
         CAST(sum(CAST(value * value AS DECIMAL(30,6))) AS DOUBLE) AS svv
  FROM events GROUP BY user_id
),
st AS (
  SELECT user_id, n, sv / n AS mean,
         sqrt((svv - sv * sv / n) / (n - 1)) AS sd
  FROM s WHERE n >= 2
)
SELECT e.event_id AS event_id, e.user_id AS user_id, e.value AS value,
       (e.value - st.mean) / st.sd AS z
FROM events e JOIN st USING (user_id)
WHERE st.sd > 0 AND abs((e.value - st.mean) / st.sd) > 3
ORDER BY event_id
""",
    tags=("analytics", "anomaly", "zscore"),
)
def anomaly_zscore_events(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user z-score anomaly detection: events whose value deviates
    more than 3 sample standard deviations from that user's mean.

    Cross-engine determinism discipline: the moments are accumulated as
    exact DECIMAL sums (order-free — the repo's dsum dodge), converted
    to double ONCE, and every subsequent step (mean, variance, sqrt,
    z) is a fixed-shape IEEE expression both engines evaluate
    identically — never a builtin stddev, whose parallel accumulation
    order is engine-defined. Scale shape: one user-keyed hash-agg +
    one user-keyed equi-join (AQE broadcasts the |users|-row stats
    side when small); no window, no driver state."""
    ev = t(spark, sf, "events")
    s = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sv"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(30,6)"))
        .cast("double")
        .alias("svv"),
    )
    st = s.where(F.col("n") >= 2).select(
        "user_id",
        "n",
        (F.col("sv") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("svv") - F.col("sv") * F.col("sv") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    z = (F.col("value") - F.col("mean")) / F.col("sd")
    return (
        ev.join(st, "user_id")
        .where((F.col("sd") > 0) & (F.abs(z) > 3))
        .select("event_id", "user_id", "value", z.alias("z"))
        .orderBy("event_id")
    )


@query(
    "window_percent_rank",
    oracle="""
SELECT c_custkey, c_mktsegment,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
""",
    tags=("analytics", "window", "rank-distribution"),
)
def window_percent_rank(spark: SparkSession, sf: str) -> DataFrame:
    """percent_rank and cume_dist per market segment — the two relative-
    rank window functions the ranking family (row_number/rank/ntile)
    doesn't cover. Both are exact integer ratios ((rank-1)/(n-1),
    peers/n) so the doubles hash bit-for-bit; (c_acctbal, c_custkey)
    ordering makes ranks unique and deterministic. Scale: one shuffle
    keyed on the segment; frames are per-segment."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        t(spark, sf, "customer")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
        .orderBy("c_custkey")
    )


@query(
    "regression_slope_closed_form",
    oracle="""
WITH s AS (
  SELECT p.p_brand,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS sy,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)
                  * CAST(round(l.l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS sxy,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)
                  * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sxx
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
)
SELECT p_brand, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST((n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx) AS BIGINT)
         AS slope_millicents
FROM s
""",
    tags=("analytics", "regression", "statistics"),
)
def regression_slope_closed_form(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group ordinary-least-squares slope (price-cents per unit of
    quantity, by part brand) via the closed form
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) — kept as an EXACT
    integer numerator/denominator pair, so the driver hash checks the
    regression bit-for-bit (float OLS is never cross-engine stable;
    the int ratio is). The reported slope_millicents is the integer
    floor of 1000×slope — deterministic on both engines.

    Scale shape: one broadcast dim join (part) + one hash-agg with
    map-side partial sums — regression over any number of rows moves
    only 5 numbers per group. Overflow headroom: n·Σxy peaks ~3e17 at
    sf0.1 (bound 9.2e18); beyond ~sf3 the sums escalate to
    DECIMAL(38,0) the way ``incremental_agg_merge`` sums decimals."""
    li = t(spark, sf, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    part = t(spark, sf, "part").select("p_partkey", "p_brand")
    s = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        )
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "p_brand",
        "n",
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.expr(
            "(n * sxy - sx * sy) * 1000 DIV (n * sxx - sx * sx)"
        ).cast("long").alias("slope_millicents"),
    )


@query(
    "event_pattern_match",
    oracle="""
WITH j AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS journey,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, n_events,
       CAST(len(regexp_extract_all(journey, 'v[ce]*p')) AS BIGINT)
         AS n_funnels
FROM j
""",
    tags=("analytics", "cep", "pattern", "sessionization"),
)
def event_pattern_match(spark: SparkSession, sf: str) -> DataFrame:
    """Complex-event-processing pattern match (the MATCH_RECOGNIZE
    shape): each user's event stream becomes an ordered journey string
    (one initial per event — the 5 event types have distinct initials),
    and the funnel pattern `v[ce]*p` (view, any clicks/errors, then
    purchase) is counted per user with non-overlapping regex scan.
    The pattern is chosen UNAMBIGUOUS ([ce]* can't contain p, so every
    match has exactly one possible extent) — backtracking (Java) and
    leftmost-longest (RE2/DuckDB) regex engines agree match-for-match,
    which is what makes the count hashable cross-engine.

    Scale shape: ONE user-keyed shuffle builds the journeys (collect
    under the hash-agg; per-user state bounded by that user's event
    count — the sessionize bound); the regex runs once per user in
    codegen. Ordering inside a user is total — (ts, event_id) with
    unique event ids — so the journey string is deterministic under
    any partitioning."""
    ev = t(spark, sf, "events").select(
        "user_id",
        F.struct(
            F.col("ts"), F.col("event_id"),
            F.substring("event_type", 1, 1).alias("ini"),
        ).alias("s"),
    )
    return (
        ev.groupBy("user_id")
        .agg(F.array_sort(F.collect_list("s")).alias("arr"))
        .select(
            "user_id",
            F.size("arr").cast("long").alias("n_events"),
            F.regexp_count(
                F.array_join(F.expr("transform(arr, x -> x.ini)"), ""),
                F.lit("v[ce]*p"),
            )
            .cast("long")
            .alias("n_funnels"),
        )
    )


@query(
    "copurchase_lift",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM items),
pc AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS np
  FROM items GROUP BY l_partkey
),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY pa, pb HAVING count(*) >= 2
)
SELECT pa, pb, n_ab,
       CAST(n_ab * nb.n AS BIGINT) AS lift_num,
       CAST(ca.np * cb.np AS BIGINT) AS lift_den
FROM pairs
JOIN pc ca ON ca.l_partkey = pa
JOIN pc cb ON cb.l_partkey = pb
CROSS JOIN nb
ORDER BY CAST(n_ab * nb.n AS DOUBLE) / (ca.np * cb.np) DESC, pa, pb
LIMIT 20
""",
    tags=("analytics", "association-rules", "lift"),
)
def copurchase_lift(spark: SparkSession, sf: str) -> DataFrame:
    """Association-rule LIFT on the co-purchase pairs — the statistical
    layer over raw pair counts (``copurchase_pairs``): lift(a,b) =
    N·n(ab) / (n(a)·n(b)) separates genuinely-associated pairs from
    pairs that co-occur because both parts are popular. The lift is
    carried as an EXACT integer numerator/denominator pair (the
    regression_slope convention); only the top-20 ORDER BY computes the
    one double division, with identical operand association on both
    engines and (pa, pb) tie-breaks, so the ranking is cross-engine
    stable.

    Scale shape: pair counts come from the basket-bounded expansion
    (ONE orderkey-keyed shuffle, never a corpus self-join — the
    copurchase_pairs plan); per-part counts are one hash-agg joined
    back on the part key; N is a 1-row broadcast. Top-20 plans as
    TakeOrderedAndProject."""
    items = (
        t(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    nb = items.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n")
    )
    pc = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("np")
    )
    baskets = items.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) ->"
                    " transform(slice(parts, i + 2, size(parts)),"
                    " y -> struct(x AS pa, y AS pb))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    ca = pc.select(F.col("l_partkey").alias("pa"), F.col("np").alias("na"))
    cb = pc.select(F.col("l_partkey").alias("pb"), F.col("np").alias("nbp"))
    return (
        pairs.join(ca, "pa")
        .join(cb, "pb")
        .crossJoin(F.broadcast(nb))
        .select(
            "pa", "pb", "n_ab",
            (F.col("n_ab") * F.col("n")).cast("long").alias("lift_num"),
            (F.col("na") * F.col("nbp")).cast("long").alias("lift_den"),
        )
        .orderBy(
            (F.col("lift_num").cast("double") / F.col("lift_den")).desc(),
            "pa",
            "pb",
        )
        .limit(20)
    )


@query(
    "streak_gaps_islands",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
ranked AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY d) AS INT) AS island
  FROM days
),
islands AS (
  SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
  FROM ranked GROUP BY user_id, island
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(sum(len) AS BIGINT) AS active_days
FROM islands GROUP BY user_id
""",
    tags=("analytics", "gaps-islands", "streaks"),
)
def streak_gaps_islands(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands streak analysis — the classic SQL idiom for
    run-length over sparse time (DAU streaks, sensor uptime, SLA
    windows): per user, distinct active DAYS collapse into islands of
    consecutive dates via the date-minus-row_number trick (consecutive
    days share one island key), then islands aggregate to streak
    counts, the longest streak, and total active days.

    Scale shape: everything is keyed on user_id end to end — one
    distinct, one per-user ranking window, two hash-aggs, all sharing
    a single hash partitioning (no global window, no join). The same
    idiom runs inside the components-clustering oracle; this entry
    makes it a first-class operator."""
    days = (
        t(spark, sf, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    ranked = days.select(
        "user_id",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("island"),
    )
    islands = ranked.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
        F.sum("len").cast("long").alias("active_days"),
    )


@query(
    "attribution_last_touch",
    oracle="""
WITH touched AS (
  SELECT event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS touch
  FROM events
)
SELECT coalesce(touch, 'none') AS touch_type,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS attributed_cents
FROM touched
WHERE event_type = 'purchase'
GROUP BY touch_type ORDER BY touch_type
""",
    tags=("analytics", "attribution", "window"),
)
def attribution_last_touch(spark: SparkSession, sf: str) -> DataFrame:
    """LAST-TOUCH marketing attribution: every purchase is credited to
    the user's most recent PRECEDING non-purchase event (view, click,
    signup, error — the touchpoint), and purchase value rolls up per
    touchpoint type in integer cents; first-session purchases with no
    prior touch land in 'none'. The ordered carry is
    ``last(..., ignorenulls=True)`` over an
    unbounded-preceding-to--1 frame — the same IGNORE NULLS window
    both engines define identically under the total (ts, event_id)
    order.

    Scale shape: one user-keyed window (hash-partitioned by user — the
    sessionize bound) feeding a domain-sized aggregate (|event types|
    rows); no join at all."""
    ev = t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.select("event_type", "value", touch.alias("touch"))
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("none")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("attributed_cents"),
        )
        .orderBy("touch_type")
    )


@query(
    "daily_new_and_cumulative_users",
    oracle="""
WITH first_day AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
),
daily AS (
  SELECT d, CAST(count(*) AS BIGINT) AS new_users
  FROM first_day GROUP BY d
)
SELECT d AS day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY d) AS BIGINT)
         AS cumulative_users
FROM daily
""",
    tags=("analytics", "growth", "cumulative-distinct"),
)
def daily_new_and_cumulative_users(spark: SparkSession, sf: str) -> DataFrame:
    """Daily new + CUMULATIVE distinct users — the growth-accounting
    query every product dashboard runs, via the first-appearance trick:
    a cumulative count(DISTINCT) window is unsupported (and would be
    quadratic anyway); instead each user contributes one row at their
    FIRST active day (one user-keyed hash-agg), daily news are a
    domain-sized aggregate, and the running total is a window over
    |days| rows.

    Scale shape: the only corpus-sized shuffle is the per-user min;
    the ordered window runs over the bounded day domain (the
    quantile-histogram precedent: global windows are fine over bounded
    summaries, never over the corpus)."""
    ev = t(spark, sf, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d")
    )
    daily = first_day.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("d").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


@query(
    "anomaly_mad_robust",
    oracle="""
WITH cents AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events
),
med AS (
  SELECT event_type, quantile_cont(c, 0.5) AS m FROM cents
  GROUP BY event_type
),
dev AS (
  SELECT c.event_type, c.c, abs(c.c - med.m) AS ad
  FROM cents c JOIN med ON med.event_type = c.event_type
),
mad AS (
  SELECT event_type, quantile_cont(ad, 0.5) AS mad FROM dev
  GROUP BY event_type
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n_outliers,
       CAST(max(d.c) AS BIGINT) AS max_outlier_cents
FROM dev d JOIN mad ON mad.event_type = d.event_type
WHERE d.ad * 10000 > 3 * 14826 * mad.mad
GROUP BY d.event_type ORDER BY d.event_type
""",
    tags=("analytics", "anomaly", "robust-statistics"),
)
def anomaly_mad_robust(spark: SparkSession, sf: str) -> DataFrame:
    """ROBUST outlier detection by median absolute deviation — the
    resistant twin of ``anomaly_zscore_events`` (one wild value drags a
    mean + stddev; it cannot drag two medians): per event type, median
    of value-cents, MAD of the deviations (a second exact median —
    the proven quantile_cont bit-parity), and the classic
    |x − med| > 3·1.4826·MAD rule applied as an integer-scaled
    comparison (·10000 vs 3·14826 — no float threshold), so the
    outlier set is hash-exact cross-engine.

    Scale shape: two group-keyed exact-percentile aggregates (each
    sorts its group once) + one broadcast-back join; at petabyte
    group sizes both medians swap for the histogram sketch
    (``sketch_quantile_histogram``) at the same call sites."""
    cents = t(spark, sf, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    )
    med = cents.groupBy("event_type").agg(
        F.expr("percentile(c, 0.5)").alias("m")
    )
    dev = cents.join(F.broadcast(med), "event_type").select(
        "event_type", "c", F.abs(F.col("c") - F.col("m")).alias("ad")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("ad") * 10000 > 3 * 14826 * F.col("mad"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_outliers"),
            F.max("c").cast("long").alias("max_outlier_cents"),
        )
        .orderBy("event_type")
    )


@query(
    "pareto_skyline_2d",
    oracle="""
WITH pts AS (
  SELECT DISTINCT
    CAST(round(o_totalprice * 100) AS BIGINT) // 100000 AS price_k,
    CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
         AS BIGINT) AS day
  FROM orders
)
SELECT p.price_k, p.day
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.price_k <= p.price_k AND q.day >= p.day
    AND (q.price_k < p.price_k OR q.day > p.day)
)
""",
    tags=("analytics", "skyline", "pareto", "multi-objective"),
)
def pareto_skyline_2d(spark: SparkSession, sf: str) -> DataFrame:
    """PARETO SKYLINE (multi-objective dominance): the order-price ×
    recency points no other point strictly dominates (cheaper AND more
    recent) — the classic preference query behind "best tradeoff"
    dashboards. Points are DISTINCT bucketed integers ($1000 price
    buckets × days), so strict dominance is tie-unambiguous and the
    point set is bounded by the bucket grid, not the row count.

    Plan shape: the dominance test is an anti-join with inequality-only
    conditions over the DISTINCT point set — a broadcast nested-loop by
    necessity, which is exactly why the points are pre-aggregated to a
    bounded grid first (corpus rows never enter the quadratic step; the
    grid is |price buckets| × |days| at most). At larger grids the
    standard sweep replaces it: sort by price, keep points whose day
    exceeds the running max — one sort + one window, O(n log n); the
    anti-join form is kept here because it is the shape the oracle can
    state exactly."""
    orders = t(spark, sf, "orders")
    pts = orders.select(
        F.expr(
            "CAST(round(o_totalprice * 100) AS BIGINT) DIV 100000"
        ).alias("price_k"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01"))
        .cast("long")
        .alias("day"),
    ).distinct()
    p, q = pts.alias("p"), pts.alias("q")
    dominated = (
        (F.col("q.price_k") <= F.col("p.price_k"))
        & (F.col("q.day") >= F.col("p.day"))
        & (
            (F.col("q.price_k") < F.col("p.price_k"))
            | (F.col("q.day") > F.col("p.day"))
        )
    )
    return p.join(q, dominated, "left_anti").select("p.price_k", "p.day")


@query(
    "chi_square_independence",
    oracle="""
WITH obs AS (
  SELECT o_orderpriority AS p, o_orderstatus AS s,
         CAST(count(*) AS BIGINT) AS o
  FROM orders GROUP BY p, s
),
margins AS (
  SELECT p, s, o,
         SUM(o) OVER (PARTITION BY p) AS rp,
         SUM(o) OVER (PARTITION BY s) AS cs,
         SUM(o) OVER () AS n
  FROM obs
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST((SELECT (COUNT(DISTINCT p) - 1) * (COUNT(DISTINCT s) - 1)
             FROM obs) AS BIGINT) AS dof,
       CAST(SUM((n * o - rp * cs) * (n * o - rp * cs) // (n * rp * cs))
            AS BIGINT) AS chi2_scaled
FROM margins
""",
    tags=("analytics", "statistics", "chi-square"),
)
def chi_square_independence(spark: SparkSession, sf: str) -> DataFrame:
    """χ² INDEPENDENCE test (order priority ⊥ order status?) computed
    with EXACT integer arithmetic: per cell,
    (n·O − R·C)² / (n·R·C) — algebraically n·(O−E)²/E with E = R·C/n,
    kept as integer numerators with one truncating division per cell
    (identical on both engines, verified for negative operands) — so
    the test statistic is hash-exact where a float χ² never is. The
    contingency table is |priorities|×|statuses| cells; dof comes with
    it.

    Scale shape: one hash-agg to the contingency table, margin windows
    over the bounded table (15 cells), and a scalar out — the
    independence test costs one aggregation scan at any corpus size.
    Overflow headroom: (n·O − R·C)² stays inside BIGINT while
    n·max(O) < 3·10⁹ (holds through ~sf0.2 here); past that the same
    expressions escalate to DECIMAL(38,0), the
    ``regression_slope_closed_form`` convention."""
    orders = t(spark, sf, "orders")
    obs = orders.groupBy(
        F.col("o_orderpriority").alias("p"),
        F.col("o_orderstatus").alias("s"),
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    wp = Window.partitionBy("p")
    ws = Window.partitionBy("s")
    wn = Window.partitionBy()
    m = obs.select(
        "p", "s", "o",
        F.sum("o").over(wp).alias("rp"),
        F.sum("o").over(ws).alias("cs"),
        F.sum("o").over(wn).alias("n"),
    )
    num = F.col("n") * F.col("o") - F.col("rp") * F.col("cs")
    cell = F.expr(
        "(n * o - rp * cs) * (n * o - rp * cs) DIV (n * rp * cs)"
    )
    dof = obs.agg(
        (
            (F.countDistinct("p") - 1) * (F.countDistinct("s") - 1)
        ).cast("long").alias("dof")
    )
    return (
        m.agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum(cell).cast("long").alias("chi2_scaled"),
        )
        .crossJoin(F.broadcast(dof))
        .select("n_cells", "dof", "chi2_scaled")
    )
