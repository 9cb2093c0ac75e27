"""Salted-join result invariance + skew spreading evidence."""

from __future__ import annotations

from pyspark.sql import functions as F

from xml_hive_spark.plans.skew import salted_join


def test_salted_equals_plain_on_skewed_data(spark):
    """90% of left rows share one hot key; salted join must return the
    exact multiset the plain join returns."""
    left = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(100).select(
        F.col("id").alias("rk"), (F.col("id") * 2).alias("rv")
    )
    plain = left.join(right, left.k == right.rk).select("k", "payload", "rv")
    salted = salted_join(left, right, "k", "rk", n_salts=8).select(
        "k", "payload", "rv"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.range(10).select(F.col("id").alias("k"))
    right = spark.range(5).select(F.col("id").alias("rk"), F.lit("x").alias("v"))
    out = salted_join(left, right, "k", "rk", n_salts=4, how="left").collect()
    assert len(out) == 10
    assert sum(1 for r in out if r.v is None) == 5


def test_salt_actually_spreads(spark):
    """The hot key's rows must land in multiple salt groups."""
    left = spark.range(1000).select(F.lit(7).alias("k"), F.col("id").alias("p"))
    from xml_hive_spark.plans.skew import SALT_COL

    salted = left.withColumn(SALT_COL, (F.rand(seed=42) * 8).cast("int"))
    n_groups = salted.select(SALT_COL).distinct().count()
    assert n_groups >= 6


def test_aqe_splits_planted_skew_join(spark):
    """AQE's runtime skew handling must actually fire on a planted hot
    key (SCALE.md's claimed mitigation): with the skew thresholds
    scaled to test size and broadcast disabled, the finalized adaptive
    plan marks the sort-merge join's skewed side (skew=true) and the
    result still equals the exact expected row count."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.shuffle.partitions": "8",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = spark.range(200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        )
        cold = spark.range(1, 101).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        left = hot.unionAll(cold)
        right = spark.range(0, 101).select(
            F.col("id").alias("k"), F.lit(1).alias("w")
        )
        joined = left.join(right, "k")
        # collect() executes THIS dataset's adaptive plan (count() would
        # finalize a different tree and leave this one isFinalPlan=false)
        n = len(joined.collect())
        assert n == 200_000 + 100
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
