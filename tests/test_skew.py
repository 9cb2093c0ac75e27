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
