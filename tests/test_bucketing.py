"""Bucketed co-located join: pre-bucketing both sides on the join key
eliminates the shuffle — the SCALE.md strategy for repeated fact-to-fact
joins. Evidence: the bucketed sort-merge join plan contains no
hash-partitioning Exchange, and results equal the plain join."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="xmlhive-bkt-")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # external bucketed tables (explicit path → no warehouse-dir reliance)
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").option("path", d + "/orders_b")
     .saveAsTable("orders_b"))
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").option("path", d + "/lineitem_b")
     .saveAsTable("lineitem_b"))
    yield orders, li
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_skips_shuffle(spark, bucketed_tables):
    orders, li = bucketed_tables
    ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
    # force sort-merge join (broadcast would trivially have no hash exchange)
    joined = ob.hint("merge").join(
        lb.hint("merge"), ob.o_orderkey == lb.l_orderkey
    ).select("o_orderkey", "l_linenumber", "o_totalprice")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:1500]
    # both sides pre-bucketed on the join key → no shuffle exchange
    assert "Exchange hashpartitioning" not in plan, plan[:2000]

    plain = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        "o_orderkey", "l_linenumber", "o_totalprice"
    )
    assert joined.count() == plain.count()
    a = joined.agg(F.sum(F.col("o_totalprice").cast("decimal(30,6)"))).collect()
    b = plain.agg(F.sum(F.col("o_totalprice").cast("decimal(30,6)"))).collect()
    assert a == b


def test_unbucketed_same_join_does_shuffle(spark, sf_dir):
    """Control: the identical join over plain parquet DOES shuffle —
    proving the bucketing (not something else) removed the exchange."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    joined = orders.hint("merge").join(
        li.hint("merge"), orders.o_orderkey == li.l_orderkey
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan
