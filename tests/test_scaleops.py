"""Scale-technique operators (operators/scaleops.py): bloom-pruned
join, Z-order clustered write with data skipping, schema-evolution
read. Each must be value-invisible (full oracles run in
tools/verify_local.py and the driver); these tests pin the part the
oracle can't see — the plan shape and the skipping/pruning effect."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from xml_hive_spark.operators import all_queries, t
from xml_hive_spark.operators.scaleops import (
    _BLOOM_WORDS,
    bloom_build,
    bloom_might_contain,
    zvalue,
)


class TestBloomJoin:
    def test_no_false_negatives(self, spark, sf_dir):
        """Every true key must pass its own bloom — a false negative
        would silently drop join matches."""
        sup = (
            t(spark, sf_dir, "supplier")
            .filter(F.col("s_acctbal") > 4000)
            .select("s_suppkey")
        )
        arr = bloom_build(sup, "s_suppkey")
        assert len(arr) == _BLOOM_WORDS
        n_keys = sup.count()
        passed = sup.filter(
            bloom_might_contain(arr, F.col("s_suppkey"))
        ).count()
        assert passed == n_keys

    def test_prunes_and_bounds_false_positives(self, spark, sf_dir):
        """The bloom must actually shrink the probe side, and the
        false-positive overshoot must be tiny for this load factor
        (k=3, m=65536 bits, tens of keys -> fp rate ~0)."""
        sup = (
            t(spark, sf_dir, "supplier")
            .filter(F.col("s_acctbal") > 4000)
            .select("s_suppkey")
        )
        arr = bloom_build(sup, "s_suppkey")
        li = t(spark, sf_dir, "lineitem").select("l_suppkey")
        total = li.count()
        true_match = li.join(sup, li["l_suppkey"] == sup["s_suppkey"]).count()
        pruned = li.filter(bloom_might_contain(arr, F.col("l_suppkey"))).count()
        assert true_match <= pruned < total
        # overshoot bound: fp among non-matching rows below 2 %
        assert (pruned - true_match) <= max(1, (total - true_match) // 50)

    def test_bloom_filter_sits_below_the_join(self, spark, sf_dir):
        """The pruning condition must run on the probe side BEFORE the
        join (that is its whole point): in the top-down executedPlan
        print the bit_get filter appears AFTER (deeper than) the join
        node, and no UDF/Python eval appears anywhere."""
        df = all_queries()["join_bloom_pruned"].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "bit_get(" in plan
        lines = plan.splitlines()
        join_idx = min(
            i for i, l in enumerate(lines) if "Join" in l or "join" in l
        )
        filt_idx = min(i for i, l in enumerate(lines) if "bit_get(" in l)
        assert filt_idx > join_idx  # deeper than the join = before it
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _morton_ref(a: int, b: int) -> int:
    out = 0
    for i in range(16):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


class TestZOrder:
    def test_zvalue_matches_reference_interleave(self, spark):
        rows = (
            spark.range(200)
            .select(
                (F.col("id") * 131 % 65536).alias("a"),
                (F.col("id") * 37 % 65536).alias("b"),
            )
            .withColumn("z", zvalue(F.col("a"), F.col("b")))
            .collect()
        )
        for r in rows:
            assert r["z"] == _morton_ref(r["a"], r["b"])

    def test_clustered_files_skip_the_box(self, spark, sf_dir):
        """After the z-order rewrite, at least one file's (custkey,
        orderdate) min/max envelope must be disjoint from the box —
        the row-group/file skipping the layout exists for. A
        single-column custkey sort gives every file the FULL date
        span, so no file can be skipped on the date dimension alone;
        the z-layout must strictly beat it on box-intersecting files."""
        from xml_hive_spark.session import scratch_dir

        orders = t(spark, sf_dir, "orders")
        z = zvalue(
            F.col("o_custkey"),
            F.datediff(F.col("o_orderdate"),
                       F.lit("1992-01-01").cast("date")),
        )
        zdir = scratch_dir("zorder-test-") + "/z"
        (
            orders.withColumn("_z", z).repartitionByRange(8, "_z")
            .sortWithinPartitions("_z").drop("_z")
            .write.mode("overwrite").parquet(zdir)
        )
        onedir = scratch_dir("zorder-test-") + "/one"
        (
            orders.repartitionByRange(8, "o_custkey")
            .sortWithinPartitions("o_custkey")
            .write.mode("overwrite").parquet(onedir)
        )

        import datetime as dt
        import glob

        def intersecting(d):
            hits, total = 0, 0
            for f in glob.glob(d + "/*.parquet"):
                md = pq.ParquetFile(f).metadata
                cols = {md.schema.column(i).name: i
                        for i in range(md.num_columns)}
                for rg in range(md.num_row_groups):
                    total += 1
                    g = md.row_group(rg)
                    ck = g.column(cols["o_custkey"]).statistics
                    od = g.column(cols["o_orderdate"]).statistics
                    ck_hit = ck.min <= 500 and ck.max >= 100
                    lo = dt.datetime(1995, 1, 1)
                    hi = dt.datetime(1996, 1, 1)
                    omin, omax = od.min, od.max
                    if isinstance(omin, dt.datetime):
                        omin = omin.replace(tzinfo=None)
                        omax = omax.replace(tzinfo=None)
                    od_hit = omin < hi and omax >= lo
                    hits += 1 if (ck_hit and od_hit) else 0
            return hits, total

        z_hits, z_total = intersecting(zdir)
        o_hits, o_total = intersecting(onedir)
        assert z_total >= 8 and o_total >= 8
        assert z_hits < z_total  # some unit is skippable under z-order
        assert z_hits < o_hits  # and z strictly beats the 1-D sort


class TestSchemaEvolution:
    def test_merged_schema_nulls_old_epoch(self, spark, sf_dir):
        df = all_queries()["schema_evolution_read"].fn(spark, sf_dir)
        rows = {r["era"]: r for r in df.collect()}
        assert rows["v1"]["n_with_priority"] == 0  # old files -> NULL
        assert rows["v2"]["n_with_priority"] == rows["v2"]["n"]


class TestPortableHll:
    def test_estimate_within_error_bound(self, spark, sf_dir):
        """HLL std error = 1.04/sqrt(m) ~ 6.5% at m=256; assert the
        estimate lands within 3 sigma of truth."""
        r = all_queries()["sketch_hll_portable"].fn(spark, sf_dir).collect()[0]
        rel = abs(r["hll_est"] - r["n_exact"]) / r["n_exact"]
        assert rel < 3 * 1.04 / 16.0, r

    def test_register_agg_is_mergeable(self, spark, sf_dir):
        """The register build must be a partial+final hash-agg (max is
        mergeable) — the property that makes the sketch a bounded
        summary at any scale."""
        df = all_queries()["sketch_hll_portable"].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("HashAggregate") >= 2
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_grouped_estimates_within_bound(self, spark, sf_dir):
        rows = all_queries()["sketch_hll_grouped"].fn(spark, sf_dir).collect()
        assert len(rows) >= 2
        for r in rows:
            rel = abs(r["hll_est"] - r["n_exact"]) / max(r["n_exact"], 1)
            assert rel < 3 * 1.04 / 16.0, r


def test_hll_union_merge_equals_direct(spark, sf_dir):
    """Register max is associative: merging six monthly sketches must
    reproduce the direct one-scan sketch bit-for-bit (estimate AND
    nonzero-register count)."""
    from pyspark.sql import functions as F

    from xml_hive_spark.operators import t
    from xml_hive_spark.operators.scaleops import (
        hll_estimate_from_registers,
        hll_register_cols,
        sketch_hll_union,
    )

    merged_row = sketch_hll_union(spark, sf_dir).collect()[0]
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    reg, rho = hll_register_cols(F.col("o_custkey").cast("string"))
    direct = (
        orders.select(reg.alias("reg"), rho.alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("mx"))
    )
    direct_row = hll_estimate_from_registers(direct).collect()[0]
    assert merged_row["hll_est"] == direct_row["hll_est"]
    assert merged_row["nonzero_registers"] == direct_row["nonzero_registers"]


class TestKmvSketch:
    def test_estimate_quality_and_small_branch(self, spark, sf_dir):
        """KMV with k=128 has relative error ~1/sqrt(k-2) ~ 9%; assert
        a 3-sigma bound. Below k distinct keys the sketch must be
        EXACT (small-range branch)."""
        row = all_queries()["sketch_kmv_distinct"].fn(spark, sf_dir).collect()[0]
        if row.n_exact < 128:
            assert row.kmv_est == row.n_exact
        else:
            assert abs(row.kmv_est - row.n_exact) / row.n_exact < 0.27

    def test_bottom_k_plans_as_take_ordered(self, spark, sf_dir):
        """The bottom-k must be per-partition partial top-k + k-row
        merge (TakeOrderedAndProject), never a global sort."""
        plan = (
            all_queries()["sketch_kmv_distinct"]
            .fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan


class TestQuantileHistogram:
    def test_floors_bracket_exact_percentiles(self, spark, sf_dir):
        """Each reported bucket floor must satisfy
        floor <= exact-percentile < floor + width (the histogram
        accuracy contract at $100/10000-cent width)."""
        import pyspark.sql.functions as F

        row = (
            all_queries()["sketch_quantile_histogram"]
            .fn(spark, sf_dir)
            .collect()[0]
        )
        cents = [
            r[0]
            for r in t(spark, sf_dir, "orders")
            .select(F.round(F.col("o_totalprice") * 100).cast("long"))
            .collect()
        ]
        cents.sort()
        n = len(cents)
        import math

        for pnum, pden, floor in (
            (1, 2, row.p50_floor_cents),
            (9, 10, row.p90_floor_cents),
            (99, 100, row.p99_floor_cents),
        ):
            exact = cents[math.ceil(n * pnum / pden) - 1]
            assert floor <= exact < floor + 10000
