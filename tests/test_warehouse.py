"""SCD2 MERGE + hash-bucket sampling (operators/warehouse.py).

The DuckDB oracle (driver gate + tools/verify_local.py) proves value
equality; these tests pin the MERGE invariants branch by branch and the
sampler's determinism/fraction, which a value hash alone wouldn't
explain on failure.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from xml_hive_spark.operators import all_queries, t


class TestScd2Merge:
    def test_branch_invariants(self, spark, sf_dir):
        out = all_queries()["scd2_merge"].fn(spark, sf_dir).collect()
        by_key: dict = {}
        for r in out:
            by_key.setdefault(r.cust_id, []).append(r)

        # exactly one current row per key, everywhere
        for key, rows in by_key.items():
            cur = [r for r in rows if r.is_current]
            assert len(cur) == 1, (key, rows)
            assert cur[0].effective_to is None
            # non-current rows are closed out
            for r in rows:
                if not r.is_current:
                    assert r.effective_to is not None

        # changed keys: closed old row chains into the new version
        changed = {k: rows for k, rows in by_key.items() if len(rows) == 2}
        assert changed, "update batch must change at least one key"
        for key, rows in changed.items():
            old = next(r for r in rows if not r.is_current)
            new = next(r for r in rows if r.is_current)
            assert old.effective_to == new.effective_from
            assert old.effective_from < new.effective_from
            assert old.tracked_val != new.tracked_val

        # insert branch: keys >= 100 come only from the update batch
        inserts = [k for k in by_key if k >= 100]
        assert inserts, "insert branch not exercised"
        for k in inserts:
            (r,) = by_key[k]
            assert r.is_current and r.effective_to is None

        # pass-through branch: dimension keys with no pre-1997 order
        # keep their original open row
        upd_keys = {
            r.o_custkey
            for r in t(spark, sf_dir, "orders")
            .filter("o_orderdate < timestamp '1997-01-01'")
            .select("o_custkey")
            .distinct()
            .collect()
        }
        untouched = [k for k in by_key if k < 100 and k not in upd_keys]
        for k in untouched:
            (r,) = by_key[k]
            assert r.is_current and str(r.effective_from) == "1992-01-01"


class TestSampleHashBucket:
    def test_deterministic_subset_and_fraction(self, spark, sf_dir):
        fn = all_queries()["sample_hash_bucket"].fn
        a = sorted(r.o_orderkey for r in fn(spark, sf_dir).collect())
        b = sorted(r.o_orderkey for r in fn(spark, sf_dir).collect())
        assert a == b, "hash sampling must be run-stable"
        total = t(spark, sf_dir, "orders").count()
        frac = len(a) / total
        assert 0.05 < frac < 0.15, frac
        # membership is a pure function of the key — spot-check one key
        # against the closed form
        import hashlib

        for k in a[:20]:
            assert hashlib.md5(str(k).encode()).hexdigest()[:4] < "199a"


class TestIntervalOverlapJoin:
    def test_dedup_free_and_bounds(self, spark, sf_dir):
        """The bucket trick must emit each overlapping pair exactly once
        (no distinct in the plan), with overlap bounded by the shorter
        interval."""
        out = all_queries()["interval_overlap_join"].fn(spark, sf_dir).collect()
        pairs = [(r.o_orderkey, r.campaign_id) for r in out]
        assert len(pairs) == len(set(pairs)), "bucketized join emitted dupes"
        assert all(1 <= r.overlap_days <= 14 for r in out)
        assert out, "campaign windows must overlap some orders"


class TestCountMinSketch:
    def test_overestimate_invariant(self, spark, sf_dir):
        """CM estimates never under-count; at d=3 x w=256 over a small
        vocabulary most probes are collision-free (est == exact)."""
        out = all_queries()["sketch_count_min"].fn(spark, sf_dir).collect()
        assert len(out) == 20
        assert all(r.cm_est >= r.exact_n for r in out)
        exact_hits = sum(1 for r in out if r.cm_est == r.exact_n)
        assert exact_hits >= 10  # mostly collision-free at this scale


class TestScd2PointInTimeJoin:
    def test_no_future_leakage_and_unique_version(self, spark, sf_dir):
        """Every fact joins AT MOST one dimension version, and that
        version's validity started on or before the order date — the
        no-leakage invariant that a latest-version join violates."""
        out = all_queries()["scd2_point_in_time_join"].fn(spark, sf_dir).collect()
        assert out
        keys = [r.o_orderkey for r in out]
        assert len(keys) == len(set(keys)), "an order matched two versions"
        orders = {
            r.o_orderkey: r.o_orderdate
            for r in t(spark, sf_dir, "orders")
            .filter("o_orderdate >= timestamp '1997-01-01'")
            .collect()
        }
        for r in out:
            assert r.version_from <= orders[r.o_orderkey].date()


class TestWeightedPoisson:
    def test_expected_size_and_weight_bias(self, spark, sf_dir):
        """Realized sample size is near the expected k=100, and because
        inclusion probability is proportional to o_totalprice the mean
        sampled weight must exceed the corpus mean weight."""
        from pyspark.sql import functions as F

        from xml_hive_spark.operators import all_queries, t

        got = all_queries()["sample_weighted_poisson"].fn(spark, sf_dir)
        rows = got.collect()
        assert 50 <= len(rows) <= 200  # k=100 with Poisson variance
        mean_sampled = sum(r["o_totalprice"] for r in rows) / len(rows)
        mean_all = (
            t(spark, sf_dir, "orders")
            .agg(F.avg("o_totalprice"))
            .collect()[0][0]
        )
        assert mean_sampled > mean_all

    def test_membership_is_key_pure(self, spark, sf_dir):
        """Same rows on every evaluation (no RNG state): two runs return
        identical key sets."""
        from xml_hive_spark.operators import all_queries

        q = all_queries()["sample_weighted_poisson"].fn
        a = sorted(r["o_orderkey"] for r in q(spark, sf_dir).collect())
        b = sorted(r["o_orderkey"] for r in q(spark, sf_dir).collect())
        assert a == b
