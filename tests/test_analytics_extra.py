"""Closed-form regression and phrase-search pins — the properties the
DuckDB value oracles can't express (float OLS parity, pure-Python
phrase recount)."""

from __future__ import annotations

import numpy as np

from xml_hive_spark.operators import all_queries, t


def test_regression_matches_numpy_ols(spark, sf_dir):
    """The integer num/den ratio must equal numpy's float OLS slope
    for the same (quantity, price-cents) sample, per brand."""
    import pyspark.sql.functions as F

    rows = (
        all_queries()["regression_slope_closed_form"]
        .fn(spark, sf_dir)
        .collect()
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            F.col("l_quantity").cast("long").alias("x"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        )
        .join(
            t(spark, sf_dir, "part").select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .collect()
    )
    by_brand: dict = {}
    for r in li:
        by_brand.setdefault(r.p_brand, []).append((r.x, r.y))
    assert len(rows) == len(by_brand)
    for r in rows:
        xs, ys = zip(*by_brand[r.p_brand])
        slope = np.polyfit(np.array(xs, float), np.array(ys, float), 1)[0]
        assert abs(r.slope_num / r.slope_den - slope) < 1e-6 * max(1, abs(slope))
        assert r.slope_millicents == int(r.slope_num * 1000 / r.slope_den)  # trunc


def test_phrase_search_recount(spark, sf_dir):
    """Every reported (n_matches, first_pos) must equal a pure-Python
    recount of adjacent 'table table' occurrences, and docs without the
    phrase must not appear."""
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in all_queries()["phrase_search_positional"]
        .fn(spark, sf_dir)
        .collect()
    }
    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    want = {}
    for d in docs:
        w = d.text.split(" ")
        hits = [i for i in range(len(w) - 1) if w[i] == w[i + 1] == "table"]
        if hits:
            want[d.doc_id] = (len(hits), hits[0])
    assert got == want


def test_event_pattern_recount(spark, sf_dir):
    """n_funnels must equal a pure-Python non-overlapping regex scan
    of the per-user journey built under the same (ts, event_id) order."""
    import re

    got = {
        r.user_id: (r.n_events, r.n_funnels)
        for r in all_queries()["event_pattern_match"].fn(spark, sf_dir).collect()
    }
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type").collect()
    per_user: dict = {}
    for e in ev:
        per_user.setdefault(e.user_id, []).append((e.ts, e.event_id, e.event_type[0]))
    want = {}
    for u, rows in per_user.items():
        journey = "".join(c for _, _, c in sorted(rows))
        want[u] = (len(rows), len(re.findall(r"v[ce]*p", journey)))
    assert got == want
