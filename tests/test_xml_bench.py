"""The GB-scale XML scan bench entry, validated small: the generated
file's aggregate has a closed-form answer, so the multi-split scan is
checked exactly (including decoy records inside comments)."""

from __future__ import annotations

from xml_hive_spark.operators.xmlio import ensure_bench_xml, run_xml_scan_bench


def test_bench_scan_exact_aggregate(spark, tmp_path):
    target = 4 << 20  # 4 MiB, 16 splits at 256 KiB
    path, n = ensure_bench_xml(target, cache_dir=str(tmp_path))

    # compute the closed-form expectation
    exp = {f"c{k}": [0, 0] for k in range(7)}
    for i in range(n):
        e = exp[f"c{i % 7}"]
        e[0] += 1
        e[1] += (i * 37) % 1000

    import xml_hive_spark.operators.xmlio as xmlio
    from pyspark.sql import functions as F

    from xml_hive_spark.reader import read_xml

    raw = read_xml(
        spark, path, "rec", schema=xmlio.xml_bench_schema(), partition_bytes=256 * 1024
    )
    assert raw.rdd.getNumPartitions() >= 10
    got = {
        r.cat: [r.n, r.sum_val]
        for r in raw.groupBy("cat")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("sum_val"))
        .collect()
    }
    assert got == exp
    assert sum(v[0] for v in got.values()) == n


def test_generation_idempotent(tmp_path):
    p1, n1 = ensure_bench_xml(1 << 20, cache_dir=str(tmp_path))
    p2, n2 = ensure_bench_xml(1 << 20, cache_dir=str(tmp_path))
    assert (p1, n1) == (p2, n2)
    import os

    assert abs(os.path.getsize(p1) - (1 << 20)) < 4096
