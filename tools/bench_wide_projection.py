"""Measure the ``read_xml(columns=...)`` projection lever at schema
width 20 (r9 verdict item #5: the r9 claim that "a wide-schema scan
projected to a few columns benefits far more" than the 3-field bench
shape carried only a width-3 measurement).

Generates (once, cached beside the main bench file) a ~1 GiB XML file
whose records carry an ``id`` attribute + 19 elements (20 declared
fields), then times full-width vs 5-column vs 2-column scans with the
bench protocol (warm + min-of-3, one session). Values are closed-form
in the record index so every variant's aggregate is verifiable.

Usage: python tools/bench_wide_projection.py [target_bytes]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_FIELDS = 19  # elements; + id attribute = 20 declared fields


def ensure_wide_xml(target_bytes: int) -> tuple[str, int]:
    cache_dir = os.path.join(tempfile.gettempdir(), "xmlhive_bench")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"wide20_{target_bytes}.xml")
    meta = path + ".meta"
    if os.path.exists(path) and os.path.exists(meta):
        return path, int(Path(meta).read_text())
    tmp = path + ".tmp"
    with open(tmp, "w", buffering=1 << 22) as f:
        f.write("<dataset>\n")
        written = 11
        i = 0
        while written < target_bytes - 11:
            fields = "".join(
                f"<f{j:02d}>{(i * 37 + j * 13) % 1000}-pad-{j:02d}-string</f{j:02d}>"
                for j in range(N_FIELDS)
            )
            rec = f'<rec id="{i}">{fields}</rec>\n'
            f.write(rec)
            written += len(rec)
            i += 1
        f.write("</dataset>\n")
    os.replace(tmp, path)
    Path(meta).write_text(str(i))
    return path, i


def wide_schema():
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    return StructType(
        [StructField("id", LongType(), False,
                     metadata={"xmlKind": "attribute", "xmlName": "id"})]
        + [StructField(f"f{j:02d}", StringType(), False,
                       metadata={"xmlKind": "element", "xmlName": f"f{j:02d}"})
           for j in range(N_FIELDS)]
    )


def main() -> None:
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 30
    from pyspark.sql import functions as F

    from xml_hive_spark.reader import read_xml
    from xml_hive_spark.session import get_spark

    path, n = ensure_wide_xml(target)
    size = os.path.getsize(path)
    slots = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    pb = max(4 * 1024 * 1024, -(-size // slots))
    spark = get_spark(app_name="wide-projection-bench")
    print(f"# file {size/2**20:.0f} MiB, {n} records, {slots} splits")

    variants = [
        ("full-20", None),
        ("project-5", ["id", "f01", "f05", "f09", "f13"]),
        ("project-2", ["f01", "f13"]),
    ]
    for label, cols in variants:
        def scan():
            df = read_xml(spark, path, "rec", schema=wide_schema(),
                          partition_bytes=pb, columns=cols)
            agg = df.agg(F.count(F.lit(1)).alias("n"),
                         F.sum(F.split("f01", "-").getItem(0).cast("long")).alias("s"))
            return agg.collect()[0]

        r = scan()  # warm
        assert r.n == n, (label, r.n, n)
        best = min(
            (lambda t0: (scan(), time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(3)
        )
        print(f"{label}: {best:.3f}s  {size / best / 2**20:.0f} MB/s")
    spark.stop()


if __name__ == "__main__":
    main()
