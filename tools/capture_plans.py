"""Capture .explain('formatted') for headline queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt (suffix from $PLAN_SUFFIX,
default 'before'). Plan capture is compute-free (no action runs), so
the output is load-invariant — the artifact the judge checks claims
against (OPTIMIZATION_r13.md).
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__.strip().splitlines()[2], file=sys.stderr)
        raise SystemExit(2)
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    out_dir = Path(__file__).resolve().parents[1] / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    from xml_hive_spark.operators import all_queries
    from xml_hive_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    registry = all_queries()
    if not names:
        import bench

        names = list(bench.HEADLINE)
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"# wrote {name}_{suffix}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
