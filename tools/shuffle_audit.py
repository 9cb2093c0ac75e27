"""Per-query shuffle-byte audit: measure the exchanges, don't audit them.

The 100-TB design claims lean on "minimize shuffles" — ids-only
candidate phases, broadcast-vs-shuffle payload guards, map-side
combines. The scale probe (tools/scale_probe.py) measures TIME; this
tool measures BYTES: for each query it runs the plan once untimed
(JIT, index/XML one-times) then reads the per-stage task metrics from
the JVM AppStatusStore (works with spark.ui.enabled=false) and reports
the delta in shuffle write/read, input, and output bytes for one
steady-state execution.

With ``--scaled DIR`` (a corpus built by tools/scale_probe.py) every
query is measured at both scales and the bytes RATIO is reported — a
linear plan moves <= factor x the shuffle bytes at a factor-x corpus;
a plan whose candidate set or join fan-out grows superlinearly shows
it in the ratio even when wall-clock hides it behind parallelism.

Usage:
    python tools/shuffle_audit.py [--sf-dir /root/testdata/sf0.1]
                                  [--scaled $TMPDIR/xmlhive_scale/sf1]
                                  [--queries name ...]

Prints one JSON line {query: {shuffle_write, shuffle_read, input,
output, ...}} plus a markdown table for SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _store_totals(spark, min_stage_id: int = -1) -> dict[str, int]:
    """Sum task metrics across retained stages with id >= min_stage_id.

    Uses the Spark 4 AppStatusStore.stageList(statuses, details,
    withSummaries, unsortedQuantiles, taskStatus) signature; the store
    is populated regardless of spark.ui.enabled. ``max_stage_id`` in
    the result lets a caller take a before-snapshot and then sum ONLY
    the stages a measured run created (id > before max) — immune to
    the store evicting OLD stages between snapshots, which a plain
    before/after total-delta silently under-counts (the SKIPPED-stage
    failure class r11 fixed once; ADVICE r11 flagged the remaining
    eviction window). Eviction can still bite only if a SINGLE
    measured run outgrows spark.ui.retainedStages — measure() warns
    when the store is sized near that."""
    sc = spark.sparkContext
    ss = sc._jsc.sc().statusStore()
    gw = sc._gateway
    empty = gw.jvm.java.util.ArrayList()
    quantiles = gw.new_array(gw.jvm.double, 0)
    stages = ss.stageList(empty, False, False, quantiles, empty)
    tot = {"shuffle_write": 0, "shuffle_read": 0, "input": 0, "output": 0,
           "spill_disk": 0, "n_stages": 0, "n_skipped": 0,
           "max_stage_id": -1}
    for i in range(stages.size()):
        st = stages.apply(i)
        sid = st.stageId()
        tot["max_stage_id"] = max(tot["max_stage_id"], sid)
        if sid < min_stage_id:
            continue
        tot["shuffle_write"] += st.shuffleWriteBytes()
        tot["shuffle_read"] += st.shuffleReadBytes()
        tot["input"] += st.inputBytes()
        tot["output"] += st.outputBytes()
        tot["spill_disk"] += st.diskBytesSpilled()
        tot["n_stages"] += 1
        # SKIPPED = the stage consumed already-written shuffle files.
        # WITHIN one execution that's normal (a self-join reads one
        # exchange twice; its bytes were counted at the write). ACROSS
        # executions it under-counts — that leak is what the
        # clearCache in measure() breaks; the count here is surfaced
        # for diagnosis, not as an error.
        if st.status().toString() == "SKIPPED":
            tot["n_skipped"] += 1
    return tot


def measure(spark, names, sf_dir: str) -> dict[str, dict[str, int]]:
    from xml_hive_spark.operators import all_queries

    reg = all_queries()
    retained = int(spark.conf.get("spark.ui.retainedStages", "1000"))
    out = {}
    for name in names:
        qd = reg[name]
        qd.fn(spark, sf_dir).count()  # warm: JIT, index/XML-gen one-times
        # Spark reuses a prior identical execution's shuffle outputs
        # (stages show SKIPPED), which silently zeroes the measured
        # run's deltas — dedup_simhash at 10x read 1.8 KB instead of
        # its true 167 MB before this clear. Dropping the cache breaks
        # the shared lineage so every exchange of the measured run
        # actually executes; WITHIN-run persist/reuse still applies,
        # which is the plan behavior being measured.
        spark.catalog.clearCache()
        before = _store_totals(spark)
        qd.fn(spark, sf_dir).count()
        # sum ONLY the measured run's stages (id > before max): old-stage
        # eviction between snapshots can no longer deflate the figure
        after = _store_totals(spark, min_stage_id=before["max_stage_id"] + 1)
        if after["n_stages"] > retained // 2:
            print(f"# WARNING {name}: {after['n_stages']} stages vs "
                  f"spark.ui.retainedStages={retained} — a single run "
                  f"near the cap can self-evict; raise retainedStages",
                  file=sys.stderr)
        out[name] = {k: after[k] for k in after if k != "max_stage_id"}
        print(f"# {sf_dir.rsplit('/', 1)[-1]} {name}: "
              f"sw={out[name]['shuffle_write']} sr={out[name]['shuffle_read']} "
              f"in={out[name]['input']} spill={out[name]['spill_disk']} "
              f"skipped={out[name]['n_skipped']}",
              file=sys.stderr)
    return out


def _fmt(b: int) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if abs(b) < 1024 or unit == "GB":
            return f"{b:.1f} {unit}" if unit != "B" else f"{b} B"
        b /= 1024
    return f"{b:.1f} GB"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--scaled", default=None,
                    help="second corpus dir (scale_probe output); adds a "
                         "bytes-ratio column")
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--skip-xml", action="store_true")
    ap.add_argument("--attach-cap", type=int, default=None,
                    help="override operators._ATTACH_BROADCAST_CAP "
                         "(bytes). --attach-cap 0 forces every "
                         "dim_side/payload_side guard to its beyond-cap "
                         "strategy at ANY scale, so a small corpus runs "
                         "the same post-crossover plan as a large one — "
                         "the only way to read a clean byte RATIO across "
                         "a decade that otherwise straddles the "
                         "broadcast→shuffle_hash/merge transition "
                         "(SCALE.md r13 setsim account)")
    args = ap.parse_args()

    from bench import HEADLINE
    from xml_hive_spark.session import get_spark

    if args.attach_cap is not None:
        import xml_hive_spark.operators as _ops
        _ops._ATTACH_BROADCAST_CAP = args.attach_cap
        print(f"# _ATTACH_BROADCAST_CAP overridden to {args.attach_cap}",
              file=sys.stderr)

    names = args.queries or list(HEADLINE)
    if args.skip_xml and "xml_scan_bench" in names:
        names.remove("xml_scan_bench")

    spark = get_spark(app_name="xml-hive-spark-shuffle-audit",
                      extra_conf={"spark.ui.retainedStages": "100000",
                                  "spark.ui.retainedJobs": "100000"})
    base = measure(spark, names, args.sf_dir)
    scaled = measure(spark, names, args.scaled) if args.scaled else None
    spark.stop()

    report = {}
    for n in names:
        report[n] = dict(base[n])
        if scaled:
            report[n]["scaled_shuffle_write"] = scaled[n]["shuffle_write"]
            bw = base[n]["shuffle_write"]
            report[n]["shuffle_ratio"] = (
                round(scaled[n]["shuffle_write"] / bw, 2) if bw > 0 else None
            )
    print(json.dumps({"sf_dir": args.sf_dir, "scaled": args.scaled,
                      "queries": report}))

    hdr = "| query | shuffle W | shuffle R | input | spill |"
    sep = "|---|---|---|---|---|"
    if scaled:
        hdr += " shuffle W @scaled | ratio |"
        sep += "---|---|"
    print("\n" + hdr, file=sys.stderr)
    print(sep, file=sys.stderr)
    for n in sorted(names, key=lambda x: -report[x]["shuffle_write"]):
        r = report[n]
        row = (f"| {n} | {_fmt(r['shuffle_write'])} | {_fmt(r['shuffle_read'])}"
               f" | {_fmt(r['input'])} | {_fmt(r['spill_disk'])} |")
        if scaled:
            ratio = r["shuffle_ratio"]
            row += (f" {_fmt(r['scaled_shuffle_write'])} |"
                    f" {ratio if ratio is not None else '—'} |")
        print(row, file=sys.stderr)


if __name__ == "__main__":
    main()
