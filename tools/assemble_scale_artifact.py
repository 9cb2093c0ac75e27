"""Assemble SCALE_EXPONENTS_r{N}.json from two scale_probe runs.

The probe emits one JSON line per run (stdout, mixed into the log).
Decade 1 (src=sf0.1, dst=sf1) becomes the ``factor10`` section with
``exp_1_to_10``; decade 2 (src=sf1, dst=sf10) becomes ``factor100``
with ``exp_10_to_100`` — the layout tests/test_scale_probe.py pins and
the --regress gate parses. The decade-2 regression check (the gate
itself can only read the section matching --factor) is replayed here
against the prior artifact's factor100 section.

Usage: python tools/assemble_scale_artifact.py <decade1.log> <decade2.log>
           <round> <prior_artifact.json> <out.json> [--method "..."]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.scale_probe import regress_bar  # noqa: E402


def probe_json(log_path: str) -> dict:
    for line in Path(log_path).read_text().splitlines():
        if line.startswith('{"factor"'):
            return json.loads(line)
    raise SystemExit(f"no probe JSON line in {log_path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("decade1")
    ap.add_argument("decade2")
    ap.add_argument("round", type=int)
    ap.add_argument("prior")
    ap.add_argument("out")
    ap.add_argument("--method", default="")
    args = ap.parse_args()

    d1 = probe_json(args.decade1)
    d2 = probe_json(args.decade2)
    prior = json.load(open(args.prior))

    factor10 = {
        q: {"exp_1_to_10": r["exp"], "t_sf0.1": r["t1"], "t_sf1": r["tF"]}
        for q, r in sorted(d1["queries"].items())
    }
    factor100 = {
        q: {"exp_10_to_100": r["exp"], "t_sf1": r["t1"], "t_sf10": r["tF"]}
        for q, r in sorted(d2["queries"].items())
    }

    # decade-2 regression check against the prior factor100 section
    failures = []
    for q, rec in factor100.items():
        base = prior.get("factor100", {}).get(q, {})
        base_exp = next((v for k, v in base.items() if k.startswith("exp")), None)
        bar = regress_bar(base_exp)
        if rec["exp_10_to_100"] is None or rec["exp_10_to_100"] > bar:
            failures.append((q, rec["exp_10_to_100"], base_exp, bar))
    for q, got, base, bar in failures:
        print(f"# factor100 REGRESSED {q}: measured {got} vs recorded "
              f"{base} (bar {bar:.2f})", file=sys.stderr)

    art = {
        "round": args.round,
        "method": args.method,
        "factor10": factor10,
        "factor100": factor100,
    }
    Path(args.out).write_text(json.dumps(art, indent=1, sort_keys=True) + "\n")
    print(f"wrote {args.out}: {len(factor10)} f10, {len(factor100)} f100, "
          f"{len(failures)} decade-2 regressions", file=sys.stderr)
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
