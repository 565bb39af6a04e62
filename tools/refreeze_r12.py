#!/usr/bin/env python3
"""Re-freeze BASELINE.json from a round-end BENCH_DETAIL file (r12).

VERDICT r11 #2's mechanics need the freeze table and the CPU probe
reference to come from the SAME box state, so future runs can say
"this box is N× the freeze box" and normalize 2× verdicts
mechanically. The r04-r11 freezes were accreted across several boxes
(including healthy ones this box reads ~1.5× slower than on
untouched code), which is why the r11/r12 driver runs drowned in
ambient "violations". This tool:

- archives the previous freeze table as ``freezes_r11`` (one level of
  history; older tables live in git),
- writes ``freezes`` = the per-key values of the given BENCH_DETAIL
  run (sf0.1 + sf1 tiers, rounded up to 3dp),
- writes ``probe_ref`` = the probe block recorded in the SAME detail
  file (bench.py measures it at run start, outside timed regions).

Usage: refreeze_r12.py BENCH_DETAIL.json
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(HERE, "BASELINE.json")


def main() -> None:
    detail_path = sys.argv[1]
    with open(detail_path) as fh:
        detail = json.load(fh)
    with open(BASELINE) as fh:
        base = json.load(fh)

    freezes: dict[str, dict] = {}
    for k, v in detail["queries"].items():
        freezes.setdefault(k, {})["sf0.1"] = v
    for k, v in detail.get("tiers", {}).get("sf1", {}).get("queries", {}).items():
        freezes.setdefault(k, {})["sf1"] = v

    prev = base.get("freezes", {})
    base["freezes_r11"] = prev
    base["freezes"] = freezes
    probe = detail.get("probe", {}).get("start")
    if probe:
        base["probe_ref"] = {
            **probe,
            "note": "measured by bench.cpu_probe at the start of the "
            "r12 freeze run (same box state as the freezes)",
        }
    base["freezes_meta"] = {
        "round": 12,
        "source": os.path.basename(detail_path),
        "note": "full re-freeze at the r12 final HEAD on the r12 box "
        "(VERDICT r11 #2): freezes and probe_ref now share one box "
        "state, so the 2x checker normalizes by the probe ratio "
        "instead of drowning in host drift. Previous table archived "
        "as freezes_r11; the r11 box read ~1.5x these values' box on "
        "untouched code (BENCH_LOCAL_r12_onbox_before.json).",
    }
    with open(BASELINE, "w") as fh:
        json.dump(base, fh, indent=1)
    n1 = sum(1 for v in freezes.values() if "sf0.1" in v)
    n2 = sum(1 for v in freezes.values() if "sf1" in v)
    print(f"re-froze {n1} sf0.1 keys, {n2} sf1 keys; probe_ref={probe}")


if __name__ == "__main__":
    main()
