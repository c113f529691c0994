"""Shuffle-byte regression check: diff BENCH_DETAIL.json's per-query
``shuffle_read_mb`` against the committed baseline.

The failure mode this catches: a plan regression that swaps a broadcast
join for a shuffled one (or loses a pushed-down filter) moves
table-sized bytes through the shuffle but may hide inside wall-clock
noise on a warm local machine. Bytes don't lie: a query whose shuffle
volume jumps by BOTH >= ABS_MB and >= REL_FACTOR vs baseline is
flagged.

Usage:
  python tools/shuffle_regressions.py                 # check vs baseline
  python tools/shuffle_regressions.py --rebaseline    # accept current
Exit 1 on any flagged query (same contract as plan_audit).

Thresholds are deliberately loose: AQE wobble and row-count drift move
single-digit MB at sf0.1; a lost broadcast moves the fact table.
"""

from __future__ import annotations

import argparse
import json
import os

ABS_MB = 32.0  # ignore jumps smaller than this (noise floor at sf0.1)
REL_FACTOR = 3.0  # and require >= 3x the baseline volume

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(ROOT, "BENCH_DETAIL.json")
BASELINE = os.path.join(ROOT, "BENCH_SHUFFLE_BASELINE.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rebaseline", action="store_true")
    args = ap.parse_args()

    with open(DETAIL) as fh:
        detail = json.load(fh)
    current: dict[str, float] = detail.get("shuffle_read_mb", {})
    if not current:
        print("BENCH_DETAIL.json carries no shuffle_read_mb — run bench.py first")
        return 1

    if args.rebaseline or not os.path.exists(BASELINE):
        with open(BASELINE, "w") as fh:
            json.dump(
                {"sf": detail.get("sf"), "shuffle_read_mb": current}, fh, indent=1
            )
        print(f"baseline written: {BASELINE} ({len(current)} queries)")
        return 0

    with open(BASELINE) as fh:
        base = json.load(fh)
    if base.get("sf") != detail.get("sf"):
        print(
            f"sf mismatch (baseline {base.get('sf')}, detail {detail.get('sf')}) "
            "— not comparable; re-run bench at the baseline sf or --rebaseline"
        )
        return 1
    baseline: dict[str, float] = base["shuffle_read_mb"]

    flagged = []
    for name, mb in sorted(current.items()):
        b = baseline.get(name)
        if b is None:
            continue  # new query: no baseline yet (next --rebaseline picks it up)
        if mb - b >= ABS_MB and mb >= REL_FACTOR * max(b, 0.1):
            flagged.append((name, b, mb))
    n_new = len(set(current) - set(baseline))
    print(
        f"checked {len(current)} queries vs baseline "
        f"({n_new} new, not compared): {len(flagged)} flagged"
    )
    for name, b, mb in flagged:
        print(f"  SHUFFLE REGRESSION {name}: {b} MB -> {mb} MB")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
