"""A/B the pagerank 10x shuffle ratio (VERDICT r6 #2).

pagerank_supplier_graph moved 18.8 -> 273 MB of shuffle for 10x data
(14.5x) in the round-6 sidecars — inside the growth model's slack but
the only expensive query with no pinned mechanism. Same experiment
that proved the dedup family linear: run the query at sf0.1 and at the
10x corpus under (a) default planning and (b)
spark.sql.autoBroadcastJoinThreshold=-1, recording shuffle-read bytes.
If the broadcast-free ratio is ~10x, the default super-linearity is
join sides crossing the broadcast threshold between scales (the
documented lost-broadcast mechanism); if it stays ~14x, edge mass
itself grows super-linearly and needs an EXPECTED_SUPERLINEAR cap.

Usage: python tools/ab_pagerank.py [--tenx /tmp/porcupine_scale_sf1]
Prints one JSON line with the four cells.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_cell(sf_dir: str, nobcast: bool) -> dict:
    """One (scale, policy) cell in a FRESH JVM so metrics don't bleed."""
    from porcupine_spark.functions.metrics import shuffle_read_bytes
    from porcupine_spark.plans.registry import load_all_plans
    from porcupine_spark.session import get_spark

    spark = get_spark("ab_pagerank")
    if nobcast:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spec = load_all_plans()["pagerank_supplier_graph"]
    sh0 = shuffle_read_bytes(spark)
    t0 = time.perf_counter()
    n = spec.builder(spark, sf_dir).count()
    dt = time.perf_counter() - t0
    sh1 = shuffle_read_bytes(spark)
    out = {
        "sf_dir": sf_dir,
        "nobcast": nobcast,
        "rows": n,
        "wall_s": round(dt, 2),
        "shuffle_mb": round((sh1 - sh0) / 1e6, 1),
    }
    spark.stop()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--tenx", default="/tmp/porcupine_scale_sf1")
    ap.add_argument("--cell", default="", help="internal: run one cell")
    args = ap.parse_args()

    if args.cell:
        sf_dir, nobcast = args.cell.rsplit(":", 1)
        print("CELL " + json.dumps(run_cell(sf_dir, nobcast == "1")))
        return 0

    import subprocess

    cells = []
    for sf_dir in (args.sf01, args.tenx):
        for nobcast in (False, True):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--cell", f"{sf_dir}:{1 if nobcast else 0}"],
                capture_output=True, text=True,
            )
            line = next(
                (ln for ln in p.stdout.splitlines() if ln.startswith("CELL ")), None
            )
            if line is None:
                print(p.stdout[-2000:], p.stderr[-2000:])
                return 1
            cell = json.loads(line[5:])
            cells.append(cell)
            print(json.dumps(cell))

    by = {(c["sf_dir"] == args.tenx, c["nobcast"]): c for c in cells}
    summary = {
        "default_ratio": round(
            by[(True, False)]["shuffle_mb"] / max(by[(False, False)]["shuffle_mb"], 0.1), 1
        ),
        "nobcast_ratio": round(
            by[(True, True)]["shuffle_mb"] / max(by[(False, True)]["shuffle_mb"], 0.1), 1
        ),
        "cells": cells,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
