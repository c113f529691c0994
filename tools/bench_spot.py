"""Spot-bench a named query subset at an arbitrary scale dir.

The per-round full benches run at sf0.1 and the 10x corpus; this tool
extends the scaling curve to bigger synthetic corpora (e.g. the 100x
~sf10 dir from make_scale_data --copies 100) for a REPRESENTATIVE
heavy subset — full 256-query runs at 100x would burn an hour for no
extra signal. One JSON line per query: wall seconds + shuffle-read MB.

Usage:
  python tools/bench_spot.py --sf /tmp/porcupine_scale_sf10 \
      --only pagerank_supplier_graph,dedup_ngram_jaccard [--runs 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from porcupine_spark.functions.metrics import drop_session_residue, shuffle_read_bytes
from porcupine_spark.plans.registry import load_all_plans
from porcupine_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument("--only", required=True)
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    specs = load_all_plans()
    spark = get_spark("bench_spot")
    # warm the JVM/codegen/Arrow pool exactly like bench.py
    specs["q1_pricing_summary"].builder(spark, args.sf).count()

    out = {}
    for name in args.only.split(","):
        spec = specs[name]
        best, best_mb, rows = None, None, None
        for _ in range(args.runs):
            sh0 = shuffle_read_bytes(spark)
            t0 = time.perf_counter()
            rows = spec.builder(spark, args.sf).count()
            dt = time.perf_counter() - t0
            mb = round((shuffle_read_bytes(spark) - sh0) / 1e6, 1)
            if best is None or dt < best:
                best, best_mb = dt, mb
            drop_session_residue(spark)
        out[name] = {"wall_s": round(best, 2), "shuffle_mb": best_mb, "rows": rows}
        print(json.dumps({"query": name, **out[name]}))
    print(json.dumps({"sf_dir": args.sf, "spot": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
