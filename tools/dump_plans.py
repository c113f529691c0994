"""Dump `.explain("formatted")` for named queries to plans/<tag>/.

Used by the optimization rounds to commit before/after physical plans
(the judge checks plan claims against these files).

Usage:
  python tools/dump_plans.py --tag r07 --suffix before \
      --only pq_adc_topk,pq_code_histogram [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from porcupine_spark.plans.registry import load_all_plans
from porcupine_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", required=True)
    ap.add_argument("--tag", default="r07")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    names = [n for n in args.only.split(",") if n]
    specs = load_all_plans()
    spark = get_spark("dump_plans")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.tag
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = specs[name].builder(spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
