"""Self-check harness: run every queries() entry on Spark AND its
oracle_sql() on DuckDB over the same parquet tables, compare row count,
schema (column names), and order-insensitive values.

Mirrors the driver's correctness gate so mismatches surface before a
round ends. Floats are compared exactly by default (the engine's
decimal-aggregation discipline is supposed to make them bit-identical);
``--tol`` relaxes to a relative tolerance to distinguish "format"
mismatches from genuine logic bugs.

Usage: python tools/verify_oracles.py [--sf /root/testdata/sf0.01] [--only name,...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from porcupine_spark.session import get_spark
from porcupine_spark.tables import TABLES, table_path


def norm_cell(v, tol: float):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        if tol > 0:
            if v == 0:
                return "0"
            from math import floor, log10

            digits = max(0, -floor(log10(abs(v) * tol)))
            return f"{v:.{min(digits, 17)}f}"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm_cell(x, tol) for x in v) + "]"
    return str(v)


def canon(df: pd.DataFrame, tol: float) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v, tol) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default="")
    ap.add_argument("--tol", type=float, default=0.0, help="relative float tolerance (0=exact)")
    ap.add_argument(
        "--strict-dtypes",
        action="store_true",
        help="treat spark-vs-oracle pandas dtype drift as FAILURE, not a note "
        "(guards against a dtype-strict driver schema check)",
    )
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = {s for s in args.only.split(",") if s}

    spark = get_spark("verify_oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(args.sf, t)}')"
        )

    failures, passes, skips = [], [], []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL  {name:32s} spark error: {e}")
            continue
        if name not in oracles:
            skips.append(name)
            print(f"SKIP  {name:32s} rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL  {name:32s} oracle error: {e}")
            continue
        problems = []
        if sorted(sdf.columns) == sorted(odf.columns):
            # dtype drift is a warning by default (the driver may or may
            # not hash types); --strict-dtypes promotes it to failure
            for c in sorted(sdf.columns):
                st_, ot_ = str(sdf[c].dtype), str(odf[c].dtype)
                if st_ != ot_:
                    # all-null columns differ vacuously (pandas picks
                    # object vs float64 per engine with no values to
                    # compare); real drift is a concrete dtype pair
                    if sdf[c].isna().all() and odf[c].isna().all():
                        continue
                    if args.strict_dtypes:
                        problems.append(f"dtype {c}: spark={st_} oracle={ot_}")
                    else:
                        print(f"  dtype  {name}.{c}: spark={st_} oracle={ot_}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"schema: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        elif len(sdf) != len(odf):
            problems.append(f"rowcount: spark={len(sdf)} oracle={len(odf)}")
        else:
            a, b = canon(sdf, args.tol), canon(odf, args.tol)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ; first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name:32s} {problems[0][:220]}")
        else:
            passes.append(name)
            print(f"PASS  {name:32s} {len(sdf)} rows, {time.time()-t0:.1f}s")

    print(
        f"\n{len(passes)} pass, {len(failures)} fail, {len(skips)} rows-only "
        f"of {len(qs)} queries at {args.sf}"
    )
    for name, why in failures:
        print(f"  FAIL {name}: {why[:300]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
