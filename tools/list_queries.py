"""List the registered query surface: name, tags, oracle status, doc.

Usage: python tools/list_queries.py [--tags]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from porcupine_spark.plans.registry import load_all_plans


def main() -> int:
    specs = load_all_plans()
    tag_counts: Counter = Counter()
    for name, spec in sorted(specs.items()):
        oracle = "oracle" if spec.oracle else "rows-only"
        tags = ",".join(spec.tags)
        print(f"{name:32s} [{oracle:9s}] ({tags})")
        if "--docs" in sys.argv:
            print(f"    {spec.doc.strip()[:160]}")
        tag_counts.update(spec.tags)
    n_oracle = sum(1 for s in specs.values() if s.oracle)
    print(f"\n{len(specs)} queries, {n_oracle} oracled, {len(specs) - n_oracle} rows-only")
    if "--tags" in sys.argv:
        for tag, n in tag_counts.most_common():
            print(f"  {tag}: {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
