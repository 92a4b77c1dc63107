"""Run the full TPC-H-shaped battery (Q1-Q22 adapted to the fixture
schema) through the registry and print per-query wall times — the
artifact a user migrating from the reference runs first to see the
relational surface work end-to-end.

Run: python examples/tpch_battery.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scache_spark.registry import REGISTRY, _ensure_loaded
from scache_spark.session import get_session

def main(sf_dir: str) -> None:
    _ensure_loaded()
    # Q1 lives under its operator-family name; Q2-Q22 are tpch_*.
    battery = ["pricing_summary"] + sorted(
        n for n in REGISTRY if n.startswith("tpch_")
    )
    spark = get_session("tpch-battery")
    spark.range(1000).count()
    total = 0.0
    for name in battery:
        t0 = time.time()
        n = REGISTRY[name].fn(spark, sf_dir).count()
        dt = time.time() - t0
        total += dt
        print(f"{name:40s} {dt:6.2f}s  ({n} rows)")
    print(f"{'TOTAL':40s} {total:6.2f}s  ({len(battery)} queries)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
