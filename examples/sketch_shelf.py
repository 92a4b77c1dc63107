"""The sketch shelf: every summary structure the engine ships, on one
page — the "ship a summary, not the data" design the reference's
1-byte log1.1 MapStatus sizes embody (scheduler/MapStatus.scala:62-81),
generalized to the full Datasketches-era toolbox:

  membership   bloom_bitmap_membership   (bit_or word filter, broadcast probe)
  distinct     hll_sketch_union_bound    (mergeable HLL table, union rollup)
               hll_sketch_intersect_bound (inclusion-exclusion workaround)
  set algebra  theta_sketch_set_ops      (native union/intersect/difference)
  frequency    heavy_hitters_cms         (Count-Min grid, batch)
               stream_cms_heavy_users    (same grid maintained at arrival)
  quantiles    kll_quantile_sketch_merge (per-shard KLL rows, merge at read)
  drift        kll_sketch_ks_drift       (KS raised from stored sketches)
  similarity   minhash_merge_property    (signature merge law)

Each is oracle-verified in the registry; this demo just runs the
batch members end-to-end and prints the verdicts.

Run: python examples/sketch_shelf.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scache_spark.registry import REGISTRY, _ensure_loaded
from scache_spark.session import get_session

SHELF = [
    "bloom_bitmap_membership",
    "hll_sketch_union_bound",
    "hll_sketch_intersect_bound",
    "theta_sketch_set_ops",
    "heavy_hitters_cms",
    "kll_quantile_sketch_merge",
    "kll_sketch_ks_drift",
    "minhash_merge_property",
]


def main(sf_dir: str) -> None:
    _ensure_loaded()
    spark = get_session("sketch-shelf")
    for name in SHELF:
        rows = REGISTRY[name].fn(spark, sf_dir).collect()
        # verdicts summarized over ALL rows (deterministic — a single
        # unordered row would print an arbitrary one)
        verdicts: dict[str, bool] = {}
        for r in rows:
            for k, v in r.asDict().items():
                if isinstance(v, bool):
                    verdicts[k] = verdicts.get(k, True) and v
        vs = " ".join(f"all_{k}={v}" for k, v in sorted(verdicts.items()))
        print(f"{name:32s} {len(rows)} row(s)  {vs}")
    # no spark.stop(): the session is shared when main() is driven
    # in-process (tests/test_examples.py); CLI exit tears the JVM down


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
