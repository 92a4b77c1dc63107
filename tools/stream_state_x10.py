"""Streaming peak-state at x10 (r5 verdict item 5): measure every
stream query's peak state footprint on the x10 staged replica AND on
the sf0.1 base with the same code, and write the per-query ratio to
STREAM_STATE_x10.json at the repo root.

What "flat" means here: the x10 staging replicates facts with SHIFTED
surrogate keys (event_id/doc_id/order keys) but VERBATIM user_ids and
timestamps, so for state keyed by (user) or (window[, user]) the key
space is identical at x10 and peak state rows must not grow — state
is corpus-size-independent by construction for:

  * per-user keyed state (stream_stateful_user_totals,
    stream_update_mode_totals, stream_transform_with_state_mix) — the
    150-user key space is unchanged;
  * the shard-coalesced near-dup suppressor (stream_neardup_suppress)
    — state rows = touched (band, shard) pairs, bounded by
    N_BANDS * _NEARDUP_SHARDS regardless of corpus size;
  * the Count-Min sketch (stream_cms_heavy_users) — state size is the
    sketch geometry, never the stream cardinality;
  * windowed aggregates over verbatim-replicated timestamps — the
    (window, key) space is unchanged (counts grow, rows don't).

State that SHOULD scale with the replica (and is therefore reported,
not ratcheted): stream_dedup* (10x distinct event_ids to remember
inside the horizon) and the stream-stream joins (10x buffered rows
within the watermark).

Run:  python tools/stream_state_x10.py   (stages/reuses the x10 dir)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.gen_stream_state_baseline as G
from tools.scale_stress import stage

BASE = "/root/testdata/sf0.1"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "STREAM_STATE_x10.json",
)

# Peak state rows at x10 must stay within NOISE of the base run for
# these (see module docstring for why each is corpus-size-independent).
FLAT_FAMILY = [
    "stream_stateful_user_totals",
    "stream_update_mode_totals",
    "stream_transform_with_state_mix",
    "stream_neardup_suppress",
    "stream_cms_heavy_users",
    "stream_tumbling_window",
    "stream_sliding_window",
    "blocktrace_stream_waves",
]
FLAT_TOLERANCE = 1.5  # partition-assignment noise, never 10x


def main() -> None:
    from scache_spark.session import get_session

    print("staging x10 ...", flush=True)
    x10 = stage(BASE, 10)
    spark = get_session("stream-state-x10")
    names = G.stream_query_names()
    report: dict[str, dict] = {}
    violations: list[str] = []
    for name in names:
        rows = {}
        for label, sf_dir in (("base", BASE), ("x10", x10)):
            G.SF = sf_dir  # measure() reads the module global
            m = G.measure(spark, name)
            rows[label] = m["state_rows"]
        ratio = (rows["x10"] / rows["base"]) if rows["base"] else (
            0.0 if rows["x10"] == 0 else float("inf")
        )
        flat = name in FLAT_FAMILY
        report[name] = {
            "base_rows": rows["base"],
            "x10_rows": rows["x10"],
            "ratio": round(ratio, 3),
            "flat_family": flat,
        }
        if flat and ratio > FLAT_TOLERANCE:
            violations.append(f"{name}: x10/base state rows = {ratio:.2f}")
        print(
            f"  {name:36s} base={rows['base']:>8} x10={rows['x10']:>8} "
            f"ratio={ratio:7.2f}{'  FLAT' if flat else ''}",
            flush=True,
        )
    out = {
        "base": BASE,
        "factor": 10,
        "flat_tolerance": FLAT_TOLERANCE,
        "violations": violations,
        "queries": report,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"\n{'FLAT FAMILY HELD' if not violations else violations} — wrote {OUT}"
    )
    sys.exit(1 if violations else 0)


if __name__ == "__main__":
    main()
