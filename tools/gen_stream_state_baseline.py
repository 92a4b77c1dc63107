"""Record each streaming query's final state-store footprint
(rows + bytes summed over stateful operators, from the query's last
StreamingQueryProgress) into tools/stream_state_baseline.json.

Run deliberately after changing a streaming operator — the ratchet in
tests/test_stream_state_baseline.py compares live runs against this
file and fails CI when state ROWS grow past 2x (bytes are recorded
for observability only: they swing with the store provider and JVM).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scache_spark.registry import REGISTRY, _ensure_loaded
from scache_spark.session import get_session
from scache_spark.streaming import windows as W

SF = os.environ.get("STREAM_STATE_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "stream_state_baseline.json")


def stream_query_names() -> list[str]:
    _ensure_loaded()
    return sorted(
        n
        for n in REGISTRY
        if n.startswith("stream_") or n == "blocktrace_stream_waves"
    )


def measure(spark, name: str) -> dict[str, int]:
    """Run one registry stream query and sum the state footprint over
    every run_stream invocation it made (some queries run more than
    one stream, e.g. CDC build + serve)."""
    W.LAST_STATE_METRICS.clear()
    REGISTRY[name].fn(spark, SF).count()
    return {
        "state_rows": sum(
            m["state_rows"] for m in W.LAST_STATE_METRICS.values()
        ),
        "state_bytes": sum(
            m["state_bytes"] for m in W.LAST_STATE_METRICS.values()
        ),
        "n_streams": len(W.LAST_STATE_METRICS),
    }


def main() -> None:
    spark = get_session("stream-state-baseline")
    baseline: dict[str, dict[str, int]] = {}
    for name in stream_query_names():
        baseline[name] = measure(spark, name)
        print(f"  {name:40s} rows={baseline[name]['state_rows']:>8} "
              f"bytes={baseline[name]['state_bytes']:>10}")
    with open(OUT, "w") as f:
        json.dump(baseline, f, indent=1, sort_keys=True)
    print(f"wrote {len(baseline)} stream state baselines to {OUT}")


if __name__ == "__main__":
    main()
