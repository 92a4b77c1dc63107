"""Micro-batch profiler for the streaming queries (guide §1).

    python tools/profile_stream.py QUERY [SF_DIR] [REPS]

Runs a registered stream_* query REPS times and prints, per run:
total wall, the batch count, and the summed durationMs components
(addBatch, getBatch, latestOffset, queryPlanning, walCommit,
commitOffsets, triggerExecution) across all micro-batches — the
breakdown that attributes availableNow fixed cost to planning vs WAL
vs state-store vs execution.  Diagnostic tool, not an artifact
generator.
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scache_spark.registry import REGISTRY, _ensure_loaded
from scache_spark.session import get_session

_PROGRESS: list[dict] = []


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    _ensure_loaded()
    spark = get_session(f"profile-stream-{name}")
    from scache_spark.streaming.windows import (
        _staged_documents_dir,
        _staged_events_dir,
    )

    _staged_events_dir(spark, sf_dir, copies=1)
    _staged_events_dir(spark, sf_dir, copies=2)
    _staged_documents_dir(spark, sf_dir)
    spark.range(1000).count()

    # hook every progress event via a listener so we see ALL batches
    from pyspark.sql.streaming import StreamingQueryListener

    class L(StreamingQueryListener):
        def onQueryStarted(self, e):
            pass

        def onQueryProgress(self, e):
            p = e.progress
            _PROGRESS.append(
                {
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "durationMs": dict(p.durationMs),
                }
            )

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            pass

    spark.streams.addListener(L())
    spec = REGISTRY[name]
    for rep in range(reps + 1):  # rep 0 = warm-up
        _PROGRESS.clear()
        t0 = time.time()
        n = spec.fn(spark, sf_dir).count()
        wall = time.time() - t0
        time.sleep(0.3)  # let late progress events drain
        comp: Counter = Counter()
        for p in _PROGRESS:
            for k, v in p["durationMs"].items():
                comp[k] += v
        tag = "warm" if rep == 0 else f"rep{rep}"
        print(
            f"{tag}: wall={wall:.2f}s rows={n} batches={len(_PROGRESS)} "
            f"inputRows={[p['numInputRows'] for p in _PROGRESS]}"
        )
        print(f"  durationMs totals: {dict(sorted(comp.items(), key=lambda kv: -kv[1]))}")
        per_batch = [
            (p["batchId"], p["durationMs"].get("triggerExecution", 0))
            for p in _PROGRESS
        ]
        print(f"  per-batch triggerExecution ms: {per_batch}")


if __name__ == "__main__":
    main()
