"""Dump `.explain("formatted")` for named queries into plans/r10/.

    python tools/dump_plans_r10.py SUFFIX QUERY [QUERY...]

Writes plans/r10/<query>_<SUFFIX>.txt (SUFFIX = before|after).  The
optimization-round judge checks plan claims against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from scache_spark.registry import REGISTRY, _ensure_loaded
from scache_spark.session import get_session

OUT = "/root/repo/plans/r10"


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    _ensure_loaded()
    spark = get_session("plans-r10")
    sf = "/root/testdata/sf0.1"
    if any(n.startswith("stream_") for n in names):
        from scache_spark.streaming.windows import (
            _staged_documents_dir,
            _staged_events_dir,
        )

        _staged_events_dir(spark, sf, copies=1)
        _staged_documents_dir(spark, sf)
    for name in names:
        df = REGISTRY[name].fn(spark, sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
