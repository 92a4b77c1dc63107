"""Plan-shape ratchet: every non-streaming query's physical plan must
need NO MORE exchanges and NO MORE broad same-file scans than the
recorded baseline (tools/plan_baseline.json).

This catches the regression class the absolute lint thresholds cannot:
plan_lint flags >8 exchanges and >2 same-file scans, so a query that
drifts from 3 exchanges to 7 — a real 100 TB regression — passes the
lint silently.  Against the ratchet it fails here with the delta.

Improvements (fewer than baseline) pass; refresh the file deliberately
with `python tools/gen_plan_baseline.py` so the ratchet tightens.  A
NEW query must be in the baseline before CI accepts it — regenerating
is part of adding an operator.
"""

from __future__ import annotations

import json
import os

from scache_spark.plans import SHAPE_SKIP_PREFIXES, shape_counts
from scache_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "plan_baseline.json",
)

with open(BASELINE_PATH) as _f:
    BASELINE: dict[str, dict[str, int]] = json.load(_f)

# plans are SF-dependent (size stats drive join strategy), so the
# ratchet compares at the SF the baseline was generated at
_BASELINE_SF = "/root/testdata/sf0.01"

BATCH_QUERIES = sorted(
    n for n in REGISTRY if not n.startswith(SHAPE_SKIP_PREFIXES)
)


def test_every_batch_query_has_a_baseline():
    missing = [n for n in BATCH_QUERIES if n not in BASELINE]
    assert missing == [], (
        f"{len(missing)} queries lack a plan baseline — run "
        f"`python tools/gen_plan_baseline.py`: {missing}"
    )


def test_no_plan_shape_regressions(plan_reports):
    """One sweep (explain only, nothing executes): current exchange and
    broad-scan counts must not exceed the recorded baseline.  The
    sweep itself is the session-shared plan_reports fixture."""
    regressions = []
    for name in BATCH_QUERIES:
        rec = BASELINE.get(name)
        if rec is None:  # reported by the test above
            continue
        rep = plan_reports[name]
        if isinstance(rep, Exception):
            raise rep
        cur = {"exchanges": rep["exchanges"], "broad_scans": rep["broad_scans"]}
        if (
            cur["exchanges"] > rec["exchanges"]
            or cur["broad_scans"] > rec["broad_scans"]
        ):
            regressions.append(
                f"{name}: exchanges {rec['exchanges']}->{cur['exchanges']}, "
                f"broad_scans {rec['broad_scans']}->{cur['broad_scans']}"
            )
    assert regressions == [], "\n".join(regressions)
