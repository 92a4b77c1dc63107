"""Strict audit: any float column whose Spark and DuckDB values differ
AT ALL (bitwise, after canonical sort) is a driver hash-fail risk.

--changed [GITREF] (r5 verdict item 7): map a git diff (working tree
vs GITREF, default HEAD) to the affected registry queries via each
query fn's defining module, and re-verify exactly that subset at the x10
staging — so a per-commit CI run exercises a change at scale without
paying the ~2h full sweep.  Changes to shared engine files (catalog,
functions, plans, session, registry) affect everything; those fall
back to the scale_stress DEFAULT_QUERIES pool, disclosed in the
artifact.  Writes CHANGED_AUDIT_x10.json.
"""
import sys
sys.path.insert(0, "/root/repo")
import duckdb
import numpy as np

from scache_spark.registry import REGISTRY, _ensure_loaded
from scache_spark.session import get_session
from tests.conftest import canonicalize

_ensure_loaded()


def _changed_mode(ref: str) -> None:
    import json
    import os
    import subprocess

    from __spark_entry__ import oracle_sql
    from tools.scale_stress import DEFAULT_QUERIES, REST_EXCLUDE, run_queries, stage

    files = subprocess.run(
        ["git", "diff", "--name-only", ref],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    ).stdout.split()
    mod_queries: dict[str, list[str]] = {}
    for name, spec in REGISTRY.items():
        mod_queries.setdefault(spec.fn.__module__, []).append(name)
    affected: set[str] = set()
    engine_wide: list[str] = []
    for f in files:
        if not (f.endswith(".py") and f.startswith("scache_spark/")):
            continue
        mod = f[:-3].replace("/", ".")
        if mod.endswith(".__init__"):
            mod = mod[: -len(".__init__")]
        if mod in mod_queries:
            affected.update(mod_queries[mod])
        else:
            engine_wide.append(f)
    if engine_wide:
        # a shared-engine change can affect any plan: fall back to the
        # scale-constants pool rather than guessing a narrower set
        affected.update(DEFAULT_QUERIES)
    skipped = sorted(affected & REST_EXCLUDE)  # separately x10-verified
    names = sorted(
        n for n in affected
        if n not in REST_EXCLUDE and REGISTRY[n].oracle is not None
    )
    rows_only = sorted(
        n for n in affected if REGISTRY[n].oracle is None
    )
    out: dict = {
        "ref": ref,
        "changed_files": files,
        "engine_wide_files": engine_wide,
        "skipped_rest_excluded": skipped,
        "skipped_no_oracle": rows_only,
    }
    if not names:
        out.update({"n_queries": 0, "n_fail": 0, "queries": {}})
        print("no registry queries affected by this diff")
    else:
        print(f"{len(names)} affected queries; staging x10 ...", flush=True)
        sf_dir = stage("/root/testdata/sf0.1", 10)
        spark = get_session("changed-audit")
        results = run_queries(spark, sf_dir, names, oracle_sql())
        out.update({
            "n_queries": len(results),
            "n_fail": sum(1 for r in results.values() if r["status"] == "FAIL"),
            "queries": results,
        })
    path = os.path.join("/root/repo", "CHANGED_AUDIT_x10.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    sys.exit(1 if out["n_fail"] else 0)


if "--changed" in sys.argv:
    _args = [a for a in sys.argv[1:] if a != "--changed"]
    _changed_mode(_args[0] if _args else "HEAD")

SF = "/root/testdata/sf0.01"
spark = get_session("strict-audit")
con = duckdb.connect()
for name in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF}/{name}.parquet')")

# optional scoping: `python tools/strict_audit.py [substring ...]` audits
# only queries whose name contains any given substring (a full sweep
# takes several minutes; scoped runs gate individual changes)
_filters = [a for a in sys.argv[1:] if not a.startswith("-")]

risky = []
for name, spec in sorted(REGISTRY.items()):
    if spec.oracle is None:
        continue
    if _filters and not any(f in name for f in _filters):
        continue
    try:
        s = canonicalize(spec.fn(spark, SF).toPandas())
        o = canonicalize(con.execute(spec.oracle).df())
        if len(s) != len(o) or list(s.columns) != list(o.columns):
            risky.append((name, "SHAPE", ""))
            continue
        for col in s.columns:
            sv, ov = s[col].to_numpy(), o[col].to_numpy()
            if np.issubdtype(sv.dtype, np.floating) and np.issubdtype(ov.dtype, np.floating):
                a, b = np.nan_to_num(sv, nan=-1e308), np.nan_to_num(ov, nan=-1e308)
                if not np.array_equal(a, b):
                    d = np.max(np.abs(a - b))
                    risky.append((name, col, f"maxdiff={d:.3e}"))
            elif str(sv.dtype) != str(ov.dtype):
                # datetime unit (ns vs us) and datetime-vs-object are
                # normalized by the driver (r01 evidence:
                # filter_project_cast passed with object vs datetime64);
                # flag everything else (e.g. int32 vs int64)
                kinds = {str(sv.dtype), str(ov.dtype)}
                if not any("datetime" in k for k in kinds):
                    risky.append((name, col, f"dtype {sv.dtype} vs {ov.dtype}"))
    except Exception as e:
        risky.append((name, "ERROR", str(e)[:120]))

if risky:
    for r in risky:
        print("RISK", *r)
else:
    print("ALL BIT-EXACT")
