"""Driver-contract drive: run entry() + every queries()[name] against
oracle_sql() via DuckDB at sf0.01 -- the same check the round driver
performs, over the WHOLE registry instead of the driver's 50-slot
window.  Usage: python tests/drive_verify.py [sf_dir] [--out FILE]
[--tolerant] [--only name,name...] -- strict (bit-exact) by default.

``--out`` writes a per-query JSON artifact in the CORRECTNESS_r*.json
row shape; from round 10 on the repo commits it as SWEEP_r{N}.json so
the full-registry re-verification (which the 50-slot driver gate cannot
record) is auditable: re-run this script to reproduce it.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from rippled_historical_database_spark.session import get_spark  # noqa: E402
from tests.oracle import compare, duckdb_connection  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]  # drop the flag AND its value
    # Strict (bit-exact float comparison, driver hash parity) is the
    # DEFAULT from round 13 on: the tolerant mode's only remaining use
    # is diagnosing WHICH cell drifted once strict flags a query, so it
    # now requires an explicit --tolerant (a contributor can no longer
    # accidentally re-mask a driver-red class; round-11 lesson).
    # --strict is still accepted as a no-op for old invocations.
    strict = "--tolerant" not in argv
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    # Size-dispatched queries (layout keys, quantile drift) serve an
    # oracle-unpinned scale form above their row thresholds: make that
    # a loud harness-config error here, not a silent MISMATCH.
    os.environ["SPARK_GRAFT_ORACLE_VERIFY"] = "1"
    spark = get_spark("drive-verify")
    print("entry rows:", E.entry(spark).count())
    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb_connection(sf_dir)
    fails, rows = [], {}
    for name in sorted(qs):
        if only is not None and name not in only:
            continue
        if name in osql:
            errs = compare(qs[name](spark, sf_dir), con, osql[name], strict=strict)
            ok = not errs
            rows[name] = {
                "rows_match": ok, "schema_match": ok, "hash_match": ok,
                "err": "; ".join(errs)[:200] if errs else None,
            }
            if errs:
                fails.append(name)
                print(f"FAIL {name}: {errs[:2]}")
        else:
            n = qs[name](spark, sf_dir).count()
            rows[name] = {"rows_match": n >= 0, "err": None}
            print(f"rows-only {name}: {n} rows")
    mode = "strict" if strict else "tolerant"
    print(f"queries: {len(qs)}  oracles: {len(osql)}  mode: {mode}  FAILS: {fails}")
    if out_path:
        rows["__mode__"] = mode
        with open(out_path, "w") as f:
            json.dump(rows, f, indent=1, sort_keys=True)
        print(f"wrote {out_path}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
