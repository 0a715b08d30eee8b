"""Driver-contract drive: run entry() + every queries()[name] against
oracle_sql() via DuckDB at sf0.01 -- the same check the round driver
performs.  Usage: python tests/drive_verify.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from rippled_historical_database_spark.session import get_spark  # noqa: E402
from tests.oracle import compare, duckdb_connection  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("drive-verify")
    print("entry rows:", E.entry(spark).count())
    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb_connection(sf_dir)
    fails = []
    for name in sorted(qs):
        if name in osql:
            errs = compare(qs[name](spark, sf_dir), con, osql[name])
            if errs:
                fails.append(name)
                print(f"FAIL {name}: {errs[:2]}")
        else:
            print(f"rows-only {name}: {qs[name](spark, sf_dir).count()} rows")
    print(f"queries: {len(qs)}  oracles: {len(osql)}  FAILS: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
