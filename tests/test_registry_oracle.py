"""Every registered query must match its DuckDB oracle (the same check
the driver runs at sf0.01); oracle-less queries must at least run and
return a stable schema."""

from __future__ import annotations

import pytest

from rippled_historical_database_spark.plans.registry import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir, query_df):
    # Built through the session-scoped shared cache (conftest query_df):
    # one build per query per suite (the streaming twins execute on
    # construction, so the duplicate build with test_oracle_dtypes cost
    # real minutes -- r15).  The cache builds with
    # SPARK_GRAFT_ORACLE_VERIFY=1, so dual-form queries still serve
    # their exact (oracle-pinned) form and crossing a size-dispatch
    # threshold raises loudly (functions/dispatch.py).
    q = QUERIES[name]
    df = query_df(name)
    if q.oracle is None:
        rows = df.limit(10001).collect()
        assert df.schema is not None
        assert rows is not None
        return
    errors = __import__("tests.oracle", fromlist=["compare"]).compare(
        df, duck, q.oracle
    )
    assert not errors, f"{name}: " + "; ".join(errors)


def test_fround_literals_are_consistent():
    """Structural lint for the fixed-point FLOOR rounding literals the
    round-12 tie-portability rewrite inlined into oracle SQL (and that
    sql_fround generates): in `FLOOR(x * Me0 + 0.5) / Ne0`, M must
    equal N and be a power of ten -- a mistyped zero in any one copy
    would silently re-scale one engine's output."""
    import re

    pat = re.compile(r"\*\s*(\d+)e0\s*\+\s*0\.5\)\s*/\s*(\d+)e0")
    checked = 0
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        for mult, div in pat.findall(q.oracle):
            checked += 1
            assert mult == div, (name, mult, div)
            assert set(mult[1:]) <= {"0"} and mult[0] == "1", (name, mult)
    assert checked > 50  # the family is large; a refactor that drops
    #                      the pattern wholesale should fail this too


def test_no_native_round_in_oracles():
    """Native ROUND is engine-version-sensitive: Spark rounds HALF_UP
    on the double's shortest decimal repr, DuckDB nearbyints the scaled
    product (half-to-even, semantics that have drifted across DuckDB
    releases) -- rounds 11/12's only driver-red rows were exactly such
    emissions.  Round 13 converted every rounding (including
    davg_round's integer grid snap) to the floor-based
    fround/sql_fround forms; this lint keeps it absolute: no registered
    oracle may call ROUND at all."""
    import re

    def round_calls(sql: str) -> list[str]:
        # strip -- line comments (prose may legitimately mention ROUND)
        sql = re.sub(r"--[^\n]*", "", sql)
        # a bare ROUND function call: not FROUND/_ROUND/etc.
        return [
            m.group(0)
            for m in re.finditer(
                r"(?<![A-Za-z0-9_])ROUND\s*\(", sql, re.IGNORECASE
            )
        ]

    offenders = {
        name: calls
        for name, q in QUERIES.items()
        if q.oracle is not None
        for calls in [round_calls(q.oracle)]
        if calls
    }
    assert not offenders, (
        "native ROUND in oracle SQL (use sql_fround/sql_davg_round): "
        f"{offenders}"
    )


def test_no_native_round_in_engine_sources():
    """The engine-side half of the ROUND lint: no `F.round(` anywhere
    in the plan-building sources (operators/streaming/plans/functions).
    The single allowed site is davg_round's integer grid-snap inside
    functions/numeric.py."""
    import os

    import rippled_historical_database_spark as pkg

    root = os.path.dirname(pkg.__file__)
    offenders = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, root)
            if rel == os.path.join("functions", "numeric.py"):
                continue  # davg_round's documented grid snap
            with open(path, encoding="utf-8") as f:
                for i, line in enumerate(f, 1):
                    if "F.round(" in line:
                        offenders.append(f"{rel}:{i}")
    assert not offenders, f"F.round in engine sources (use fround): {offenders}"
