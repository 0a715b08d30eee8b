"""Laws for the scale-form Z-order key (broadcast boundary artifact):
the key computation must plan with ZERO exchanges (that is its whole
point versus the exact-ntile global sort), its codes must sit within a
bucket of EXACT quantile coding, and occupancy must stay balanced --
the properties that keep the curve non-degenerate without requiring
bit-reproducible quantiles.

(The comparison baseline is exact QUANTILE bucketing, not the
registered NTILE form: NTILE front-loads the n mod M remainder --
buckets of ceil(n/M) then floor(n/M) -- so its cut points drift up to
(n mod M)/M ranks from the uniform quantile grid; at sf0.001 that is a
legitimate ~6-bucket systematic difference, measured.  Both are valid
equal-frequency codings; the artifact approximates the quantile one.)
"""

from __future__ import annotations

import bisect

from pyspark.sql import functions as F

from rippled_historical_database_spark.operators.layout import (
    M,
    zorder_scale_key,
)
from rippled_historical_database_spark.sources.catalog import load_table


def test_scale_zorder_key_is_zero_shuffle(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    df = zorder_scale_key(e)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan


def test_scale_codes_track_exact_quantiles_and_stay_balanced(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    rows = e.select(
        "event_id",
        F.col("ts").cast("double").alias("t"),
        F.col("value").cast("double").alias("v"),
    ).collect()
    approx = {
        r.event_id: (r.code_t, r.code_v)
        for r in zorder_scale_key(e).collect()
    }
    assert set(approx) == {r.event_id for r in rows}
    n = len(rows)

    def exact_codes(vals_by_id):
        srt = sorted(vals_by_id.values())
        bounds = [srt[max(0, round(i * n / M) - 1)] for i in range(1, M)]
        return {k: bisect.bisect_right(bounds, x) for k, x in vals_by_id.items()}

    ex_t = exact_codes({r.event_id: r.t for r in rows})
    ex_v = exact_codes({r.event_id: r.v for r in rows})
    off = [
        max(abs(approx[k][0] - ex_t[k]), abs(approx[k][1] - ex_v[k]))
        for k in approx
    ]
    # approxQuantile rel_err 0.001 is well under one bucket width, so
    # every code lands within one bucket of the exact quantile code;
    # each of the M-1 boundaries may sit one RANK off, relabeling about
    # one row each (~(M-1)/n = 25% here), so the exact-agreement floor
    # is 1 - 1.2*(M-1)/n
    assert max(off) <= 1, max(off)
    assert sum(1 for d in off if d == 0) >= n - 1.2 * (M - 1)
    # balanced occupancy on each dimension: no bucket swallows the
    # curve (the degenerate case rank-coding exists to prevent)
    for dim in (0, 1):
        counts: dict[int, int] = {}
        for val in approx.values():
            counts[val[dim]] = counts.get(val[dim], 0) + 1
        assert max(counts.values()) <= max(8 * n // M, 8)


def test_scale_hilbert_key_is_zero_shuffle_and_matches_fold(spark, sf_dir):
    """Same artifact contract for the Hilbert scale form: zero
    exchanges in the key plan, and the key equals the textbook xy2d of
    its own codes (the fold is the verified shared generator; here we
    re-check it composes with the boundary coding unchanged)."""
    from rippled_historical_database_spark.operators.layout import (
        hilbert_scale_key,
    )
    from tests.test_invariants import _py_xy2d

    e = load_table(spark, sf_dir, "events")
    df = hilbert_scale_key(e)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.hkey == _py_xy2d(M, r.code_t, r.code_v), r
