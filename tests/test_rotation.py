"""The driver's correctness gate truncates at the first 50 queries()
entries, so ``__spark_entry__._rotated`` must put the least-evidenced
queries first or whole families (TPC-H, streaming) stay unchecked
forever.  These tests pin the ordering contract so a truncation or
evidence-counting change cannot silently strand them again.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from rippled_historical_database_spark.plans.registry import all_queries

DRIVER_WINDOW = 50  # the driver checks only the first 50 queries() entries

GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 1, "oracle_rows": 1, "err": None}
RED_HASH = {"rows_match": True, "schema_match": True, "hash_match": False,
            "spark_rows": 1, "oracle_rows": 1, "err": None}
ERRORED = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": "boom"}


def _write_round(tmp_path, n: int, rows: dict) -> None:
    (tmp_path / f"CORRECTNESS_r{n:02d}.json").write_text(json.dumps(rows))


def test_zero_evidence_sorts_before_any_green(tmp_path):
    names = ["a", "b", "c", "d"]
    _write_round(tmp_path, 1, {"a": GREEN, "c": GREEN})
    order = entry_mod._rotated(names, repo_dir=str(tmp_path))
    # b and d (never checked) must precede a and c (one green each);
    # registration order breaks ties within each class.
    assert order == ["b", "d", "a", "c"]


def test_red_and_errored_rows_count_as_zero_evidence(tmp_path):
    names = ["ok", "red", "err"]
    _write_round(tmp_path, 1, {"ok": GREEN, "red": RED_HASH, "err": ERRORED})
    order = entry_mod._rotated(names, repo_dir=str(tmp_path))
    assert order.index("red") < order.index("ok")
    assert order.index("err") < order.index("ok")


def test_greens_accumulate_across_rounds(tmp_path):
    names = ["twice", "once", "never"]
    _write_round(tmp_path, 1, {"twice": GREEN, "once": GREEN})
    _write_round(tmp_path, 2, {"twice": GREEN})
    assert entry_mod._rotated(names, repo_dir=str(tmp_path)) == [
        "never", "once", "twice",
    ]


def test_latest_red_outranks_equally_green_healthy(tmp_path):
    """The r04/r05 failure mode: a query green in r1 but red in r2 tied
    with healthy 1-green queries on green count and kept losing the
    registration-order tiebreak.  The red-aware key must rank it ahead
    of every healthy query with the same green count."""
    names = ["healthy_early", "stale_red", "healthy_late", "never"]
    _write_round(tmp_path, 1, {"healthy_early": GREEN, "stale_red": GREEN,
                               "healthy_late": GREEN})
    _write_round(tmp_path, 2, {"stale_red": RED_HASH})
    order = entry_mod._rotated(names, repo_dir=str(tmp_path))
    # never-checked still first; then the latest-red query; healthy ties last.
    assert order == ["never", "stale_red", "healthy_early", "healthy_late"]


def test_latest_green_clears_the_red_flag(tmp_path):
    """Once the driver re-confirms a previously-red query, it rejoins the
    healthy pool at its green count (no permanent red penalty)."""
    names = ["a", "b"]
    _write_round(tmp_path, 1, {"a": GREEN, "b": RED_HASH})
    _write_round(tmp_path, 2, {"b": GREEN})
    order = entry_mod._rotated(names, repo_dir=str(tmp_path))
    assert order == ["a", "b"]  # both 1-green, neither latest-red


def test_real_stale_red_queries_inside_window():
    """Against the real CORRECTNESS history: every query whose newest
    driver row is red must land inside the 50-slot gate window this
    round (round-5 verdict item #1)."""
    import glob

    names = list(all_queries())
    repo = os.path.dirname(os.path.abspath(entry_mod.__file__))
    latest: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            seen = json.load(f)
        for n, row in seen.items():
            if n in names and isinstance(row, dict):
                latest[n] = (
                    row.get("rows_match") is True
                    and row.get("schema_match") is not False
                    and row.get("hash_match") is not False
                    and not row.get("err")
                )
    stale_red = [n for n, green in latest.items() if not green]
    window = set(entry_mod._rotated(names)[:DRIVER_WINDOW])
    stranded = [n for n in stale_red if n not in window]
    assert stranded == [], f"latest-red queries outside gate window: {stranded}"


def test_age_breaks_green_count_ties(tmp_path):
    """Round-7 rotation-debt refinement: two queries with one green each
    must sort oldest-evidence first, not registration-order first, so the
    re-confirmation cycle visits stale greens before fresh ones."""
    names = ["fresh", "stale"]
    _write_round(tmp_path, 1, {"stale": GREEN})
    _write_round(tmp_path, 5, {"fresh": GREEN})
    assert entry_mod._rotated(names, repo_dir=str(tmp_path)) == [
        "stale", "fresh",
    ]


def test_malformed_round_file_is_ignored(tmp_path):
    names = ["a", "b"]
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    assert entry_mod._rotated(names, repo_dir=str(tmp_path)) == ["a", "b"]


def test_real_rotation_covers_all_never_green_queries():
    """Against the real repo's CORRECTNESS history: every query with zero
    green driver evidence must land inside the driver's 50-slot window,
    otherwise this round cannot produce its first row for it."""
    names = list(all_queries())
    order = entry_mod._rotated(names)
    assert sorted(order) == sorted(names)  # a permutation, nothing dropped

    import glob

    repo = os.path.dirname(os.path.abspath(entry_mod.__file__))
    greens: dict[str, int] = {n: 0 for n in names}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            seen = json.load(f)
        for n, row in seen.items():
            if n in greens and isinstance(row, dict) and (
                row.get("rows_match") is True
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and not row.get("err")
            ):
                greens[n] += 1

    never = [n for n in names if greens[n] == 0]
    window = set(order[:DRIVER_WINDOW])
    stranded = [n for n in never if n not in window]
    # If zero-evidence queries ever exceed the window, rotation still
    # guarantees they are checked before ANY evidenced query burns a slot.
    if len(never) <= DRIVER_WINDOW:
        assert stranded == [], f"never-checked queries outside window: {stranded}"
    else:
        assert all(greens[n] == 0 for n in order[:DRIVER_WINDOW])

    # The driver contract (queries()/oracle_sql()) must expose the same
    # rotation: first entries of queries() == first entries of _rotated.
    qs = entry_mod.queries()
    assert list(qs)[:DRIVER_WINDOW] == order[:DRIVER_WINDOW]


def test_rotation_scales_to_thousand_query_history(tmp_path):
    """Round-7 verdict item #8: the registry grows ~30 queries/round and
    the entry point re-sorts on every queries()/oracle_sql() call, so
    pin that _rotated stays a single O(rounds * n) scan + one
    O(n log n) sort -- 1000 queries x 20 synthetic rounds must order
    correctly in well under a second (a quadratic regression would take
    minutes)."""
    import time

    names = [f"q{i:04d}" for i in range(1000)]
    for rnd in range(1, 21):
        # round r greens a sliding 50-query window, like the driver
        rows = {names[(rnd * 37 + j) % 1000]: GREEN for j in range(50)}
        _write_round(tmp_path, rnd, rows)
    t0 = time.perf_counter()
    order = entry_mod._rotated(names, repo_dir=str(tmp_path))
    dt = time.perf_counter() - t0
    assert sorted(order) == sorted(names)
    assert dt < 1.0, f"_rotated took {dt:.2f}s on 1000x20 history"
    # least-evidenced still leads: the front of the order never has more
    # greens than the back.
    greens: dict[str, int] = {n: 0 for n in names}
    for rnd in range(1, 21):
        for j in range(50):
            greens[names[(rnd * 37 + j) % 1000]] += 1
    counts = [greens[n] for n in order]
    assert counts[0] == min(counts)
    assert max(counts[:50]) <= min(counts[-50:])


def test_rotation_group_is_structural_not_import_order():
    """corpus_ml queries register with rotation_group=1: they must sort
    behind every group-0 query in the registry REGARDLESS of module
    import order (all_queries re-sorts by (rotation_group, seq)), so a
    future import-graph change cannot silently push not-yet-checked
    queries out of the gate window."""
    qs = all_queries()
    groups = [q.rotation_group for q in qs.values()]
    assert sorted(groups) == groups, "registry not ordered by rotation_group"
    late = [n for n, q in qs.items() if q.rotation_group > 0]
    assert "cluster_kmeans" in late and "text_tfidf_topterms" in late
    names = list(qs)
    first_late = min(names.index(n) for n in late)
    assert all(names.index(n) >= first_late for n in late)
    assert all(
        names.index(n) < first_late
        for n, q in qs.items()
        if q.rotation_group == 0
    )
