"""The COVERAGE.md registry-freshness table must match a live
regeneration (round-5 verdict item #8): if the registry or the
CORRECTNESS history changes without rerunning tools/freshness.py, this
fails with the one-command fix in the message."""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import freshness


def test_coverage_freshness_table_is_current():
    """Compare the checked-in table against a render PINNED to the
    generation round recorded inside the block, so a driver-written
    CORRECTNESS file that postdates the builder's last commit cannot
    retroactively redden it (round-7 verdict item #1).  Registry edits
    without a regen still fail: the pinned render walks the live
    registry."""
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        text = f.read()
    assert freshness.BEGIN in text and freshness.END in text, (
        "freshness table missing - run: python tools/freshness.py"
    )
    start = text.index(freshness.BEGIN)
    end = text.index(freshness.END) + len(freshness.END)
    checked_in = text[start:end]
    pin = re.search(r"generated-after: r(\d+)", checked_in)
    assert pin, (
        "freshness block lacks a generated-after pin - run: "
        "python tools/freshness.py"
    )
    live = freshness.render(max_round=int(pin.group(1)))
    if checked_in != live:
        import difflib

        delta = "\n".join(
            difflib.unified_diff(
                checked_in.splitlines(), live.splitlines(),
                "COVERAGE.md", "freshness.render()", lineterm="", n=0,
            )
        )
        raise AssertionError(
            "stale freshness table - run: python tools/freshness.py\n" + delta
        )


def test_pinned_render_ignores_future_rounds(tmp_path, monkeypatch):
    """The structural property the gate now rests on: a correctness
    file from a round ABOVE the pin changes nothing in the pinned
    render, so the driver depositing r0{N+1} post-commit cannot break
    the suite."""
    import json
    import shutil

    for p in sorted(os.listdir(REPO)):
        if p.startswith("CORRECTNESS_r") and p.endswith(".json"):
            shutil.copy(os.path.join(REPO, p), tmp_path / p)
    monkeypatch.setattr(freshness, "REPO", str(tmp_path))
    pinned = freshness._history(max_round=7)
    with open(tmp_path / "CORRECTNESS_r99.json", "w") as f:
        json.dump({"scan_time_range": {"rows_match": False, "err": "x"}}, f)
    assert freshness._history(max_round=7) == pinned
    assert freshness._history(max_round=None) != pinned


def test_freshness_table_counts_cover_registry():
    from rippled_historical_database_spark.plans.registry import all_queries

    rendered = freshness.render()
    rows = [ln for ln in rendered.splitlines() if ln.startswith("| `")]
    assert len(rows) == len(all_queries())
