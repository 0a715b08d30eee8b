"""The COVERAGE.md registry-freshness table must match a live
regeneration (round-5 verdict item #8): if the registry or the
CORRECTNESS history changes without rerunning tools/freshness.py, this
fails with the one-command fix in the message."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import freshness


def test_coverage_freshness_table_is_current():
    with open(os.path.join(REPO, "COVERAGE.md")) as f:
        text = f.read()
    assert freshness.BEGIN in text and freshness.END in text, (
        "freshness table missing - run: python tools/freshness.py"
    )
    start = text.index(freshness.BEGIN)
    end = text.index(freshness.END) + len(freshness.END)
    checked_in, live = text[start:end], freshness.render()
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


def test_freshness_table_counts_cover_registry():
    from rippled_historical_database_spark.plans.registry import all_queries

    rendered = freshness.render()
    rows = [ln for ln in rendered.splitlines() if ln.startswith("| `")]
    assert len(rows) == len(all_queries())
