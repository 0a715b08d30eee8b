"""Shared test replay of the engine's fround (functions/numeric.py):
floor(x·10^nd + 0.5)/10^nd -- the single IEEE sequence the Spark
plans, streaming state, and DuckDB oracles all execute since the
round-12 tie-portability rewrite.  One definition so the independent
Python replays in the indicator-law tests cannot drift from the
engine."""

from __future__ import annotations

import math


def fround_py(x: float, nd: int = 9) -> float:
    m = float(10**nd)
    return math.floor(x * m + 0.5) / m
