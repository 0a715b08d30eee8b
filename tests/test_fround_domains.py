"""fround finite-domain audit (r13 verdict #7): every fround /
sql_fround emission must keep |x|*10^scale below 2^63 (Spark's
FLOOR->BIGINT saturates there while DuckDB's FLOOR stays DOUBLE,
silently breaking bit-parity) and keep NaN/Inf out (the engines
disagree on both).  numeric.py documents the requirement; THIS test is
the enforcement ledger: a pinned per-module call-site count plus the
module's domain argument.  Adding or removing a call site fails the
pin until the ledger row -- and its justification -- is updated, the
same pattern as the native-ROUND lint."""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / (
    "rippled_historical_database_spark"
)

# module -> (call-site count, finite-domain argument for its emissions)
DOMAINS = {
    "operators/anomaly.py": (
        7,
        "z-scores/ratios of bounded metrics; denominators stddev>0 "
        "guarded, |x| < 1e6 at any corpus size",
    ),
    "operators/candles.py": (
        31,
        "OHLC/vwap on the 2-dp price grid and bounded per-bucket "
        "volumes; vwap denominators dust-filtered > 0",
    ),
    "operators/corpus_ml.py": (
        54,
        "per-document scores (tf-idf, BM25, logprob averages, "
        "divergences): every emission is a per-row or per-group "
        "AVERAGE or log of bounded ratios, |x| < 1e4",
    ),
    "operators/dedup.py": (
        6,
        "Jaccard/containment/cosine similarities in [0, 1]",
    ),
    "operators/funnels.py": (
        2,
        "conversion ratios in [0, 1]",
    ),
    "operators/graph.py": (
        25,
        "pagerank/HITS masses (sum to 1 per iteration), degrees "
        "divided by node counts, Jaccard scores -- all in [0, 1e3]",
    ),
    "operators/joins.py": (
        2,
        "date-spine zero-fill of davg-style per-day sums (bounded by "
        "day volume) and join_point_in_band total_value at scale 2: "
        "the 2-dp input grid makes the exact sum a 2-dp quantity, so "
        "the 2^63 bound admits per-band sums to ~9.2e16 -- ~2e3 x the "
        "100 TB-scale per-band mass (r13 ADVICE fix; was scale 9 with "
        "a ~9.2e9 ceiling)",
    ),
    "operators/pipeline.py": (
        2,
        "quality scores in [0, 1]",
    ),
    "operators/profiling.py": (
        46,
        "frequencies/probabilities/entropies/chi2 of bounded counts: "
        "ratios to the corpus total, |x| <= n_groups * crit < 1e9 "
        "at scale <= 9 only for [0,1] quantities",
    ),
    "operators/sampling.py": (
        16,
        "sampling rates/weights in [0, 1], quota fractions, DSIR "
        "log-ratios bounded by vocabulary size",
    ),
    "operators/similarity.py": (
        16,
        "cosine similarities in [-1, 1], distances over unit-norm "
        "embeddings (<= 2), recall fractions in [0, 1]",
    ),
    "operators/sketches.py": (
        12,
        "HLL/CMS estimates bounded by corpus cardinality (< 1e12 at "
        "scale <= 6); central-moment derived stats on the |value| <= "
        "1.5e3 envelope documented at the operator",
    ),
    "operators/text_analysis.py": (
        14,
        "per-document ratios, entropies (<= log2 vocab), Zipf/Heaps "
        "fit parameters -- all |x| < 1e6",
    ),
    "streaming/rsi_stream.py": (
        3,
        "RSI in [0, 100] and Wilder averages on the 2-dp price grid",
    ),
}

_CALL = re.compile(r"\b(?:sql_)?fround\(")
_DEF = re.compile(r"def (?:sql_)?fround\(")


def _census() -> dict[str, int]:
    counts: dict[str, int] = {}
    for p in sorted(PKG.rglob("*.py")):
        src = p.read_text()
        n = len(_CALL.findall(src)) - len(_DEF.findall(src))
        if n and p.name != "numeric.py":  # definitions + doc examples
            counts[str(p.relative_to(PKG))] = n
    return counts


def test_every_fround_module_has_a_domain_argument():
    census = _census()
    assert census == {m: c for m, (c, _) in DOMAINS.items()}, (
        "fround call sites changed -- update DOMAINS with the new "
        "site's finite-domain argument",
        {
            m: (census.get(m), DOMAINS.get(m, (None,))[0])
            for m in set(census) | set(DOMAINS)
            if census.get(m) != DOMAINS.get(m, (None,))[0]
        },
    )
    for mod, (_, why) in DOMAINS.items():
        assert len(why) > 20, f"{mod}: domain argument too thin"


def test_point_in_band_emits_at_scale_2():
    """The one unbounded-sum fround emission found by the r13 ADVICE:
    its scale must stay at 2 (input-grid scale), where saturation
    needs a ~9.2e16 band sum instead of ~9.2e9."""
    src = (PKG / "operators/joins.py").read_text()
    assert 'fround(dsum("value", 2), 2)' in src
    assert "sql_fround(sql_dsum('value', 2), 2)" in src
    assert 'fround(dsum("value", 9), 9)' not in src
