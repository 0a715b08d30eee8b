"""Query registry: every implemented operator from SURVEY.md section 2
registers here as (name, spark callable, duckdb oracle SQL).

The registry is the single source of truth consumed by:
  * ``__spark_entry__.py``  -- the driver's correctness gate,
  * ``tests/``              -- local spark-vs-duckdb comparison,
  * ``bench.py``            -- headline timing queries.

An operator without an oracle (genuinely non-SQL-expressible: MinHash
banding, streaming state) registers ``oracle=None`` and gets a weaker
rows-only check -- keep those rare.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark: SparkFn
    oracle: str | None
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)
    # Driver-gate rotation tier: zero-evidence queries sort by
    # (rotation_group, registration order), so queries added mid-round
    # register with group 1 to queue BEHIND entries still awaiting
    # their first driver row -- the gate truncates at 50.  This makes
    # the ordering structural instead of import-order-dependent.
    rotation_group: int = 0
    seq: int = 0  # registration sequence (insertion order)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
    rotation_group: int = 0,
) -> Callable[[SparkFn], SparkFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query plan."""

    def deco(fn: SparkFn) -> SparkFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""),
            bench=bench, tags=tags, rotation_group=rotation_group,
            seq=len(REGISTRY),
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import every operator module (side-effect: registration) and
    return the populated registry."""
    # Imports deferred so `import plans.registry` stays cheap.
    from ..operators import (  # noqa: F401
        anomaly,
        candles,
        cdc,
        dedup,
        funnels,
        golden,
        graph,
        joins,
        layout,
        lifecycle,
        multimodal,
        parsers,
        pipeline,
        profiling,
        rates,
        readers,
        reports,
        rollups,
        sampling,
        scan,
        sessions,
        sketches,
        similarity,
        text_analysis,
        topk,
        tpch,
        xrpl_topology,
    )
    from ..operators import corpus_ml  # noqa: F401
    from ..sources import jsonl, wet  # noqa: F401
    from . import curate  # noqa: F401
    from ..streaming import (  # noqa: F401
        candles_stream,
        documents_stream,
        hll_stream,
        rsi_stream,
        sessions_stream,
        stateful_buckets,
    )

    # Ordering is fully structural: (rotation_group, name).  Sorting by
    # registration sequence was import-order-dependent -- a test that
    # imported an operator module before the first all_queries() call
    # shifted `seq` for everything that module registers, which made the
    # COVERAGE.md freshness table (and any in-process tiebreak) differ
    # between a bare interpreter and a full pytest run.  Name order is
    # identical in every process; rotation_group still queues mid-round
    # additions behind earlier tiers (tests/test_rotation.py).
    ordered = sorted(REGISTRY.values(), key=lambda q: (q.rotation_group, q.name))
    return {q.name: q for q in ordered}
