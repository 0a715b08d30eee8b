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


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[SparkFn], SparkFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query plan."""

    def deco(fn: SparkFn) -> SparkFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""),
            bench=bench, tags=tags,
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import every operator module (side-effect: registration) and
    return the populated registry."""
    # Imports deferred so `import plans.registry` stays cheap.
    from ..operators import (  # noqa: F401
        candles,
        dedup,
        golden,
        graph,
        joins,
        lifecycle,
        multimodal,
        parsers,
        pipeline,
        rates,
        readers,
        reports,
        rollups,
        sampling,
        scan,
        sketches,
        similarity,
        text_analysis,
        topk,
        tpch,
        xrpl_topology,
    )
    from ..streaming import candles_stream, stateful_buckets  # noqa: F401

    # Imported LAST on purpose: the driver-gate rotation orders
    # zero-evidence queries by registration order and truncates at 50,
    # so queries added mid-round must register behind the entries still
    # awaiting their first driver row (see corpus_ml module docstring).
    from ..operators import corpus_ml  # noqa: F401

    return REGISTRY
