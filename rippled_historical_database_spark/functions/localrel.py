"""JVM-evaluable local relations from driver-side rows (guide section 4).

``spark.createDataFrame`` on a plain Python list (or a list of collected
``Row`` objects) is backed by a *pickled-row RDD*: the rows are pickled
into ``defaultParallelism`` slices, and EVERY evaluation of the relation
-- each broadcast build, each action over an un-cached consumer, each
oracle compare -- launches Python workers to unpickle its slices before
the JVM sees a single row.  That is a hidden JVM->Python->JVM boundary
in otherwise pure-JVM query paths.  Measured on local[32] (pyspark
4.1.2): a ``coalesce(1).count()`` over an 8-row list relation is ~3.4 s
-- 32 serial ~0.1 s Python worker round-trips -- and even the parallel
32-task evaluation pays ~0.3-0.5 s per pass, per consumer.

Routing the same rows through a pandas DataFrame flips
``createDataFrame`` onto its Arrow path (``arrow.pyspark.enabled`` is on
in session.py): the rows are serialized ONCE on the driver into Arrow
batches and the scan deserializes them IN THE JVM -- zero Python workers
at evaluation time.  Same values, same schema, same ``Scan ExistingRDD``
plan node; the measured 8-row probe drops to ~0.08 s.

``local_df`` is the drop-in replacement.  It forces ``dtype=object`` on
the intermediate pandas frame so no pandas type inference runs -- the
explicit Spark schema alone drives the Arrow conversion, exactly as the
pickle path's row verification does -- and falls back to the original
``createDataFrame`` call on any conversion failure (or when pandas is
unavailable), so behavior can only differ in evaluation cost.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows: Iterable, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` without Python workers at
    evaluation time (Arrow-batch-backed instead of pickled-row-backed).

    ``schema`` is a DDL string or ``StructType``, as for
    ``createDataFrame``; rows may be tuples, lists or ``Row`` objects.
    """
    rows = list(rows)
    if not rows:
        # Empty relations have nothing to evaluate; keep the plain path.
        return spark.createDataFrame(rows, schema)
    try:
        import pandas as pd

        names = _field_names(schema)
        if names is None or any(len(r) != len(names) for r in rows):
            return spark.createDataFrame(rows, schema)
        # Object-dtype columns built directly from the row values: no
        # pandas type inference runs (None stays None, never NaN); the
        # explicit Spark schema alone drives the Arrow conversion.
        data = [tuple(r) for r in rows]
        pdf = pd.DataFrame(
            {
                name: pd.Series([r[i] for r in data], dtype=object)
                for i, name in enumerate(names)
            },
            columns=names,
        )
        return spark.createDataFrame(pdf, schema)
    except Exception:
        return spark.createDataFrame(rows, schema)


def _field_names(schema) -> list[str] | None:
    from pyspark.sql.types import StructType

    if isinstance(schema, StructType):
        return schema.fieldNames()
    if isinstance(schema, str):
        # Accept every string form createDataFrame accepts ("a int,
        # b string", "a: int, b: string", "struct<...>").
        try:
            from pyspark.sql.types import _parse_datatype_string

            parsed = _parse_datatype_string(schema)
        except Exception:
            try:
                parsed = StructType.fromDDL(schema)
            except Exception:
                return None
        return parsed.fieldNames() if isinstance(parsed, StructType) else None
    return None
