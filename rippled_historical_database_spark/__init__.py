"""PySpark-native analytics engine with the query and data-processing
capabilities of the Ripple Data API v2 (ripple/rippled-historical-database).

Layout:
    session    -- SparkSession builder tuned for local[N] and cluster use
    sources    -- table catalog / parquet readers with explicit schemas
    functions  -- scalar/column-expression building blocks (time buckets,
                  deterministic decimal aggregation, text analysis)
    operators  -- the operator inventory from SURVEY.md section 2, each
                  re-expressed as idiomatic DataFrame/SQL plans
    plans      -- query registry: name -> (spark callable, duckdb oracle SQL)
    streaming  -- Structured Streaming variants of the incremental aggs

Every operator registers itself in ``plans.registry`` with a DuckDB oracle
so correctness is continuously checked against an independent engine.
"""

__version__ = "0.1.0"
