"""Query/oracle registry used by ``__spark_entry__.py``.

Contract (driver-defined): for each name, ``QUERIES[name](spark, sf_dir)``
returns a DataFrame and ``ORACLES[name]`` is ANSI SQL DuckDB runs over the
same parquet tables; results must agree on row count, schema, and an
order-insensitive value hash. Column names are aliased identically on
both sides; float aggregates are rounded on both sides so the hashes are
bit-stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle=None`` marks a genuinely
    non-SQL-expressible op (driver records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
