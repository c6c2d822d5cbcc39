"""Query registry.

Each operator from SURVEY.md §2 registers a named query (a callable
``(spark, sf_dir) -> DataFrame``) and, where SQL-expressible, the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` exposes the two
dicts to the driver's correctness harness.

Determinism contract for oracle-checked queries (FIXTURES.md caveats):
- every computed column is aliased identically in Spark and SQL;
- double aggregates go through exact decimal sums (see numeric.py) or
  integer-valued doubles, then identical round()+cast, so the value
  hash matches bitwise across engines;
- top-k / limit queries always order by a unique key chain.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}
_TAGS: dict[str, tuple[str, ...]] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as query ``name``; ``oracle`` is DuckDB SQL or None (rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        _TAGS[name] = tags
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


def tags() -> dict[str, tuple[str, ...]]:
    _load()
    return dict(_TAGS)


_LOADED = False


def _load() -> None:
    """Import every ops module so decorators run."""
    global _LOADED
    if _LOADED:
        return
    from parquet_processor_spark.ops import (  # noqa: F401
        aggregates,
        dedup,
        joins,
        multimodal,
        relational,
        roundtrip,
        sampling,
        scalars,
        scale_patterns,
        setops,
        sqlapi,
        temporal,
        text,
        tpch,
        tpch_more,
        tpch_rest,
        vector,
        window_more,
        windows,
    )
    from parquet_processor_spark.pipeline import queries as pipeline_queries  # noqa: F401
    from parquet_processor_spark.streaming import queries as streaming_queries  # noqa: F401

    _LOADED = True


def describe() -> dict[str, dict[str, Any]]:
    _load()
    return {
        name: {"oracle": name in _ORACLES, "tags": list(_TAGS.get(name, ()))}
        for name in sorted(_QUERIES)
    }
