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
# catalog deliberately. Round 12 window policy, in priority order:
# (1) queries that have never had a driver CORRECTNESS row (the 18
# round-11 operators born after the r11 window froze), (2) queries
# whose implementation changed this round (graph_scc's frontier-only
# backward pass and streaming_trending_topk's shared serve path sit
# inside (1); q20's single-pass supp_qty is pinned explicitly),
# (3) the standing oldest-checked-first rotation — the r3 remainder
# plus the oldest r4 cohort. New round-12 operators go to the backlog
# head (r13 window) as in prior rounds. The full catalog is ordered
# (every registered name), so the backlog ordering is explicit, not
# incidental. The window contents are enforced by an automated
# assertion (tests/test_harness_safety.py::test_check_priority_window),
# not by this comment.
_CHECK_PRIORITY: tuple[str, ...] = (
    # ---- driver 50-slot check window (round 12) ----
    # 1-18: the round-11 operators — never driver-checked (judge-run
    # local parity in the r11 session only); two of them (graph_scc,
    # streaming_trending_topk) also changed this round, so their
    # first driver row covers the new code
    "streaming_trending_topk",
    "join_set_similarity",
    "graph_ppr",
    "graph_scc",
    "sample_pps",
    "anonymize_dp_mean",
    "sink_time_travel_read",
    "text_collocations",
    "events_cuped",
    "events_attribution_markov",
    "graph_hits",
    "agg_ab_srm",
    "sample_stratified_neyman",
    "text_textrank_keywords",
    "sink_merge_on_read_dv",
    "scan_change_data_feed",
    "report_dataset_datasheet",
    "events_diff_in_diff",
    # 19-20: implementation changed this round (q20: supp_qty
    # materialized once; chi-square: completed contingency grid so
    # structurally-zero cells contribute their expected-count terms)
    "q20_part_promotion",
    "agg_chi_square",
    # 20-30: the r3 remainder (11 queries), oldest-first
    "window_moving_avg",
    "fn_string_funcs",
    "fn_date_parts",
    "fn_date_arith",
    "fn_null_funcs",
    "fn_url_parse",
    "sink_json_roundtrip",
    "sink_orc_roundtrip",
    "set_except",
    "pipeline_fetch",
    "pipeline_media_dispatch",
    # 31-50: the oldest 20 of the 43 r4-stale rows (CORRECTNESS_r04
    # order; the remainder heads the r13 backlog below)
    "agg_count",
    "agg_avg",
    "agg_median",
    "agg_max",
    "agg_sum",
    "agg_multi",
    "agg_max_by",
    "agg_having",
    "agg_rollup",
    "agg_unpivot",
    "agg_percentiles",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "join_broadcast_equi",
    "join_left_anti",
    "join_left_semi",
    "join_left_outer",
    "join_full_outer",
    "multimodal_frames",
    # ---- slots 51+: rotation backlog (r13 window head) ----
    # scan_parquet displaced to the backlog by the agg_chi_square
    # changed-code pin (its r4 row covers an immutable basic scan)
    "scan_parquet",
    # First: operators born in round 12 (never driver-checked until
    # r13; covered meanwhile by the sf0.01 oracle-parity harness +
    # pytest) — appended here as they land this round.
    "join_set_similarity_verify",
    "streaming_trending_topk_update",
    "agg_mcnemar",
    "agg_cramers_v",
    "agg_kendall_tau",
    "agg_spearman_rho",
    "feature_quantile_bin",
    "agg_anova",
    "sample_kfold",
    "events_event_study",
    "recall_join_set_similarity_verify",
    "agg_tost_equivalence",
    "eval_retrieval_mrr",
    "graph_modularity",
    # Then: the r4 remainder (23 queries), oldest-first
    "project_filter_notnull",
    "fn_string_normalize",
    "fn_string_firstline",
    "streaming_tumbling",
    "streaming_session",
    "streaming_stream_join",
    "fn_math",
    "curation_cap_per_source",
    "curation_contamination",
    "curation_pii_scrub",
    "curation_repetition",
    "streaming_dedup",
    "limit_n",
    "set_except_all",
    "set_intersect_all",
    "window_first_last",
    "recall_sim_topk_lsh",
    "dedup_connected",
    "events_funnel",
    "error_approx_distinct",
    "sink_sorted_roundtrip",
    "kmeans_ivf_train",
    "streaming_static_join",
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
        curation,
        dedup,
        graph,
        joins,
        multimodal,
        recall,
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
