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
# catalog deliberately. Round 13 window policy, in priority order:
# (1) queries that have never had a driver CORRECTNESS row — the 14
# round-12 operators (judge-verified locally in r12, never driver-
# sampled) and the 6 round-13 operators; (2) scan_parquet (displaced
# from the r12 window by the chi-square pin); (3) queries whose
# implementation changed this round (agg_ab_test/agg_ab_power absent-
# arm conditional aggregation; agg_gini's two-phase global rank);
# (4) the standing oldest-checked-first rotation — the full 23-query
# r4-stale remainder (clears r4 entirely; includes
# error_approx_distinct), plus agg_approx_distinct windowed TOGETHER
# with its error gate (the rows-only exception re-proves its accuracy
# in the same window — r12 VERDICT #7), plus the 2 oldest r5-stale
# rows. New round-13 operators born after this freeze go to the
# backlog head (r14 window) as in prior rounds. The window contents
# are enforced by an automated assertion
# (tests/test_harness_safety.py::test_check_priority_window), not by
# this comment.
_CHECK_PRIORITY: tuple[str, ...] = (
    # ---- driver 50-slot check window (round 13) ----
    # 1-14: the round-12 operators — never driver-checked
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
    # 15-20: the round-13 operators — never driver-checked
    "join_right_outer",
    "agg_string_agg",
    "window_cume_dist",
    "streaming_changepoint_update",
    "streaming_forecast_update",
    "streaming_count_min_update",
    # 21: displaced from the r12 window
    "scan_parquet",
    # 22-24: implementation changed this round
    "agg_ab_test",
    "agg_ab_power",
    "agg_gini",
    # 25-47: the r4-stale remainder (23 queries, CORRECTNESS_r04
    # order) — clears every r4 row; slot 44 is error_approx_distinct
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
    # 48: the rows-only exception, windowed together with its error
    # gate (slot 44) so the accuracy proof re-runs beside it
    "agg_approx_distinct",
    # 49-50: the oldest 2 r5-stale rows (CORRECTNESS_r05 order)
    "fn_try_arith",
    "agg_mode",
    # ---- slots 51+: rotation backlog (r14 window head) ----
    # First: operators born in round 13 AFTER the window froze (never
    # driver-checked; covered meanwhile by the sf0.01 oracle-parity
    # harness + pytest) — appended here as they land this round
    "agg_levene",
    "agg_proportions_ztest",
    "agg_cochran_q",
    "split_time_embargo",
    "graph_degree_assortativity",
    "events_autocorrelation",
    "report_embedding_health",
    "agg_hhi",
    "agg_trimmed_mean",
    "feature_time_windows",
    "events_cem_att",
    "anonymize_date_shift",
    "report_ivf_recall_curve",
    # Then: changed in r13 after the freeze — the radius-aware
    # perceptual recall gate (+ the dedup oracle CTE refactor it rides)
    "recall_dedup_perceptual",
    "multimodal_dedup_perceptual",
    # Then: the complete-mode streaming twins refactored this round
    # (shared spine builders/serve extracted — output-identical,
    # locally oracle-verified; first post-refactor driver rows)
    "streaming_count_min",
    "streaming_changepoint",
    "streaming_forecast",
    # Then: the r5-stale remainder (CORRECTNESS_r05 order; agg_gini
    # already holds a changed-code slot above)
    "agg_corr",
    "quality_unigram_rarity",
    "sim_topk_lsh",
    "dedup_keep_best",
    "dedup_containment",
    "doc_chunk_windows",
    "error_approx_quantile",
    "sessionize_events",
    "agg_sketch_merge",
    "quality_tfidf",
    "vocab_coverage",
    "streaming_upsert",
    "graph_pagerank",
    "tokenize_to_ids",
    "agg_count_distinct_multi",
    "agg_histogram",
    "agg_key_skew",
    "agg_percentile_disc",
    "events_anomaly_p99",
    "events_retention",
    "join_asof_tolerance",
    "scd2_intervals",
    "join_interval_overlap",
    "profile_columns",
    "feature_zscore",
    "agg_heavy_hitters",
    "quality_bigram_lm",
    "join_bloom_filtered",
    "events_gap_fill",
    "agg_incremental_merge",
    "agg_copurchase_pairs",
    "join_range_bucketed",
    "sample_temperature_mix",
    "events_markov",
    "events_rolling_distinct",
    "agg_rfm_scores",
    "dedup_repeated_ngrams",
    "error_approx_topk",
    "window_rolling_median",
    "events_funnel_windowed",
    "agg_abc_analysis",
    "agg_affinity_lift",
    "orders_open_over_time",
    "join_scd2_pointintime",
    "sample_budget_mix",
    "join_asof_nearest",
    "dedup_incremental",
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
