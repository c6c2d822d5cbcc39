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
# stale-or-missing first, well-covered evergreens last. Round 6: slots
# 1-6 are the only six queries with no driver row ever; slots 7-10 the
# stale rows-only family (last driver rows r1-r3); then this round's
# new queries, then the stale round-1/round-2 tails. The 50 queries
# freshly checked green in round 5 go to the very back. The slot
# window is enforced by an automated assertion
# (tests/test_harness_safety.py::test_check_priority_window), not by
# this comment.
_CHECK_PRIORITY: tuple[str, ...] = (
    # never driver-checked — the last catalog gap (r5 verdict item 1)
    "sink_zorder_roundtrip",
    "streaming_sliding",
    "embedding_quantize",
    "error_minhash_estimate",
    "table_checksum",
    "window_percent_rank",
    # stale rows-only family: last driver rows r1-r3 (r5 verdict item 3)
    "dedup_near",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "agg_approx_distinct",
    # new round-6 operators: MinHash incremental dedup + its recall
    # gate, nprobe-parameterized IVF + its recall gate
    "dedup_incremental_minhash",
    "recall_dedup_incremental_minhash",
    "sim_topk_ivf_nprobe",
    "recall_sim_topk_ivf_nprobe",
    "quality_diversity",
    "agg_heavy_hitters_grouped",
    "table_diff",
    "sink_mergeschema_roundtrip",
    "agg_weighted_median",
    "sink_compacted_roundtrip",
    "sample_negative_pairs",
    "scan_csv_badrecords",
    "split_leakage_safe",
    "sample_downweight_dups",
    "doc_novelty",
    "window_ewma",
    "events_attribution",
    "feature_mad_outliers",
    "cdc_apply_tombstones",
    "graph_triangles",
    "scan_binary_files",
    "agg_regression",
    "streaming_cdc_tombstones",
    "feature_winsorize",
    "text_boilerplate",
    "embedding_pq_train",
    "tokenizer_bpe_train",
    "pipeline_curate_corpus",
    "text_html_strip",
    "window_drawdown",
    "agg_benford",
    "join_null_safe",
    "quality_gopher_rules",
    "multimodal_dedup_bytes",
    "graph_local_clustering",
    "scd2_apply_changes",
    "events_cohort_ltv",
    # stalest driver evidence (last row: round 1)
    "multimodal_bytes",
    "multimodal_resize",
    "filter_prefix",
    "filter_temporal",
    "filter_compound",
    "fn_regexp_extract",
    "fn_date_format",
    "fn_ts_diff",
    "sink_parquet",
    "sink_csv_roundtrip",
    "scan_range",
    "join_cross",
    "fn_concat",
    "fn_least_cast",
    # round-2-era evidence, approximate/rows-only members first
    "sim_pairs_blocked",
    "sim_topk",
    "sim_topk_ivf",
    "agg_count_if",
    "agg_ratio",
    "agg_groupby_count",
    "agg_cube",
    "join_range",
    "multimodal_features",
    "scan_json",
    "fn_json_extract",
    "case_when_dispatch",
    "filter_error_rows",
    "sample_hash",
    "sample_stratified",
    "split_train_test",
    "sample_weighted_mix",
    "filter_by_quantile",
    "pack_sequences",
    "fn_array_ops",
    "fn_map_ops",
    "join_skew_salted",
    # (the 50-slot boundary falls somewhere in this r2-era run and
    # moves as round additions are inserted above — deliberately NOT
    # named here; test_check_priority_window pins what matters: every
    # must-check query sits inside the window)
    "join_bucketed",
    "union_by_name",
    "distinct_dedup",
    "set_intersect",
    "agg_grouping_sets",
    "sql_cte",
    "window_session",
    "window_sliding",
    "text_stats",
    "token_count",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "fn_edit_distance",
    "q22_idle_customers",
    "q11_important_stock",
    "q15_top_supplier",
    "q20_part_promotion",
    "bucket_range",
    "window_running_sum",
    "window_rank",
    "window_lag",
    "window_tumbling",
    "limit_offset",
    "topk_order_limit",
    "streaming_stateful",
    "dedup_embedding",
    # round-5 driver-checked 50/50 green (CORRECTNESS_r05) — freshest
    # evidence in the catalog, so they re-verify last
    "fn_try_arith",
    "agg_mode",
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
    "agg_gini",
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
