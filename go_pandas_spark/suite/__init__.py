"""Correctness/benchmark suite: the SURVEY §2 operator inventory as
(Spark query, DuckDB oracle SQL) pairs.

Every query runs through the engine's public API (Frame/Series/
operators), not raw Spark — so the suite exercises the engine the way
a reference user would. Oracles are ANSI SQL for DuckDB on the same
parquet views (driver contract, __spark_entry__.py).

Float determinism: money aggregates are summed as decimals (exact,
engine-independent) and cast/rounded at the end; ratio/statistics
columns are rounded to 6 decimals in BOTH engines.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str):
    from ..sources.io import read_parquet

    return read_parquet(spark, f"{sf_dir}/{table}.parquet")


_MODULES = ["tpch", "tpch2", "relational", "aggregation", "windows", "reshape", "scalars",
            "missing", "llm", "extras", "surface2"]

# The driver hash-verifies the FIRST 50 entries of queries() each round.
# Rounds 1-3 verified the tpch/relational/aggregation block (all green in
# CORRECTNESS_r03). Round 4 rotates the window to the families that have
# never had a driver row — windows/asof, missing-data, LLM pipeline,
# reshape, scalars — keeping three already-green sentinels to detect
# regressions.
#
# ROUND 5 TODO: rotate _VERIFY_FIRST to the 58 still-never-verified
# queries (plus 2-3 sentinels): corr_spearman/kendall, describe_frame,
# global_reductions, groupby_ohlc, combine_func, series_rolling_expression,
# pivot_table_margins/multi_values, qcut, unstack_long_to_wide, crosstab_
# normalized, sort_index_level, string batteries, business days,
# to_datetime_parse, json_extract, period rollup, simhash/lsh/ivf/
# multimodal/components (rows-only), gopher/decontaminate/pii/pack/
# temperature/classifier/semdedup/stratified, series_map, time-of-day
# filters, concat_axis1, weighted rolling, autocorr, rollup/cube,
# explode, str_cat, salted join, range join, timedelta, iloc_slice,
# groupby_resample, tshift, rowwise_udf, and the six surface2 queries.
_VERIFY_FIRST = [
    # sentinels (driver-green in r1-r3)
    "q1_pricing_summary", "merge_inner_multikey", "groupby_stats_battery",
    # §2.5 windows / asof / resample (never driver-checked)
    "rolling_sum_rows", "rolling_time_window", "rolling_median_quantile",
    "rolling_cov_corr", "expanding_stats", "ewm_mean", "rank_methods",
    "shift_diff_pct_change", "cumulative_ops",
    "merge_asof_backward", "merge_asof_forward", "merge_asof_tolerance",
    "merge_asof_nearest", "merge_asof_global_noby",
    "resample_hourly", "resample_5min_ohlc", "resample_upsample_ffill",
    "merge_ordered_ffill",
    "rolling_ungrouped_global", "cumulative_ungrouped_global",
    # missing-data
    "fillna_scalar_and_dict", "ffill_bfill_grouped", "ffill_with_limit",
    "interpolate_linear", "dropna_and_counts", "replace_values",
    "interpolate_time_weighted",
    # LLM pipeline (oracled subset)
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "similarity_cosine_topk", "similarity_neardup_exact",
    "text_stats_battery", "text_quality_filter",
    "sessionize_batch", "training_data_pipeline",
    # §2.8 reshape
    "pivot_table_mean", "crosstab_counts", "melt_wide_to_long",
    "cut_fixed_bins", "get_dummies_onehot", "unstack_row_multiindex",
    # §2.9 scalars
    "string_methods_battery", "datetime_fields_battery",
    "datetime_floor_round", "calendar_offsets", "exotic_offsets",
]


def register_all() -> None:
    """Import every suite module (side effect: registration)."""
    import importlib

    for m in _MODULES:
        try:
            importlib.import_module(f".{m}", __package__)
        except ModuleNotFoundError as e:
            if f"suite.{m}" not in str(e):
                raise

    # Reorder so the driver's 50-query verification window lands on
    # _VERIFY_FIRST; everything else keeps registration order after it.
    prioritized = {n: QUERIES[n] for n in _VERIFY_FIRST if n in QUERIES}
    rest = {n: fn for n, fn in QUERIES.items() if n not in prioritized}
    QUERIES.clear()
    QUERIES.update(prioritized)
    QUERIES.update(rest)
