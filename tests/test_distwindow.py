"""Distributed ungrouped windows (operators/distwindow.py): the
block-partitioned plans must (a) produce exactly the single-partition
answer — verified against real pandas — and (b) actually run on more
than one partition (the scale property the plan exists for)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import go_pandas_spark as gp
from go_pandas_spark import _internal as I


N = 5_000


@pytest.fixture(scope="module")
def pdf():
    rng = np.random.RandomState(7)
    return pd.DataFrame({
        "k": np.arange(N, dtype=np.int64),
        "x": np.round(rng.uniform(-100, 100, N), 4),
        "y": np.round(rng.uniform(0, 50, N), 4),
    })


@pytest.fixture(scope="module")
def frame(spark, pdf):
    # 16 input partitions so the order key spans many ranges
    sdf = spark.createDataFrame(pdf).repartition(16)
    return gp.Frame(sdf).sort_values("k")


def _series(frame, col):
    # to_pandas() returns rows in frame order (ORDER_COL) — sorting by
    # "k" would scramble: rolling/shift transform the k column too,
    # exactly as pandas frame-mode does.
    return frame.to_pandas().reset_index(drop=True)[col]


def _window_is_blocked(sdf) -> bool:
    """True when the moving aggregate is keyed by the block id —
    i.e. work is spread across partitions, not one global window.
    (At toy sizes AQE may still coalesce the physical exchange; the
    plan shape is the scale property.)"""
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    return ("windowspecdefinition(__blk__" in plan
            and "hashpartitioning(__blk__" in plan)


def test_dist_rolling_runs_blocked(frame):
    out = frame.rolling(3).sum()
    assert _window_is_blocked(out._sdf), "ungrouped rolling still on a global window"


def test_dist_rolling_sum_mean_matches_pandas(frame, pdf):
    out = frame.rolling(3).sum()
    got = _series(out, "x")
    exp = pdf["x"].rolling(3).sum()
    assert np.allclose(got, exp, equal_nan=True)
    got_m = _series(frame.rolling(7, min_periods=2).mean(), "x")
    exp_m = pdf["x"].rolling(7, min_periods=2).mean()
    assert np.allclose(got_m, exp_m, equal_nan=True)


def test_dist_rolling_center_matches_pandas(frame, pdf):
    got = _series(frame.rolling(5, center=True).max(), "x")
    exp = pdf["x"].rolling(5, center=True).max()
    assert np.allclose(got, exp, equal_nan=True)


def test_dist_rolling_median_matches_pandas(frame, pdf):
    got = _series(frame.rolling(9).median(), "x")
    exp = pdf["x"].rolling(9).median()
    assert np.allclose(got, exp, equal_nan=True)


def test_dist_weighted_matches_pandas(frame, pdf):
    got = _series(frame.rolling(4, win_type="triang").mean(), "x")
    try:
        exp = pdf["x"].rolling(4, win_type="triang").mean()
    except ImportError:  # scipy absent: closed-form reference
        from go_pandas_spark.window import window_weights

        w = np.array(window_weights("triang", 4))
        exp = pdf["x"].rolling(4).apply(lambda a: np.dot(a, w) / w.sum(), raw=True)
    assert np.allclose(got, exp, equal_nan=True)


def test_dist_expanding_matches_pandas(frame, pdf):
    for kind, pd_fn in [("sum", "sum"), ("mean", "mean"), ("min", "min"),
                        ("max", "max"), ("var", "var"), ("std", "std"),
                        ("count", "count")]:
        got = _series(getattr(frame.expanding(), kind)(), "x")
        exp = getattr(pdf["x"].expanding(), pd_fn)()
        assert np.allclose(got, exp, equal_nan=True, atol=1e-8), kind
    plan = frame.expanding().sum()._sdf._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(__blk__" in plan


def test_dist_expanding_min_periods(frame, pdf):
    got = _series(frame.expanding(min_periods=10).sum(), "x")
    exp = pdf["x"].expanding(min_periods=10).sum()
    assert np.allclose(got, exp, equal_nan=True)


def test_dist_shift_diff_matches_pandas(frame, pdf):
    got = _series(frame[["k", "x"]].shift(3), "x")
    exp = pdf["x"].shift(3)
    assert np.allclose(got, exp, equal_nan=True)
    got_n = _series(frame[["k", "x"]].shift(-2), "x")
    exp_n = pdf["x"].shift(-2)
    assert np.allclose(got_n, exp_n, equal_nan=True)
    got_d = _series(frame[["k", "x"]].diff(4), "x")
    exp_d = pdf["x"].diff(4)
    assert np.allclose(got_d, exp_d, equal_nan=True)


def test_dist_time_rolling_matches_pandas(spark):
    rng = np.random.RandomState(3)
    ts = pd.Timestamp("2001-01-01") + pd.to_timedelta(
        np.cumsum(rng.randint(1, 900, 3000)), unit="s")
    pdf = pd.DataFrame({"t": ts, "x": np.round(rng.uniform(0, 10, 3000), 4)})
    f = gp.Frame(spark.createDataFrame(pdf).repartition(8)).sort_values("t")
    got = (f.rolling("10min", on="t").sum().to_pandas()
           .reset_index(drop=True)["x"])
    exp = pdf.rolling("10min", on="t")["x"].sum().reset_index(drop=True)
    assert np.allclose(got, exp, equal_nan=True)
    assert _window_is_blocked(f.rolling("10min", on="t").sum()._sdf)


def test_dist_rolling_plan_has_block_exchange(frame):
    """The physical plan must show a block-keyed hash exchange +
    block-keyed window, not a single global-window partition."""
    plan = frame.rolling(3).sum()._sdf._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__blk__" in plan


def test_dist_rolling_tiny_frame_many_blocks(spark):
    """Blocks smaller than the window: every row must still see its
    full global window (the borrow is a broadcast join against the
    block-boundary table, not a one-block-back copy)."""
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    pdf = pd.DataFrame({"x": vals})
    f = gp.Frame(spark.createDataFrame(pdf))
    got = _series(f.rolling(5).sum(), "x")
    exp = pdf["x"].rolling(5).sum()
    assert np.allclose(got, exp, equal_nan=True)
    got_c = _series(f.rolling(5, center=True, min_periods=1).mean(), "x")
    exp_c = pdf["x"].rolling(5, center=True, min_periods=1).mean()
    assert np.allclose(got_c, exp_c, equal_nan=True)
    got_s = _series(f.shift(3), "x")
    assert np.allclose(got_s, pdf["x"].shift(3), equal_nan=True)


def test_dist_rank_matches_pandas(frame, pdf):
    ties = pdf.copy()
    ties["x"] = np.round(ties["x"], 0)  # create tie groups
    tf = gp.Frame(frame._sdf.sparkSession.createDataFrame(ties).repartition(16)).sort_values("k")
    for method in ("average", "min", "max", "dense", "first"):
        got = _series(tf[["x"]].rank(method=method), "x")
        exp = ties["x"].rank(method=method)
        assert np.allclose(got, exp, equal_nan=True), method
    got_p = _series(tf[["x"]].rank(pct=True), "x")
    assert np.allclose(got_p, ties["x"].rank(pct=True), equal_nan=True)
    got_d = _series(tf[["x"]].rank(ascending=False, method="dense"), "x")
    assert np.allclose(got_d, ties["x"].rank(ascending=False, method="dense"), equal_nan=True)


def test_dist_rank_na_options(spark):
    vals = [3.0, np.nan, 1.0, 2.0, np.nan, 1.0]
    pdf = pd.DataFrame({"x": vals})
    f = gp.Frame.from_pandas(spark, pdf)
    for na in ("keep", "top", "bottom"):
        got = _series(f[["x"]].rank(na_option=na), "x")
        exp = pdf["x"].rank(na_option=na)
        assert np.allclose(got, exp, equal_nan=True), na


def test_frame_cum_matches_pandas(frame, pdf):
    for kind in ("cumsum", "cummax", "cummin"):
        got = _series(getattr(frame[["x", "y"]], kind)(), "x")
        exp = getattr(pdf["x"], kind)()
        assert np.allclose(got, exp, equal_nan=True), kind


def test_frame_cumprod_matches_pandas(spark):
    pdf = pd.DataFrame({"x": [2.0, -3.0, 1.5, 0.0, -2.0, 4.0]})
    f = gp.Frame.from_pandas(spark, pdf)
    got = _series(f.cumprod(), "x")
    assert np.allclose(got, pdf["x"].cumprod())


def test_rolling_agg_multi_one_pass(frame, pdf):
    out = frame[["k", "x"]].rolling(4, min_periods=2).agg(["sum", "mean", "max"])
    got = out.to_pandas()
    # MultiIndex columns (col, fn)
    assert ("x", "mean") in set(got.columns)
    exp = pdf["x"].rolling(4, min_periods=2).mean()
    assert np.allclose(got[("x", "mean")].to_numpy(), exp, equal_nan=True)
    exp_s = pdf["x"].rolling(4, min_periods=2).sum()
    assert np.allclose(got[("x", "sum")].to_numpy(), exp_s, equal_nan=True)
    assert _window_is_blocked(out._sdf)
