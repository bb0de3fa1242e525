"""Differential tests vs real pandas for the secondary API surface
(round 4): Frame pct_change/round/any/all/idxmin/idxmax/mode/equals/
take/squeeze/prefix/pop/iter*/valid-index/reindex/align/update/
transform, Series duplicated/drop_duplicates/repeat/argmin/argmax/
factorize/mode/nlargest/item/take/equals and the small properties."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import go_pandas_spark as gp


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame({
        "a": [3.0, np.nan, 1.0, 4.0, 1.0, 5.0],
        "b": [10, 20, 30, 40, 50, 60],
        "s": ["x", "y", "x", "z", "x", "y"],
    })


@pytest.fixture(scope="module")
def f(spark, pdf):
    return gp.Frame.from_pandas(spark, pdf)


def test_pct_change(f, pdf):
    got = f.pct_change().to_pandas().reset_index(drop=True)
    exp = pdf[["a", "b"]].pct_change(fill_method=None)
    for c in ("a", "b"):
        assert np.allclose(got[c], exp[c], equal_nan=True)


def test_round_half_even(spark):
    pdf = pd.DataFrame({"x": [0.5, 1.5, 2.5, 2.675, -0.5]})
    f = gp.Frame.from_pandas(spark, pdf)
    got = f.round(0).to_pandas()["x"].tolist()
    assert got == pdf["x"].round(0).tolist()  # 0, 2, 2, 3, -0


def test_any_all_idx(f, pdf):
    bf = gp.Frame.from_pandas(f._sdf.sparkSession,
                              pd.DataFrame({"t": [True, False], "u": [False, False]}))
    assert bf.any() == {"t": True, "u": False}
    assert bf.all() == {"t": False, "u": False}
    assert f.idxmin()["a"] == pdf["a"].idxmin()
    assert f.idxmax()["b"] == pdf["b"].idxmax()


def test_mode_frame_and_series(f, pdf):
    got = f.mode()
    exp = pdf.mode()
    assert got["s"].dropna().tolist() == exp["s"].dropna().tolist()
    assert got["a"].dropna().tolist() == exp["a"].dropna().tolist()
    assert f["s"].mode() == ["x"]
    assert f["a"].mode() == [1.0]


def test_equals(f, pdf, spark):
    assert f.equals(gp.Frame.from_pandas(spark, pdf.copy()))
    assert not f.equals(gp.Frame.from_pandas(spark, pdf.assign(b=pdf["b"] + 1)))
    assert not f.equals(gp.Frame.from_pandas(spark, pdf.head(3)))
    assert f["b"].equals(gp.Frame.from_pandas(spark, pdf)["b"])


def test_take_squeeze_prefix(f, pdf):
    got = f.take([4, 0, 2]).to_pandas().reset_index(drop=True)
    exp = pdf.take([4, 0, 2]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    assert np.allclose(f[["a"]].squeeze().collect(), pdf["a"].tolist(), equal_nan=True)
    assert f.add_prefix("p_").columns == ["p_a", "p_b", "p_s"]
    assert f.add_suffix("_q").columns == ["a_q", "b_q", "s_q"]


def test_pop_mutates(spark, pdf):
    f2 = gp.Frame.from_pandas(spark, pdf)
    s = f2.pop("b")
    assert f2.columns == ["a", "s"]
    assert s.collect() == pdf["b"].tolist()


def test_iteration(f, pdf):
    names = [n for n, _ in f.items()]
    assert names == ["a", "b", "s"]
    rows = list(f.iterrows())
    assert len(rows) == len(pdf)
    assert rows[0][1]["s"] == "x"
    tups = list(f.itertuples())
    assert tups[2].b == 30 and tups[2].s == "x"


def test_valid_index(spark):
    pdf = pd.DataFrame({"x": [np.nan, np.nan, 1.0, 2.0, np.nan]})
    f = gp.Frame.from_pandas(spark, pdf)
    assert f.first_valid_index() == pdf.first_valid_index()
    assert f.last_valid_index() == pdf.last_valid_index()
    empty = gp.Frame.from_pandas(spark, pd.DataFrame({"x": [np.nan] * 3}))
    assert empty.first_valid_index() is None


def test_memory_usage_and_lookup(f, pdf, spark):
    mu = f.memory_usage()
    assert mu["b"] == 6 * 8 and mu["s"] == sum(len(x) for x in pdf["s"])
    fi = gp.Frame.from_pandas(spark, pdf.assign(k=list("uvwxyz"))).set_index("k")
    got = fi.lookup(["w", "u", "nope"], ["b", "s", "a"])
    assert got == [30, "x", None]


def test_reindex(spark, pdf):
    fi = gp.Frame.from_pandas(spark, pdf.assign(k=list("uvwxyz"))).set_index("k")
    out = fi.reindex(index=["z", "u", "qq"], columns=["b", "new"]).to_pandas()
    exp = pdf.assign(k=list("uvwxyz")).set_index("k").reindex(
        index=["z", "u", "qq"], columns=["b", "new"])
    assert out["b"].tolist()[:2] == exp["b"].tolist()[:2]
    assert pd.isna(out["b"].iloc[2]) and out["new"].isna().all()
    assert list(out.index) == ["z", "u", "qq"]


def test_align_outer(spark):
    l = gp.Frame.from_pandas(spark, pd.DataFrame({"k": [1, 2, 3], "x": [10, 20, 30]})).set_index("k")
    r = gp.Frame.from_pandas(spark, pd.DataFrame({"k": [2, 3, 4], "y": [5, 6, 7]})).set_index("k")
    la, ra = l.align(r, join="outer")
    lp, rp = la.to_pandas(), ra.to_pandas()
    el, er = l.to_pandas().align(r.to_pandas(), join="outer")
    pd.testing.assert_frame_equal(lp, el, check_dtype=False)
    pd.testing.assert_frame_equal(rp, er, check_dtype=False)


def test_update_in_place(spark):
    base = gp.Frame.from_pandas(spark, pd.DataFrame(
        {"k": [1, 2, 3], "x": [10.0, 20.0, 30.0], "y": ["a", "b", "c"]})).set_index("k")
    new = gp.Frame.from_pandas(spark, pd.DataFrame(
        {"k": [2, 3], "x": [99.0, np.nan]})).set_index("k")
    base.update(new)
    out = base.to_pandas().sort_index()
    assert out["x"].tolist() == [10.0, 99.0, 30.0]  # NaN does NOT overwrite
    assert out["y"].tolist() == ["a", "b", "c"]


def test_transform(f, pdf):
    got = f[["b"]].transform("sqrt").to_pandas()["b"]
    assert np.allclose(got, np.sqrt(pdf["b"]))


def test_series_duplicated_drop_duplicates(f, pdf):
    for keep in ("first", "last", False):
        got = f["s"].duplicated(keep=keep).collect()
        assert got == pdf["s"].duplicated(keep=keep).tolist(), keep
    got = f["s"].drop_duplicates().collect()
    assert got == pdf["s"].drop_duplicates().tolist()
    got = f["s"].drop_duplicates(keep="last").collect()
    assert got == pdf["s"].drop_duplicates(keep="last").tolist()


def test_series_repeat(f, pdf):
    assert f["b"].repeat(3).collect() == pdf["b"].repeat(3).tolist()


def test_series_arg_and_scalars(f, pdf):
    assert f["a"].argmin() == int(np.nanargmin(pdf["a"].to_numpy()))
    assert f["a"].argmax() == int(np.nanargmax(pdf["a"].to_numpy()))
    assert f["b"].nlargest(2).collect() == pdf["b"].nlargest(2).tolist()
    assert f["b"].nsmallest(2).collect() == pdf["b"].nsmallest(2).tolist()
    assert f[["b"]].head(1).squeeze().item() == 10
    assert f["b"].tolist() == pdf["b"].tolist()
    assert f["b"].take([2, 0]).collect() == [30, 10]
    assert f["b"].dtype == "bigint"
    assert f["a"].hasnans and not f["b"].hasnans
    assert f["b"].is_unique and not f["s"].is_unique


def test_series_factorize(f, pdf):
    codes, uniques = f["s"].factorize()
    exp_codes, exp_uniques = pd.factorize(pdf["s"])
    assert codes.collect() == exp_codes.tolist()
    assert uniques == exp_uniques.tolist()
    # null -> -1 like pandas
    f2 = gp.Frame.from_pandas(f._sdf.sparkSession,
                              pd.DataFrame({"v": ["p", None, "q", "p"]}))
    codes2, uniq2 = f2["v"].factorize()
    assert codes2.collect() == [0, -1, 1, 0] and uniq2 == ["p", "q"]


def test_frame_count_non_null(f, pdf):
    assert f.count() == pdf.count().to_dict()
    assert len(f) == len(pdf)


def test_index_property_and_info(spark, pdf):
    fi = gp.Frame.from_pandas(spark, pdf.assign(k=list("uvwxyz"))).set_index("k")
    assert fi.index.tolist() == list("uvwxyz")
    assert fi.index.name == "k"
    f0 = gp.Frame.from_pandas(spark, pdf)
    assert f0.index.tolist() == sorted(f0.index.tolist())  # positional, monotone
    txt = fi.info()
    assert "non-null" in txt and "a" in txt


def test_frame_reduction_extras(f, pdf):
    num = pdf[["a", "b"]]
    assert abs(f.sem()["b"] - num["b"].sem()) < 1e-9
    assert abs(f.prod()["a"] - num["a"].prod()) < 1e-6
    assert abs(f.mad()["b"] - (num["b"] - num["b"].mean()).abs().mean()) < 1e-9
    assert abs(f.kurtosis()["b"] - num["b"].kurtosis()) < 1e-9
    assert abs(f["b"].sem() - num["b"].sem()) < 1e-9
    assert abs(f["a"].mad() - (num["a"] - num["a"].mean()).abs().mean()) < 1e-9


def test_frame_shape_props_and_elementwise(f, pdf, spark):
    assert f.shape == pdf.shape and f.size == pdf.size and f.ndim == 2
    neg = gp.Frame.from_pandas(spark, pd.DataFrame({"x": [-2.0, 3.0, -5.0]}))
    assert neg.abs().to_pandas()["x"].tolist() == [2.0, 3.0, 5.0]
    assert neg.clip(lower=-1, upper=2).to_pandas()["x"].tolist() == [-1.0, 2.0, -1.0]
    assert f.infer_objects() is f and f.convert_dtypes() is f


def test_frame_sink_methods(f, tmp_path):
    d = str(tmp_path / "csvout")
    f.to_csv(d)
    recs = f.to_dict()
    assert len(recs) == 6 and recs[0]["s"] == "x"
    assert "x" in f.to_string()


def test_series_row_ops(f, pdf):
    assert f["a"].dropna().collect() == pdf["a"].dropna().tolist()
    assert f["b"].head(2).collect() == [10, 20]
    assert f["b"].tail(2).collect() == [50, 60]
    assert f["b"].sort_values(ascending=False).collect() == sorted(pdf["b"], reverse=True)
    assert f["b"].rename("z").name == "z"
    assert f["b"].size == 6 and f["b"].shape == (6,) and f["b"].ndim == 1
    assert list(f["b"].values) == pdf["b"].tolist()
    assert f["b"].iat(3) == 40
    fd, md = f["b"].divmod(7)
    assert fd.collect() == (pdf["b"] // 7).tolist()
    assert md.collect() == (pdf["b"] % 7).tolist()


def test_series_labeled_access(spark, pdf):
    fi = gp.Frame.from_pandas(spark, pdf.assign(k=list("uvwxyz"))).set_index("k")
    s = fi["b"]
    assert s.at("w") == 30
    assert s.get("nope", -1) == -1
    assert s.to_dict() == dict(zip("uvwxyz", pdf["b"]))
    f0 = gp.Frame.from_pandas(spark, pdf)
    assert f0["b"].at(2) == 30  # positional label on unindexed frame


def test_series_combine_and_groupby(spark, pdf):
    f2 = gp.Frame.from_pandas(spark, pd.DataFrame(
        {"k": ["p", "p", "q"], "x": [1.0, None, 3.0], "y": [9.0, 8.0, 7.0]}))
    assert f2["x"].combine_first(f2["y"]).collect() == [1.0, 8.0, 3.0]
    from pyspark.sql import functions as F2
    assert f2["x"].combine(f2["y"], lambda a, b: F2.greatest(a, b)).collect() == [9.0, 8.0, 7.0]
    gp_ = f2["y"].groupby("k").sum().to_pandas()
    col = gp_["y"] if "y" in gp_.columns else gp_.iloc[:, -1]
    keys = gp_["k"] if "k" in gp_.columns else gp_.index
    assert dict(zip(keys, col)) == {"p": 17.0, "q": 7.0}


def test_groupby_method_forms(spark):
    pdf2 = pd.DataFrame({"k": ["a", "a", "b", "b", "b", "b"],
                         "x": [1.0, 5.0, 2.0, 2.0, 9.0, 4.0],
                         "t": [10, 20, 30, 40, 50, 60]})
    f2 = gp.Frame.from_pandas(spark, pdf2)
    g = f2.groupby("k", as_index=False)
    assert g.ngroups == 2
    grp = f2.groupby("k").groups
    assert set(grp) == {"a", "b"} and len(grp["b"]) == 4
    got = g.get_group("b").to_pandas()
    assert got["x"].tolist() == [2.0, 2.0, 9.0, 4.0]
    with pytest.raises(KeyError):
        f2.groupby("k").get_group("zz")
    ng = g.ngroup().collect()
    assert ng == [0, 0, 1, 1, 1, 1]  # sorted key order
    kt = g.kurt().to_pandas()
    exp_k = pdf2.groupby("k")["x"].apply(pd.Series.kurt)
    assert abs(kt.set_index("k")["x"]["b"] - exp_k["b"]) < 1e-9
    ii = g.idxmin().to_pandas().set_index("k")
    assert ii["x"]["a"] == 0 and ii["t"]["b"] == 2
    oh = g.ohlc().to_pandas().set_index("k")
    assert oh.loc["b"].tolist() == [2.0, 9.0, 2.0, 4.0]
    samp = g.sample(n=2, seed=7).to_pandas()
    assert samp.groupby("k").size().tolist() == [2, 2]
    assert g.pipe(lambda gg: gg.ngroups) == 2


def test_series_groupby_value_counts(spark):
    pdf2 = pd.DataFrame({"k": ["a", "a", "a", "b"],
                         "v": ["x", "x", "y", "x"]})
    f2 = gp.Frame.from_pandas(spark, pdf2)
    out = f2.groupby("k")["v"].value_counts().to_pandas()
    exp = pdf2.groupby("k")["v"].value_counts()
    assert out["count"].tolist() == exp.tolist()
    norm = f2.groupby("k")["v"].value_counts(normalize=True).to_pandas()
    assert norm["count"].tolist() == pdf2.groupby("k")["v"].value_counts(normalize=True).tolist()


def test_to_timedelta(spark):
    pdf2 = pd.DataFrame({"s": ["1 days 03:04:05.123456", "03:04:05", "2 days",
                               "-1 days", "bogus", None],
                         "n": [1.5, 2.0, 0.0, -3.0, 90.0, 1.0]})
    f2 = gp.Frame.from_pandas(spark, pdf2)
    got_s = f2.assign(us=gp.to_timedelta(f2["s"]))["us"].collect()
    exp = [pd.Timedelta("1 days 03:04:05.123456"), pd.Timedelta("03:04:05"),
           pd.Timedelta("2 days"), pd.Timedelta("-1 days")]
    assert got_s[:4] == [int(t.total_seconds() * 1_000_000) for t in exp]
    assert pd.isna(got_s[4]) and pd.isna(got_s[5])
    got_n = f2.assign(us=gp.to_timedelta(f2["n"], unit="s"))["us"].collect()
    assert got_n == [1_500_000, 2_000_000, 0, -3_000_000, 90_000_000, 1_000_000]


def test_cat_accessor(spark):
    pdf2 = pd.DataFrame({"c": ["lo", "hi", "lo", "mid", "hi"]})
    f2 = gp.Frame.from_pandas(spark, pdf2)
    assert f2["c"].cat.codes.collect() == pd.factorize(pdf2["c"])[0].tolist()
    assert f2["c"].cat.categories == ["lo", "hi", "mid"]
    ren = f2.assign(c=f2["c"].cat.rename_categories({"lo": "low"}))["c"].collect()
    assert ren == ["low", "hi", "low", "mid", "hi"]
    rem = f2.assign(c=f2["c"].cat.remove_categories(["hi"]))["c"].collect()
    assert rem == ["lo", None, "lo", "mid", None]


def test_groupby_on_index_level(spark):
    pdf2 = pd.DataFrame({"k": ["a", "a", "b"], "v": [1.0, 2.0, 3.0]})
    fi = gp.Frame.from_pandas(spark, pdf2).set_index("k")
    by_name = fi.groupby("k", as_index=False).agg(s=("v", "sum")).to_pandas()
    assert dict(zip(by_name["k"], by_name["s"])) == {"a": 3.0, "b": 3.0}
    by_level = fi.groupby(level=0, as_index=False).agg(s=("v", "sum")).to_pandas()
    assert dict(zip(by_level["k"], by_level["s"])) == {"a": 3.0, "b": 3.0}
    with pytest.raises(KeyError):
        fi.groupby("nope")
    with pytest.raises(TypeError):
        fi.groupby()


def test_merge_on_index(spark):
    l = gp.Frame.from_pandas(spark, pd.DataFrame(
        {"k": [1, 2, 3], "x": [10, 20, 30]})).set_index("k")
    r = gp.Frame.from_pandas(spark, pd.DataFrame(
        {"k": [2, 3, 4], "y": [5, 6, 7]})).set_index("k")
    m = l.merge(r, left_index=True, right_index=True).to_pandas()
    exp = l.to_pandas().merge(r.to_pandas(), left_index=True, right_index=True)
    assert sorted(m["k"]) == sorted(exp.index.tolist())
    assert sorted(zip(m["x"], m["y"])) == sorted(zip(exp["x"], exp["y"]))
    # mixed: column vs index
    l2 = gp.Frame.from_pandas(spark, pd.DataFrame({"kk": [2, 4], "z": [1.0, 2.0]}))
    m2 = l2.merge(r, left_on="kk", right_index=True).to_pandas()
    assert sorted(zip(m2["kk"], m2["y"])) == [(2, 5), (4, 7)]


def test_drop_index_and_rename_forms(spark):
    pdf2 = pd.DataFrame({"k": ["a", "a", "b"], "v": [1.0, 2.0, 3.0]})
    fi = gp.Frame.from_pandas(spark, pdf2).set_index("k")
    assert len(fi.drop(index=["a"])) == 1
    f2 = gp.Frame.from_pandas(spark, pdf2)
    assert f2.rename(columns=str.upper).columns == ["K", "V"]
    ren = fi.rename(index={"a": "z"}).to_pandas().index.tolist()
    assert sorted(ren) == ["b", "z", "z"]


def test_ordered_categorical_comparisons(spark):
    pdf2 = pd.DataFrame({"grade": ["B", "A", "C", "B", "F"]})
    f2 = gp.Frame.from_pandas(spark, pdf2)
    s = f2["grade"].cat.as_ordered(["F", "C", "B", "A"])
    kept = f2[s >= "B"].to_pandas()["grade"].tolist()
    exp_cat = pd.Categorical(pdf2["grade"], categories=["F", "C", "B", "A"], ordered=True)
    exp = pdf2["grade"][pd.Series(exp_cat) >= "B"].tolist()
    assert kept == exp == ["B", "A", "B"]
    assert s.min() == "F" and s.max() == "A"
    with pytest.raises(ValueError):
        s >= "Z"
    # unseen values become null and drop out of comparisons
    s2 = f2["grade"].cat.set_categories(["A", "B"], ordered=True)
    assert f2[s2 > "A"].to_pandas()["grade"].tolist() == ["B", "B"]


def test_range_generators(spark):
    br = gp.bdate_range(spark, "2024-01-01", 10).to_pandas()["ts"]
    exp = pd.bdate_range("2024-01-01", periods=10)
    assert br.dt.date.tolist() == [d.date() for d in exp]
    tr = gp.timedelta_range(spark, 4, freq="30min").to_pandas()["td_us"]
    assert tr.tolist() == [0, 1_800_000_000, 3_600_000_000, 5_400_000_000]
    prm = gp.period_range(spark, "2023-11-01", 4, freq="M").to_pandas()["period"]
    assert prm.tolist() == ["2023-11", "2023-12", "2024-01", "2024-02"]
    prq = gp.period_range(spark, "2024-01-01", 3, freq="Q").to_pandas()["period"]
    assert prq.tolist() == ["2024Q1", "2024Q2", "2024Q3"]


def test_date_range_end_and_weekly_anchors(spark):
    """date_range end= (inclusive) and anchored-weekly freqs vs pandas
    (reference tseries/frequencies weekly anchor snapping)."""
    got = gp.date_range(spark, "2024-01-01", end="2024-01-10").to_pandas()["ts"]
    assert got.tolist() == list(pd.date_range("2024-01-01", "2024-01-10"))
    got = gp.date_range(spark, "2024-01-03", end="2024-02-15", freq="W-SUN")
    assert got.to_pandas()["ts"].tolist() == list(
        pd.date_range("2024-01-03", "2024-02-15", freq="W-SUN"))
    got = gp.date_range(spark, "2024-01-03", periods=5, freq="2W-MON")
    assert got.to_pandas()["ts"].tolist() == list(
        pd.date_range("2024-01-03", periods=5, freq="2W-MON"))
    # positional back-compat: second positional arg is periods
    got = gp.date_range(spark, "2024-01-01", 3).to_pandas()["ts"]
    assert got.tolist() == list(pd.date_range("2024-01-01", periods=3))


def test_dt_time_and_total_seconds(spark):
    """dt.time (documented delta: HH:mm:ss string) and interval
    total_seconds (accessors.py time / TimedeltaProperties)."""
    f = gp.Frame(spark.createDataFrame(pd.DataFrame(
        {"t": pd.to_datetime(["2024-01-01 12:34:56", "2024-01-02 01:02:03"])})))
    assert sorted(f["t"].dt.time.tolist()) == ["01:02:03", "12:34:56"]
    sdf = spark.sql(
        "select timestamp'2024-01-02 03:00:00.5' - timestamp'2024-01-01 00:00:00' as td")
    assert gp.Frame(sdf)["td"].dt.total_seconds().tolist() == [97200.5]


def test_review_positional_labels_multipartition(spark):
    """Raw __order__ ids are (partition<<33)+offset, never positions —
    labels on multi-partition unindexed frames must be true 0-based
    positions (round-4 review finding)."""
    pdf2 = pd.DataFrame({"b": [5, 4, 3, 2, 1, 0], "k": ["x", "x", "y", "y", "x", "y"]})
    sdf = spark.createDataFrame(pdf2).repartition(3)
    # rebuild deterministic order: sort by b desc = original order
    f2 = gp.Frame(sdf).sort_values("b", ascending=False)
    assert f2.idxmin()["b"] == 5
    assert f2.idxmax()["b"] == 0
    assert f2.index.tolist() == [0, 1, 2, 3, 4, 5]
    assert [lbl for lbl, _ in f2.iterrows()] == [0, 1, 2, 3, 4, 5]
    grp = f2.groupby("k").groups
    assert grp["y"] == [2, 3, 5]


def test_review_streaming_first_last_specs(spark, sf_dir):
    """resolve_agg('first') on an __order__-less stream must not
    reference the engine's order column (round-4 review finding)."""
    from go_pandas_spark.streaming import ops
    from tests.test_streaming import _stage_dir

    stream = ops.read_stream(spark, _stage_dir(sf_dir, "events"),
                             schema="event_id long, ts timestamp, user_id long, "
                                    "event_type string, value double, props string")
    out = ops.resample_stream(stream, "1h", "ts", {"v_first": ("value", "first")},
                              watermark="10min")
    ops.run_to_memory(out, "first_spec", output_mode="complete")
    assert spark.sql("SELECT * FROM first_spec").count() > 0


def test_review_groupby_level_unnamed(spark):
    pdf2 = pd.DataFrame({"k": ["a", "a", "b"], "v": [1.0, 2.0, 3.0]})
    fi = gp.Frame.from_pandas(spark, pdf2).set_index("k").rename_axis(None)
    out = fi.groupby(level=0, as_index=False).agg(s=("v", "sum")).to_pandas()
    assert sorted(out["s"]) == [3.0, 3.0]
    out2 = fi.groupby(level=-1, as_index=False).agg(s=("v", "sum")).to_pandas()
    assert sorted(out2["s"]) == [3.0, 3.0]


def test_review_reindex_fill_scope(spark):
    pdf2 = pd.DataFrame({"k": ["u", "v", "w"], "a": [1.0, np.nan, 3.0]})
    fi = gp.Frame.from_pandas(spark, pdf2).set_index("k")
    out = fi.reindex(index=["u", "v", "zz"], fill_value=0).to_pandas()
    assert out["a"].tolist()[0] == 1.0
    assert pd.isna(out["a"].tolist()[1])       # retained NaN stays NaN
    assert out["a"].tolist()[2] == 0.0         # introduced row gets fill


def test_review_update_duplicate_axis_raises(spark):
    base = gp.Frame.from_pandas(spark, pd.DataFrame(
        {"k": [1, 2], "x": [10.0, 20.0]})).set_index("k")
    dup = gp.Frame.from_pandas(spark, pd.DataFrame(
        {"k": [2, 2], "x": [77.0, 99.0]})).set_index("k")
    with pytest.raises(ValueError):
        base.update(dup)


def test_review_value_counts_dropna(spark):
    pdf2 = pd.DataFrame({"k": ["a", "a", "b"], "v": ["x", None, "x"]})
    f2 = gp.Frame.from_pandas(spark, pdf2)
    out = f2.groupby("k")["v"].value_counts().to_pandas()
    assert len(out) == 2 and out["v"].notna().all()
    withna = f2.groupby("k")["v"].value_counts(dropna=False).to_pandas()
    assert len(withna) == 3


def test_review_take_out_of_bounds_raises(spark):
    f2 = gp.Frame.from_pandas(spark, pd.DataFrame({"v": [10, 20, 30]}))
    with pytest.raises(IndexError):
        f2.take([5, 1])


def test_review_any_all_truthiness(spark):
    f2 = gp.Frame.from_pandas(spark, pd.DataFrame(
        {"s": ["abc", "xyz"], "z": [0, 0], "e": [np.nan, np.nan]}))
    assert f2.any() == {"s": True, "z": False, "e": False}
    assert f2.all()["s"] is True and f2.all()["e"] is True  # vacuous
    from pyspark.sql import functions as FF
    empty = gp.Frame(spark.range(1).select(FF.lit(0.0).alias("x")).limit(0))
    assert empty.all() == {"x": True} and empty.any() == {"x": False}


def test_review_align_left_preserves_order(spark):
    l = gp.Frame.from_pandas(spark, pd.DataFrame(
        {"k": [3, 1, 2], "x": [30, 10, 20]})).set_index("k")
    r = gp.Frame.from_pandas(spark, pd.DataFrame(
        {"k": [1, 2, 3], "y": [1, 2, 3]})).set_index("k")
    la, ra = l.align(r, join="left")
    assert la.to_pandas().index.tolist() == [3, 1, 2]
    assert ra.to_pandas().index.tolist() == [3, 1, 2]


def test_review_dropped_findings(spark):
    # pct_change(0) = zeros; prod on empty = 1.0; drop(index) keeps null labels;
    # groupby.sample(frac) draws exactly round(frac*n) per group
    f2 = gp.Frame.from_pandas(spark, pd.DataFrame({"v": [2.0, 4.0]}))
    assert f2.pct_change(0).to_pandas()["v"].tolist() == [0.0, 0.0]
    from pyspark.sql import functions as FF
    empty = gp.Frame(spark.range(1).select(FF.lit(0.0).alias("x")).limit(0))
    assert empty.prod()["x"] == 1.0
    fi = gp.Frame.from_pandas(spark, pd.DataFrame(
        {"k": ["a", None, "b"], "v": [1, 2, 3]})).set_index("k")
    assert len(fi.drop(index=["a"])) == 2  # the null-labeled row survives
    big = gp.Frame.from_pandas(spark, pd.DataFrame(
        {"k": ["a"] * 10 + ["b"] * 10, "v": range(20)}))
    samp = big.groupby("k").sample(frac=0.5, seed=1).to_pandas()
    assert samp.groupby("k").size().tolist() == [5, 5]


def test_callable_getitem(spark, pdf):
    f2 = gp.Frame.from_pandas(spark, pdf)
    got = f2[lambda d: d["b"] > 30].to_pandas()["b"].tolist()
    assert got == pdf[lambda d: d["b"] > 30]["b"].tolist()


def test_callable_conditions(spark, pdf):
    f2 = gp.Frame.from_pandas(spark, pdf)
    got = f2[["b"]].where(lambda d: d["b"] > 30).to_pandas()["b"]
    exp = pdf[["b"]].where(lambda d: d["b"] > 30)["b"]
    assert got.fillna(-1).tolist() == exp.fillna(-1).tolist()
    got_m = f2[["b"]].mask(lambda d: d["b"] > 30, 0).to_pandas()["b"].tolist()
    assert got_m == pdf[["b"]].mask(lambda d: d["b"] > 30, 0)["b"].tolist()
    got_l = f2.loc[lambda d: d["b"] > 30].to_pandas()["b"].tolist()
    assert got_l == pdf.loc[lambda d: d["b"] > 30]["b"].tolist()


def test_str_split_expand_and_dt_names(spark):
    pdf2 = pd.DataFrame({"s": ["a,b,c", "x", None],
                         "ts": pd.to_datetime(["2024-03-04", "2024-12-25", "2024-07-01"])})
    f2 = gp.Frame.from_pandas(spark, pdf2)
    wide = f2["s"].str.split(",", expand=True).to_pandas()
    exp = pdf2["s"].str.split(",", expand=True)
    assert list(wide.columns) == ["0", "1", "2"]
    assert wide["0"].tolist() == exp[0].tolist()
    assert wide.fillna("-")["2"].tolist() == exp.fillna("-")[2].tolist()
    assert f2["ts"].dt.day_name().collect() == pdf2["ts"].dt.day_name().tolist()
    assert f2["ts"].dt.month_name().collect() == pdf2["ts"].dt.month_name().tolist()


def test_tail_surface_additions(spark):
    """set_axis, swapaxes, to_period, get_value, Series at_time/
    between_time/empty/view/asfreq — the last 0.24 tail."""
    pdf = pd.DataFrame({"t": pd.date_range("2024-01-01", periods=48, freq="h"),
                        "v": [float(i) for i in range(48)]})
    f = gp.Frame.from_pandas(spark, pdf)
    s = f.set_index("t")["v"]
    assert sorted(s.at_time("03:00:00").tolist()) == \
        sorted(pdf.set_index("t")["v"].at_time("03:00").tolist())
    assert sorted(s.between_time("01:00:00", "03:00:00").tolist()) == \
        sorted(pdf.set_index("t")["v"].between_time("01:00", "03:00").tolist())
    assert s.empty is False
    assert s.view("double").tolist() == s.tolist()
    g = gp.Frame.from_pandas(spark, pd.DataFrame({"a": [10, 20, 30]}))
    sa = g.set_axis(["x", "y", "z"], axis=0)
    assert sa.at["y", "a"] == 20 and sa.get_value("z", "a") == 30
    assert list(g.set_axis(["A"], axis=1).columns) == ["A"]
    with pytest.raises(NotImplementedError):
        g.set_value("x", "a", 0)
    assert f.to_period("M", on="t").to_pandas()["t"].unique().tolist() == ["2024-01"]
    assert g.swapaxes(0, 0) is g
    af = s.asfreq("2h", method="ffill").to_pandas()
    exp = pdf.set_index("t")["v"].asfreq("2h", method="ffill")
    assert sorted(af["v"].tolist()) == sorted(exp.tolist())
