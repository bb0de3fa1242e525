"""UDF/UDAF/UDTF surface (§2.11) + the round-2 reshape additions."""

from __future__ import annotations

import numpy as np
import pandas as pd

import go_pandas_spark as gp


def test_rolling_apply_matches_pandas(spark, sf_dir):
    ev = gp.read_parquet(spark, f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"])
    r = ev.groupby("user_id")["value"].rolling(4).apply(lambda a: float(np.ptp(a)))
    got = ev.assign(rng=r).to_pandas()
    pdf = ev.to_pandas()
    exp = pdf.groupby("user_id")["value"].transform(
        lambda s: s.rolling(4).apply(lambda a: np.ptp(a), raw=True))
    assert np.allclose(got.sort_values("event_id")["rng"].to_numpy(),
                       pdf.assign(e=exp).sort_values("event_id")["e"].to_numpy(),
                       equal_nan=True)


def test_groupby_agg_callable(spark, sf_dir):
    ev = gp.read_parquet(spark, f"{sf_dir}/events.parquet")
    got = ev.groupby("event_type", as_index=False).agg_udf(
        "value", lambda s: float((s > s.mean()).mean()), alias="frac_above_mean").to_pandas()
    pdf = ev[["event_type", "value"]].to_pandas()
    exp = pdf.groupby("event_type")["value"].agg(lambda s: (s > s.mean()).mean())
    got = got.set_index("event_type")["frac_above_mean"]
    assert np.allclose(got.sort_index(), exp.sort_index())


def test_wide_to_long(spark):
    from go_pandas_spark.operators.reshape import wide_to_long

    pdf = pd.DataFrame({
        "id": [1, 2],
        "price2020": [10.0, 20.0], "price2021": [11.0, 21.0],
        "qty2020": [1.0, 2.0], "qty2021": [3.0, 4.0],
    })
    f = gp.Frame.from_pandas(spark, pdf)
    long = wide_to_long(f, ["price", "qty"], i="id", j="year").to_pandas()
    assert len(long) == 4
    exp = pd.wide_to_long(pdf, ["price", "qty"], i="id", j="year").reset_index()
    got = long.astype({"year": int}).sort_values(["id", "year"]).reset_index(drop=True)
    exp = exp.sort_values(["id", "year"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["id", "year", "price", "qty"]],
                                  exp[["id", "year", "price", "qty"]], check_dtype=False)


def test_truncate_and_loc(spark, sf_dir):
    od = gp.read_parquet(spark, f"{sf_dir}/orders.parquet").set_index("o_orderkey")
    t = od.truncate(before=100, after=200)
    pdf = t.reset_index().to_pandas()
    assert pdf["o_orderkey"].between(100, 200).all()
    keys = pdf["o_orderkey"].head(5).tolist()
    sel = od.loc_select(keys).reset_index().to_pandas()
    assert sorted(sel["o_orderkey"]) == sorted(keys)


def test_ewm_std_var_match_pandas(spark, sf_dir):
    ev = gp.read_parquet(spark, f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"])
    got = ev.groupby("user_id").ewm(span=5).std(cols=["value"]).to_pandas()
    pdf = ev.to_pandas()
    exp = pdf.groupby("user_id")["value"].transform(lambda s: s.ewm(span=5).std())
    assert np.allclose(got.sort_values("event_id")["value"].to_numpy(),
                       pdf.assign(e=exp).sort_values("event_id")["e"].to_numpy(),
                       equal_nan=True)


def test_cross_frame_series_alignment(spark):
    """Label-aligned arithmetic across frames (SURVEY §1.4): full-outer
    join on index, NULL where labels don't match — pandas semantics."""
    a = pd.DataFrame({"k": [1, 2, 3], "x": [10.0, 20.0, 30.0]})
    b = pd.DataFrame({"k": [2, 3, 4], "x": [1.0, 2.0, 3.0]})
    fa = gp.Frame.from_pandas(spark, a).set_index("k")
    fb = gp.Frame.from_pandas(spark, b).set_index("k")
    s = fa["x"] + fb["x"]
    got = s.to_frame("s").reset_index().to_pandas().sort_values("k").reset_index(drop=True)
    exp = (a.set_index("k")["x"] + b.set_index("k")["x"]).reset_index().rename(columns={"x": "s"})
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_cross_frame_requires_index(spark):
    import pytest as _pt

    a = gp.Frame.from_pandas(spark, pd.DataFrame({"x": [1.0]}))
    b = gp.Frame.from_pandas(spark, pd.DataFrame({"x": [2.0]}))
    with _pt.raises(ValueError):
        _ = a["x"] + b["x"]


def test_multimodal_decoder_registry(spark, sf_dir):
    """The codec contract: a registered per-mime decoder is used in
    preference to the deterministic fake, executor-side."""
    from go_pandas_spark.operators import multimodal
    from pyspark.sql import functions as F

    docs = gp.read_parquet(spark, f"{sf_dir}/documents.parquet").to_spark().limit(50)
    media = multimodal.make_media_frame(
        docs.select("doc_id", F.encode("text", "utf-8").alias("b")),
        "doc_id", "b", "text/plain")
    multimodal.register_decoder("text/plain", lambda content: [float(len(content or b"")), 1.0])
    try:
        out = multimodal.extract_features(media, dim=2).toPandas()
        assert (out["features"].map(lambda f: f[1]) == 1.0).all()
        assert (out["features"].map(len) == 2).all()
    finally:
        multimodal._DECODERS.pop("text/plain", None)
    # without a decoder and without the fake: clear contract error
    import pytest as _pytest
    with _pytest.raises(Exception) as ei:
        multimodal.extract_features(media, dim=2).toPandas()
    assert "register_decoder" in str(ei.value)


def test_groupby_apply_skewed_schema_inference(spark):
    """Schema inference must collect a BOUNDED sample of the first
    group (groupby.py .limit(1000)) — a skewed group must not be able
    to pull its full contents onto the driver — while execution still
    runs func over every row of every group."""
    import pandas as pd

    pdf = pd.DataFrame({
        "k": ["a"] * 2500 + ["b"] * 7,
        "v": list(range(2500)) + list(range(7)),
    })
    f = gp.Frame.from_pandas(spark, pdf)
    got = (f.groupby("k").apply(
        lambda g: pd.DataFrame({"k": [g["k"].iloc[0]], "n": [len(g)],
                                "s": [float(g["v"].sum())]}))
        .to_pandas().set_index("k").sort_index())
    # full-group results prove execution saw all 2500 rows even though
    # inference was capped at 1000
    assert got.loc["a", "n"] == 2500
    assert got.loc["a", "s"] == float(sum(range(2500)))
    assert got.loc["b", "n"] == 7


def test_groupby_named_agg_callable(spark):
    """agg(out=('col', lambda s: ...)) — pandas named aggregation with
    a callable (core/groupby/generic.py:183) rides a grouped-agg
    pandas UDF and composes with JVM aggregates in the same pass."""
    import numpy as np
    import pandas as pd

    import go_pandas_spark as gp

    pdf = pd.DataFrame({"k": ["a", "b", "a", "b", "a"],
                        "x": [1.0, 2.0, 5.0, 8.0, 3.0]})
    f = gp.Frame.from_pandas(spark, pdf)
    got = (f.groupby("k", as_index=False)
           .agg(rng=("x", lambda s: s.max() - s.min()), total=("x", "sum"))
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = (pdf.groupby("k", as_index=False)
           .agg(rng=("x", lambda s: s.max() - s.min()), total=("x", "sum"))
           .sort_values("k").reset_index(drop=True))
    assert np.allclose(got["rng"], exp["rng"]) and np.allclose(got["total"], exp["total"])


def test_groupby_transform_callable(spark):
    """transform(callable) rides a grouped-map pandas UDF: shape
    preserved, null-key rows NaN, scalar results broadcast."""
    pdf = pd.DataFrame({"k": ["a", "a", "b", None, "b"],
                        "v": [1.0, 3.0, 10.0, 7.0, 20.0],
                        "rid": [0, 1, 2, 3, 4]})
    f = gp.Frame.from_pandas(spark, pdf)
    got = f.groupby("k").transform(lambda s: s - s.mean(), cols=["v"]).to_pandas()
    exp = pdf.groupby("k")["v"].transform(lambda s: s - s.mean())
    assert np.allclose(got.sort_values("rid")["v"].to_numpy(),
                       exp.to_numpy(), equal_nan=True)
    # scalar broadcast + SeriesGroupBy route
    s = f.groupby("k")["v"].transform(lambda x: x.max())
    got2 = s.to_pandas()
    exp2 = pdf.groupby("k")["v"].transform("max")
    assert np.allclose(np.sort(np.nan_to_num(got2.to_numpy(), nan=-1)),
                       np.sort(np.nan_to_num(exp2.to_numpy(), nan=-1)))
