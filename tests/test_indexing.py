"""Full .loc/.iloc semantics (reference indexing.py:1537/1912),
differential against real pandas."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import go_pandas_spark as gp


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame({
        "id": [10, 20, 30, 40, 50, 60],
        "x": [1.5, 2.5, 3.5, 4.5, 5.5, 6.5],
        "s": list("abcdef"),
    })


@pytest.fixture(scope="module")
def frame(spark, pdf):
    return gp.Frame.from_pandas(spark, pdf)


def test_loc_label_slice_inclusive(frame, pdf):
    got = frame.set_index("id").loc[20:40].reset_index().to_pandas()
    exp = pdf.set_index("id").loc[20:40].reset_index()
    pd.testing.assert_frame_equal(
        got.sort_values("id").reset_index(drop=True), exp)


def test_loc_open_ended_slices(frame, pdf):
    f = frame.set_index("id")
    p = pdf.set_index("id")
    got = f.loc[40:].reset_index().to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, p.loc[40:].reset_index())
    got = f.loc[:30].reset_index().to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, p.loc[:30].reset_index())


def test_loc_label_list_and_keyerror(frame, pdf):
    f = frame.set_index("id")
    got = f.loc[[20, 50]].reset_index().to_pandas().sort_values("id").reset_index(drop=True)
    exp = pdf.set_index("id").loc[[20, 50]].reset_index()
    pd.testing.assert_frame_equal(got, exp)
    with pytest.raises(KeyError):
        f.loc[[20, 999]]


def test_loc_bool_mask_and_columns(frame, pdf):
    got = frame.loc[frame["x"] > 3, ["id", "s"]].to_pandas().reset_index(drop=True)
    exp = pdf.loc[pdf["x"] > 3, ["id", "s"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # column label slice is inclusive
    got2 = frame.loc[frame["x"] > 3, "x":"s"].to_pandas().reset_index(drop=True)
    exp2 = pdf.loc[pdf["x"] > 3, "x":"s"].reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, exp2)


def test_loc_setter_conditional(spark, pdf):
    f = gp.Frame.from_pandas(spark, pdf)
    f.loc[f["x"] > 3, "x"] = -1.0
    exp = pdf.copy()
    exp.loc[exp["x"] > 3, "x"] = -1.0
    pd.testing.assert_frame_equal(f.to_pandas().reset_index(drop=True), exp)


def test_loc_setter_label_rows(spark, pdf):
    f = gp.Frame.from_pandas(spark, pdf).set_index("id")
    f.loc[[20, 40], "s"] = "Z"
    exp = pdf.set_index("id").copy()
    exp.loc[[20, 40], "s"] = "Z"
    got = f.reset_index().to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp.reset_index())


def test_iloc_ints_and_negatives(frame, pdf):
    got = frame.iloc[2].to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, pdf.iloc[[2]].reset_index(drop=True))
    got_n = frame.iloc[-1].to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got_n, pdf.iloc[[-1]].reset_index(drop=True))
    got_l = frame.iloc[[0, -2, 3]].to_pandas()
    exp_l = pdf.iloc[sorted({0, len(pdf) - 2, 3})].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_l.sort_values("id").reset_index(drop=True), exp_l)


def test_iloc_slices_with_step(frame, pdf):
    got = frame.iloc[1:5:2].to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, pdf.iloc[1:5:2].reset_index(drop=True))
    got2 = frame.iloc[::3].to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, pdf.iloc[::3].reset_index(drop=True))


def test_iloc_negative_step_reverses(frame, pdf):
    got = frame.iloc[::-1].to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, pdf.iloc[::-1].reset_index(drop=True))
    got2 = frame.iloc[4:0:-2].to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, pdf.iloc[4:0:-2].reset_index(drop=True))


def test_iloc_positional_columns(frame, pdf):
    got = frame.iloc[1:4, [0, 2]].to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, pdf.iloc[1:4, [0, 2]].reset_index(drop=True))
    got2 = frame.iloc[:, 1].to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, pdf.iloc[:, [1]].reset_index(drop=True))


# ---------------- row MultiIndex ops ----------------

@pytest.fixture(scope="module")
def mi_pdf():
    return pd.DataFrame({
        "a": ["x", "x", "y", "y", "z", "z"],
        "b": [1, 2, 1, 2, 1, 3],
        "v": [10.0, 20.0, 30.0, 40.0, 50.0, 60.0],
        "w": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
    })


def test_unstack_row_multiindex_single_value(spark, mi_pdf):
    f = gp.Frame.from_pandas(spark, mi_pdf[["a", "b", "v"]]).set_index(["a", "b"])
    got = f.unstack(-1).reset_index().to_pandas().sort_values("a").reset_index(drop=True)
    exp = mi_pdf[["a", "b", "v"]].set_index(["a", "b"])["v"].unstack(-1)
    exp.columns = [str(c) for c in exp.columns]
    exp = exp.reset_index().rename_axis(None, axis=1)
    pd.testing.assert_frame_equal(got, exp)


def test_unstack_level0(spark, mi_pdf):
    f = gp.Frame.from_pandas(spark, mi_pdf[["a", "b", "v"]]).set_index(["a", "b"])
    got = f.unstack(0).reset_index().to_pandas().sort_values("b").reset_index(drop=True)
    exp = mi_pdf[["a", "b", "v"]].set_index(["a", "b"])["v"].unstack(0)
    exp = exp.reset_index().rename_axis(None, axis=1)
    pd.testing.assert_frame_equal(got, exp)


def test_swaplevel_and_sort_index_level(spark, mi_pdf):
    f = gp.Frame.from_pandas(spark, mi_pdf).set_index(["a", "b"]).swaplevel(0, 1)
    got = f.sort_index(level=0).reset_index().to_pandas().reset_index(drop=True)
    exp = (mi_pdf.set_index(["a", "b"]).swaplevel(0, 1)
           .sort_index(level=0).reset_index())
    pd.testing.assert_frame_equal(got, exp)


def test_droplevel_rows(spark, mi_pdf):
    f = gp.Frame.from_pandas(spark, mi_pdf).set_index(["a", "b"]).droplevel_rows(0)
    got = f.reset_index().to_pandas().sort_values(["b", "v"]).reset_index(drop=True)
    exp = (mi_pdf.set_index(["a", "b"]).droplevel(0).reset_index()
           .sort_values(["b", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp)


def test_unstack_multi_value_columns(spark, mi_pdf):
    f = gp.Frame.from_pandas(spark, mi_pdf).set_index(["a", "b"])
    out = f.unstack(-1)
    labels = set(out.column_labels)
    assert ("v", "1") in labels and ("w", "3") in labels
    got = out.to_pandas()  # columns come back as a real pandas MultiIndex
    assert got.loc[got.index.get_level_values(0) == "z", ("v", "3")].iloc[0] == 60.0
    assert pd.isna(got.loc[got.index.get_level_values(0) == "x", ("v", "3")].iloc[0])


def test_loc_full_slice_without_index(frame, pdf):
    """df.loc[:], df.loc[:, cols], and df.loc[:, col] = v all work on a
    frame with NO index set (pandas allows them on any frame)."""
    got = frame.loc[:].to_pandas()
    pd.testing.assert_frame_equal(got, pdf)
    got = frame.loc[:, ["id", "x"]].to_pandas()
    pd.testing.assert_frame_equal(got, pdf[["id", "x"]])


def test_loc_full_slice_setter_without_index(spark, pdf):
    f = gp.Frame.from_pandas(spark, pdf)
    f.loc[:, "x"] = 9.0
    exp = pdf.copy()
    exp["x"] = 9.0
    pd.testing.assert_frame_equal(f.to_pandas(), exp)
