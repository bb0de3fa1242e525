"""Row MultiIndex at depth >= 3 (r12 — VERDICT r11 missing #2).

The ``__index_i__`` plumbing is depth-generic by construction; these
tests pin the LEVEL-ADDRESSED surfaces — unstack(level)/droplevel/
swaplevel/sort_index(level)/xs — at 3 levels, by position AND by name,
each as a pd-diff against the reference semantics
(``pandas/core/indexes/multi.py:122``, ``reshape.py:362`` _Unstacker).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import go_pandas_spark as gp


@pytest.fixture()
def pdf():
    # unique (a, b, c) combos so unstack is well-defined in pandas too
    rows = [(a, b, c) for a in ("x", "y") for b in ("p", "q", "r")
            for c in (0, 1)]
    rng = np.random.RandomState(11)
    out = pd.DataFrame(rows, columns=["a", "b", "c"])
    out["v"] = rng.normal(0, 1, len(out))
    out["w"] = rng.normal(5, 2, len(out))
    return out


def _idx_frames(spark, pdf):
    return (gp.Frame.from_pandas(spark, pdf).set_index(["a", "b", "c"]),
            pdf.set_index(["a", "b", "c"]))


def _diff_frame(got_pdf, exp_pdf):
    exp_pdf = exp_pdf.sort_index()
    got_pdf = got_pdf.sort_index()
    assert list(got_pdf.columns) == [
        c if isinstance(c, str) else c for c in exp_pdf.columns] or \
        list(map(tuple, got_pdf.columns)) == list(map(tuple, exp_pdf.columns))
    np.testing.assert_allclose(
        np.asarray(got_pdf.values, dtype=float),
        np.asarray(exp_pdf.values, dtype=float), rtol=1e-12)


@pytest.mark.parametrize("level", [0, 1, 2, -1, "a", "b", "c"])
def test_unstack_any_level_depth3(spark, pdf, level):
    f, p = _idx_frames(spark, pdf)
    got = f.unstack(level).to_pandas()
    exp = p.unstack(level)
    # engine col labels are (value, category) string tuples
    exp.columns = pd.MultiIndex.from_tuples(
        [(v, str(cat)) for v, cat in exp.columns])
    _diff_frame(got, exp)


@pytest.mark.parametrize("i,j", [(0, 2), (1, 2), ("a", "c"), ("c", "b"),
                                 (-1, 0)])
def test_swaplevel_depth3(spark, pdf, i, j):
    f, p = _idx_frames(spark, pdf)
    got = f.swaplevel(i, j).to_pandas()
    exp = p.swaplevel(i, j)
    assert got.index.names == exp.index.names
    _diff_frame(got, exp)


@pytest.mark.parametrize("level", [0, 1, 2, -1, "a", "b", "c"])
def test_droplevel_depth3(spark, pdf, level):
    f, p = _idx_frames(spark, pdf)
    got = f.droplevel(level, axis=0).to_pandas()
    exp = p.droplevel(level)
    assert got.index.names == exp.index.names
    _diff_frame(got, exp)


@pytest.mark.parametrize("level", [[2, 0], [1], "b", ["c", "a"]])
def test_sort_index_level_depth3(spark, pdf, level):
    f, p = _idx_frames(spark, pdf)
    got = f.sort_index(level=level).to_pandas()
    exp = p.sort_index(level=level)
    assert got.index.tolist() == exp.index.tolist()
    np.testing.assert_allclose(got.values, exp.values, rtol=1e-12)


@pytest.mark.parametrize("key,level", [("p", 1), ("p", "b"), (1, "c"),
                                       ("y", 0)])
def test_xs_depth3(spark, pdf, key, level):
    f, p = _idx_frames(spark, pdf)
    got = f.xs(key, level=level).to_pandas()
    exp = p.xs(key, level=level)
    assert got.index.names == exp.index.names
    _diff_frame(got, exp)


def test_groupby3_unstack_chain(spark, pdf):
    """The real analytics idiom: 3-key groupby -> unstack(level) —
    VERDICT r11 named this the motivating chain."""
    f = gp.Frame.from_pandas(spark, pdf)
    got = f.groupby(["a", "b", "c"]).agg(vm=("v", "mean")) \
        .unstack("b").to_pandas()
    # single-value unstack flattens to bare category columns (engine
    # contract since r9 — same shape as pandas Series.unstack)
    exp = pdf.groupby(["a", "b", "c"])["v"].mean().unstack("b")
    exp.columns = [str(c) for c in exp.columns]
    _diff_frame(got, exp)


def test_unstack_then_droplevel_then_swap(spark, pdf):
    f, p = _idx_frames(spark, pdf)
    got = f.unstack(2).droplevel_rows("b").to_pandas()
    exp = p.unstack(2).droplevel("b")
    exp.columns = pd.MultiIndex.from_tuples(
        [(v, str(cat)) for v, cat in exp.columns])
    assert got.index.names == exp.index.names
    _diff_frame(got, exp)


def test_level_errors(spark, pdf):
    f, _ = _idx_frames(spark, pdf)
    with pytest.raises(KeyError):
        f.unstack("nope")
    with pytest.raises(IndexError):
        f.droplevel_rows(3)
    with pytest.raises(IndexError):
        f.swaplevel(0, -4)
