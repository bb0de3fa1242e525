"""Duplicate column labels (r11 — the last §2-adjacent semantic gap).

The reference allows duplicate labels everywhere (frame.py getitem;
managers.py:1947 items_overlap_with_suffix exists because merges/joins
create them). This engine maps duplicate labels to unique physical
names (``__dupN_label__``) and resolves label-aware surfaces —
getitem, setitem, drop, rename, set_axis, iloc columns, concat axis=1,
merge suffix interplay, to_pandas/to_spark — through the
``Frame._dup_labels`` metadata. Every test is a pd-diff against the
same operation in pandas.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import go_pandas_spark as gp


@pytest.fixture()
def pdf():
    rng = np.random.RandomState(5)
    return pd.DataFrame({
        "a": rng.normal(0, 1, 40),
        "b": rng.randint(0, 5, 40).astype(float),
        "c": rng.normal(3, 2, 40),
    })


def _diff(out_pdf, exp_pdf):
    assert list(out_pdf.columns) == list(exp_pdf.columns)
    np.testing.assert_allclose(out_pdf.values, exp_pdf.values, rtol=1e-12)


def test_getitem_list_with_repeats(spark, pdf):
    f = gp.Frame.from_pandas(spark, pdf)
    _diff(f[["a", "a", "b"]].to_pandas(), pdf[["a", "a", "b"]])


def test_getitem_dup_label_returns_frame(spark, pdf):
    f = gp.Frame.from_pandas(spark, pdf)[["a", "a"]]
    g = f["a"]
    assert isinstance(g, gp.Frame) and g.columns == ["a", "a"]
    _diff(g.to_pandas(), pdf[["a", "a"]])


def test_getitem_unique_label_on_dup_frame_is_series(spark, pdf):
    f = gp.Frame.from_pandas(spark, pdf)[["a", "a", "b"]]
    s = f["b"]
    assert not isinstance(s, gp.Frame)
    np.testing.assert_allclose(s.to_pandas().values, pdf["b"].values,
                               rtol=1e-12)


def test_from_pandas_roundtrip(spark, pdf):
    dup = pdf[["a", "b", "a", "c"]]
    out = gp.Frame.from_pandas(spark, dup).to_pandas()
    _diff(out, dup)


def test_rename_onto_collision(spark, pdf):
    f = gp.Frame.from_pandas(spark, pdf)
    exp = pdf.rename(columns={"c": "a"})
    _diff(f.rename(columns={"c": "a"}).to_pandas(), exp)


def test_set_axis_escapes_duplicates(spark, pdf):
    f = gp.Frame.from_pandas(spark, pdf).rename(columns={"c": "a"})
    out = f.set_axis(["x", "b", "y"], axis=1)
    exp = pdf.rename(columns={"c": "a"}).set_axis(["x", "b", "y"], axis=1)
    _diff(out.to_pandas(), exp)
    # ...and aggregation works once labels are unique again
    np.testing.assert_allclose(
        out[["x", "y"]].to_pandas().sum().values,
        exp[["x", "y"]].sum().values, rtol=1e-12)


def test_set_axis_creates_duplicates(spark, pdf):
    f = gp.Frame.from_pandas(spark, pdf)
    out = f.set_axis(["a", "a", "c"], axis=1).to_pandas()
    exp = pdf.set_axis(["a", "a", "c"], axis=1)
    _diff(out, exp)


def test_setitem_sets_every_occurrence(spark, pdf):
    f = gp.Frame.from_pandas(spark, pdf).rename(columns={"c": "a"})
    exp = pdf.rename(columns={"c": "a"}).copy()
    f["a"] = 1.25
    exp["a"] = 1.25
    _diff(f.to_pandas(), exp)


def test_drop_drops_every_occurrence(spark, pdf):
    f = gp.Frame.from_pandas(spark, pdf).rename(columns={"c": "a"})
    exp = pdf.rename(columns={"c": "a"}).drop(columns=["a"])
    _diff(f.drop(columns=["a"]).to_pandas(), exp)


def test_iloc_column_positions_pick_one_occurrence(spark, pdf):
    dup = pdf[["a", "b", "a"]]
    f = gp.Frame.from_pandas(spark, dup)
    # iloc picks position 2 (the second 'a'), not both
    out = f.iloc[:, [2]].to_pandas()
    exp = dup.iloc[:, [2]]
    _diff(out, exp)
    # a positional pick that keeps both occurrences stays duplicate
    out2 = f.iloc[:, [0, 2]].to_pandas()
    _diff(out2, dup.iloc[:, [0, 2]])


def test_concat_axis1_overlap_keeps_duplicates(spark, pdf):
    f = gp.Frame.from_pandas(spark, pdf)
    out = gp.concat([f[["a", "b"]], f[["a", "c"]]], axis=1).to_pandas()
    exp = pd.concat([pdf[["a", "b"]], pdf[["a", "c"]]], axis=1)
    _diff(out, exp)


def test_merge_suffix_collision_keeps_duplicates(spark):
    lp = pd.DataFrame({"k": [1, 2, 3], "a": [1.0, 2.0, 3.0],
                       "a_y": [9.0, 8.0, 7.0]})
    rp = pd.DataFrame({"k": [1, 2, 3], "a": [4.0, 5.0, 6.0]})
    exp = lp.merge(rp, on="k")  # right 'a'->'a_y' collides with left a_y
    out = gp.Frame.from_pandas(spark, lp).merge(
        gp.Frame.from_pandas(spark, rp), on="k").to_pandas()
    _diff(out, exp)


def test_merge_empty_suffixes_raise(spark):
    lp = pd.DataFrame({"k": [1], "a": [1.0]})
    rp = pd.DataFrame({"k": [1], "a": [2.0]})
    fl = gp.Frame.from_pandas(spark, lp)
    fr = gp.Frame.from_pandas(spark, rp)
    with pytest.raises(ValueError, match="columns overlap"):
        fl.merge(fr, on="k", suffixes=("", ""))
    # same-named KEYS collapse, so key-only overlap must NOT raise
    out = fl[["k"]].merge(fr, on="k", suffixes=("", "")).to_pandas()
    assert list(out.columns) == ["k", "a"]


def test_nondup_columns_keep_resolving_by_name(spark, pdf):
    """Only REPEATED labels get dup physical names — ordinary by-name
    ops on the other columns of a dup-labeled frame must keep working
    (sort_values, boolean masks, arithmetic)."""
    f = gp.Frame.from_pandas(spark, pdf).rename(columns={"c": "a"})
    exp = pdf.rename(columns={"c": "a"})
    out = f.sort_values("b").to_pandas()
    _diff(out, exp.sort_values("b", kind="stable").reset_index(drop=True))
    flt = f[f["b"] >= 2.0].to_pandas()
    _diff(flt, exp[exp["b"] >= 2.0].reset_index(drop=True))


def test_loc_setter_updates_every_occurrence(spark, pdf):
    """df.loc[rows, dup_label] = v writes every physical occurrence,
    like pandas' loc-setter on duplicate columns."""
    f = gp.Frame.from_pandas(spark, pdf).rename(columns={"c": "a"})
    exp = pdf.rename(columns={"c": "a"}).copy()
    f.loc[f["b"] >= 2.0, "a"] = -5.0
    exp.loc[exp["b"] >= 2.0, "a"] = -5.0
    _diff(f.to_pandas(), exp)


def test_to_spark_surfaces_duplicate_names(spark, pdf):
    f = gp.Frame.from_pandas(spark, pdf)[["a", "a"]]
    sdf = f.to_spark()
    assert sdf.columns == ["a", "a"]
    got = np.sort(np.array(sdf.collect(), dtype=float), axis=0)
    exp = np.sort(pdf[["a", "a"]].values, axis=0)
    np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_concat_axis0_dup_identical_sequences(spark, pdf):
    """concat axis=0 on dup-labeled frames: identical label sequences
    concatenate positionally (pandas); mismatched sequences raise."""
    dup = pdf[["a", "b", "a"]]
    f1 = gp.Frame.from_pandas(spark, dup.iloc[:20])
    f2 = gp.Frame.from_pandas(spark, dup.iloc[20:])
    out = gp.concat([f1, f2], axis=0).to_pandas()
    exp = pd.concat([dup.iloc[:20], dup.iloc[20:]], axis=0,
                    ignore_index=True)
    _diff(out, exp)
    f3 = gp.Frame.from_pandas(spark, pdf[["b", "a", "a"]].iloc[:5])
    with pytest.raises(ValueError, match="identical column sequences"):
        gp.concat([f1, f3], axis=0)


def test_astype_casts_every_occurrence(spark, pdf):
    f = gp.Frame.from_pandas(spark, pdf).rename(columns={"c": "a"})
    out = f.astype({"a": "float32"}).to_pandas()
    exp = pdf.rename(columns={"c": "a"}).astype({"a": "float32"})
    assert list(out.columns) == list(exp.columns)
    assert [str(t) for t in out.dtypes] == [str(t) for t in exp.dtypes]
    np.testing.assert_allclose(out.values, exp.values, rtol=1e-6)


# ---------------- r12: aggregation boundary ----------------

def test_reductions_aggregate_each_occurrence(spark, pdf):
    """Whole-frame reductions on a dup-labeled frame: each physical
    occurrence aggregates separately under its repeated label
    (reference generic.py:9576 iterates columns positionally)."""
    dup = pdf[["a", "b", "a"]]
    f = gp.Frame.from_pandas(spark, dup)
    for op in ("sum", "mean", "min", "max", "var", "std", "median"):
        got, exp = getattr(f, op)(), getattr(dup, op)()
        assert list(got.index) == list(exp.index)
        np.testing.assert_allclose(got.values, exp.values, rtol=1e-9)


def test_count_on_dup_frame_is_series(spark, pdf):
    dup = pdf[["a", "b", "a"]].copy()
    dup.iloc[3, 0] = np.nan
    f = gp.Frame.from_pandas(spark, dup)
    got, exp = f.count(), dup.count()
    assert list(got.index) == list(exp.index)
    np.testing.assert_allclose(got.values, exp.values)


def test_describe_carries_duplicate_labels(spark, pdf):
    dup = pdf[["a", "b", "a"]]
    f = gp.Frame.from_pandas(spark, dup)
    got = f.describe().to_pandas().set_index("summary")
    exp = dup.describe()
    assert list(got.columns) == list(exp.columns)
    np.testing.assert_allclose(got.loc[list(exp.index)].values,
                               exp.values, rtol=1e-9)


def test_agg_list_and_str_on_dup_frame(spark, pdf):
    dup = pdf[["a", "b", "a"]]
    f = gp.Frame.from_pandas(spark, dup)
    got = f.agg(["sum", "mean"])
    exp = dup.agg(["sum", "mean"])
    assert list(got.columns) == list(exp.columns)
    np.testing.assert_allclose(got.values, exp.values, rtol=1e-9)
    gs, es = f.agg("sum"), dup.agg("sum")
    assert list(gs.index) == list(es.index)
    np.testing.assert_allclose(gs.values, es.values, rtol=1e-9)


def test_mad_on_dup_frame(spark, pdf):
    dup = pdf[["a", "b", "a"]]
    f = gp.Frame.from_pandas(spark, dup)
    got = f.mad()
    exp = (dup - dup.mean()).abs().mean()
    assert list(got.index) == ["a", "b", "a"]
    np.testing.assert_allclose(got.values, exp.values, rtol=1e-9)


def test_sort_values_on_dup_key_raises(spark, pdf):
    f = gp.Frame.from_pandas(spark, pdf[["a", "b", "a"]])
    with pytest.raises(ValueError, match="not unique"):
        f.sort_values("a")
    # a UNIQUE label on the same frame still sorts
    out = f.sort_values("b").to_pandas()
    exp = pdf[["a", "b", "a"]].sort_values("b", kind="mergesort") \
        .reset_index(drop=True)
    _diff(out, exp)


# ---------------- r12: merge with dup-labeled inputs ----------------

@pytest.mark.parametrize("how", ["inner", "left", "outer"])
@pytest.mark.parametrize("side", ["left", "right", "both"])
def test_merge_dup_nonkey_inputs(spark, how, side):
    """reference merge.py:38 + managers.py:1947: duplicate NON-key
    columns flow through the suffix machinery; only a duplicated KEY
    label raises."""
    l = pd.DataFrame({"k": [1, 2, 3], "v": [10.0, 20.0, 30.0],
                      "w": [1.0, 2.0, 3.0]})
    r = pd.DataFrame({"k": [1, 2, 4], "u": [5.0, 6.0, 7.0],
                      "z": [8.0, 9.0, 10.0]})
    if side in ("left", "both"):
        l.columns = ["k", "v", "v"]
    if side in ("right", "both"):
        r.columns = ["k", "u", "u"]
    fl = gp.Frame.from_pandas(spark, l)
    fr = gp.Frame.from_pandas(spark, r)
    got = fl.merge(fr, how=how, on="k").to_pandas().reset_index(drop=True)
    exp = l.merge(r, how=how, on="k").reset_index(drop=True)
    assert list(got.columns) == list(exp.columns)
    np.testing.assert_allclose(got.fillna(-9e9).values,
                               exp.fillna(-9e9).values, rtol=1e-12)


def test_merge_overlapping_dup_nonkey_suffixes(spark):
    """left carries duplicate 'v' AND right has a single 'v': every
    left occurrence gets the left suffix, producing duplicate 'v_x'."""
    l = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0], "w": [3.0, 4.0]})
    l.columns = ["k", "v", "v"]
    r = pd.DataFrame({"k": [1, 2], "v": [9.0, 8.0]})
    got = gp.Frame.from_pandas(spark, l).merge(
        gp.Frame.from_pandas(spark, r), on="k").to_pandas()
    exp = l.merge(r, on="k")
    assert list(got.columns) == list(exp.columns) == ["k", "v_x", "v_x", "v_y"]
    np.testing.assert_allclose(got.values, exp.values, rtol=1e-12)


def test_merge_dup_key_label_raises(spark):
    l = pd.DataFrame({"a": [1], "b": [2]})
    l.columns = ["k", "k"]
    r = pd.DataFrame({"k": [1], "u": [5]})
    fl = gp.Frame.from_pandas(spark, l)
    fr = gp.Frame.from_pandas(spark, r)
    with pytest.raises(ValueError, match="not unique"):
        fl.merge(fr, on="k")
    with pytest.raises(ValueError, match="not unique"):
        fr.merge(fl, on="k")


def test_merge_semi_anti_keeps_left_dup_labels(spark):
    l = pd.DataFrame({"k": [1, 2, 3], "v": [1.0, 2.0, 3.0],
                      "w": [4.0, 5.0, 6.0]})
    l.columns = ["k", "v", "v"]
    r = pd.DataFrame({"k": [1, 3]})
    fl = gp.Frame.from_pandas(spark, l)
    fr = gp.Frame.from_pandas(spark, r)
    got = fl.merge(fr, how="left_semi", on="k").to_pandas()
    assert list(got.columns) == ["k", "v", "v"]
    np.testing.assert_allclose(got.values, l[l.k.isin([1, 3])].values,
                               rtol=1e-12)


# ---------------- r12: non-string / unsafe labels ----------------

def test_set_axis_int_labels(spark, pdf):
    """pandas allows set_axis([0, 0, 1]); the engine str-coerces
    (same coercion from_pandas applies to non-string columns)."""
    f = gp.Frame.from_pandas(spark, pdf).set_axis([0, 0, 1], axis=1)
    assert f.columns == ["0", "0", "1"]
    got = f.sum()
    exp = pdf.set_axis([0, 0, 1], axis=1).sum()
    np.testing.assert_allclose(got.values, exp.values, rtol=1e-9)


def test_dotted_and_backticked_dup_labels_resolve(spark, pdf):
    """labels containing dots/backticks must not leak into physical
    column names (F.col would read '.' as struct access)."""
    for lab in ("a.b", "a`b", "a b"):
        f = gp.Frame.from_pandas(spark, pdf).set_axis(
            [lab, lab, "c"], axis=1)
        assert f.columns == [lab, lab, "c"]
        out = f[[lab]].to_pandas()
        exp = pdf.set_axis([lab, lab, "c"], axis=1)[[lab]]
        _diff(out, exp)
        s = f.sum()
        assert list(s.index) == [lab, lab, "c"]


# ---------------- r12: elementwise/columnwise sweep ----------------

@pytest.fixture()
def dupnan(pdf):
    d = pdf[["a", "b", "a"]].copy()
    d.iloc[2, 0] = np.nan
    d.iloc[5, 1] = np.nan
    d.iloc[2, 2] = np.nan
    return d


def _cmp_frames(got, exp):
    assert list(got.columns) == list(exp.columns)
    g = np.where(pd.isna(got.values.astype(float)), -9e9,
                 got.values.astype(float))
    e = np.where(pd.isna(exp.values.astype(float)), -9e9,
                 exp.values.astype(float))
    np.testing.assert_allclose(g, e, rtol=1e-9)


def test_elementwise_sweep_on_dup_frame(spark, dupnan):
    """r12: the elementwise/columnwise family iterates PHYSICAL
    columns, so dup-labeled frames flow through — each occurrence
    transformed separately, labels preserved (reference generic.py
    applies these positionally)."""
    f = gp.Frame.from_pandas(spark, dupnan)
    _cmp_frames(f.fillna(0.0).to_pandas(), dupnan.fillna(0.0))
    _cmp_frames(f.fillna({"a": -1.0}).to_pandas(),
                dupnan.fillna({"a": -1.0}))
    _cmp_frames(f.dropna().to_pandas(),
                dupnan.dropna().reset_index(drop=True))
    _cmp_frames(f.isna().to_pandas(), dupnan.isna())
    _cmp_frames(f.round(1).to_pandas(), dupnan.round(1))
    _cmp_frames(f.where(f["b"] > 1.0).to_pandas(),
                dupnan.where(dupnan["b"] > 1.0))
    _cmp_frames(f.add(2.5).to_pandas(), dupnan.add(2.5))
    _cmp_frames(f.clip(lower=0.0).to_pandas(), dupnan.clip(lower=0.0))
    _cmp_frames(f.abs().to_pandas(), dupnan.abs())
    _cmp_frames(f.select_dtypes(include="float").to_pandas(),
                dupnan.select_dtypes(include="float"))
    _cmp_frames(f.filter(like="a").to_pandas(), dupnan.filter(like="a"))


def test_ordered_kernels_on_dup_frame(spark, dupnan):
    f = gp.Frame.from_pandas(spark, dupnan)
    _cmp_frames(f.cumsum().to_pandas(), dupnan.cumsum())
    _cmp_frames(f.shift(2).to_pandas(), dupnan.shift(2))
    _cmp_frames(f.diff(1).to_pandas(), dupnan.diff(1))
    _cmp_frames(f.rank().to_pandas(), dupnan.rank())
    _cmp_frames(f.ffill().to_pandas(), dupnan.ffill())
    _cmp_frames(f.rolling(3, min_periods=1).mean().to_pandas(),
                dupnan.rolling(3, min_periods=1).mean())
    _cmp_frames(f.expanding(min_periods=1).sum().to_pandas(),
                dupnan.expanding(min_periods=1).sum())


def test_bool_and_uniques_on_dup_frame(spark, dupnan):
    f = gp.Frame.from_pandas(spark, dupnan)
    ga, ea = f.isna().any(), dupnan.isna().any()
    assert list(ga.index) == list(ea.index)
    assert list(ga.values) == list(ea.values)
    gn, en = f.nunique(), dupnan.nunique()
    assert list(gn.index) == list(en.index)
    assert list(gn.values) == list(en.values)
    gd = f.drop_duplicates(subset="b").to_pandas()
    ed = dupnan.drop_duplicates(subset="b").reset_index(drop=True)
    _cmp_frames(gd, ed)


def test_groupby_on_dup_frame(spark):
    """r12: groupby by a UNIQUE key on a dup-labeled frame aggregates
    every occurrence under its repeated label (reference groupby
    iterates columns positionally); a duplicated KEY label raises the
    pandas Grouper error; named aggs targeting a dup label raise."""
    pdf = pd.DataFrame({"k": ["a", "b", "a", "b"],
                        "x": [1.0, 2.0, 3.0, 4.0],
                        "y": [5.0, 6.0, 7.0, 8.0]})
    pdf.columns = ["k", "v", "v"]
    f = gp.Frame.from_pandas(spark, pdf)
    for op in ("sum", "mean", "min", "max", "count"):
        got = getattr(f.groupby("k"), op)().to_pandas()
        exp = getattr(pdf.groupby("k"), op)()
        assert list(got.columns) == list(exp.columns) == ["v", "v"]
        assert got.index.tolist() == exp.index.tolist()
        np.testing.assert_allclose(got.values.astype(float),
                                   exp.values.astype(float), rtol=1e-12)
    d = f.groupby("k").agg({"v": "sum"}).to_pandas()
    assert list(d.columns) == ["v", "v"]
    np.testing.assert_allclose(
        d.values, pdf.groupby("k").sum().values, rtol=1e-12)
    with pytest.raises(ValueError, match="not 1-dimensional"):
        f.groupby("v")
    with pytest.raises(ValueError, match="not unique"):
        f.groupby("k").agg(m=("v", "mean"))


def test_flex_arithmetic_dup_frames(spark):
    """r12: frame÷frame arithmetic on duplicate labels — identical
    sequences align positionally; a dup side against a dup-free side
    broadcasts the unique column onto every occurrence (pandas ops.py
    alignment); two differently-duplicated sides raise."""
    pdf = pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, np.nan],
                        "c": [5.0, 6.0]})
    pdf.columns = ["a", "a", "c"]
    uq = pd.DataFrame({"a": [10.0, 20.0], "c": [1.0, 2.0]})
    f = gp.Frame.from_pandas(spark, pdf)
    u = gp.Frame.from_pandas(spark, uq)

    def _cmp(got, exp):
        g = got.to_pandas()
        assert list(g.columns) == list(exp.columns)
        gv = np.where(pd.isna(g.values.astype(float)), -9e9,
                      g.values.astype(float))
        ev = np.where(pd.isna(exp.values.astype(float)), -9e9,
                      exp.values.astype(float))
        np.testing.assert_allclose(gv, ev, rtol=1e-12)

    _cmp(f.add(f), pdf.add(pdf))
    _cmp(f.sub(f), pdf.sub(pdf))
    _cmp(f.add(u), pdf.add(uq))           # dup left, unique right
    _cmp(u.add(f), uq.add(pdf))           # unique left, dup right
    _cmp(f.add(u, fill_value=0.0), pdf.add(uq, fill_value=0.0))
    # right-only label on a dup-left op: pandas ITSELF crashes in its
    # internals here (AssertionError in BlockManager); the engine's
    # defined behavior is left labels then the right-only as NULL
    uz = gp.Frame.from_pandas(spark, pd.DataFrame(
        {"a": [10.0, 20.0], "z": [1.0, 2.0]}))
    out = f.add(uz).to_pandas()
    assert list(out.columns) == ["a", "a", "c", "z"]
    assert out[["c", "z"]].isna().all().all()
    # two differently-duplicated sides cannot align
    g2 = pdf[["a", "c", "a"]]
    with pytest.raises(ValueError, match="duplicate axis"):
        f.add(gp.Frame.from_pandas(spark, g2))


# ---------------- r13: dup label reduced to ONE occurrence ----------------
# Column-subsetting ops (dropna(axis=1), select_dtypes, filter) keep
# the __dupN__ physical name in _dup_labels even when the label is
# down to one occurrence — key resolution (sort/groupby/named agg)
# must substitute the physical (ADVICE r12 #2).

@pytest.fixture()
def reduced(spark):
    """Frame where label 'a' had two occurrences, one dropped by
    dropna(axis=1): the survivor keeps its __dupN_a__ physical name."""
    p = pd.DataFrame({"a": [1.0, 1.0, 2.0, 2.0],
                      "a2": [np.nan, 1.0, 2.0, 3.0],
                      "b": [10.0, 20.0, 30.0, 40.0]})
    p.columns = ["a", "a", "b"]
    f = gp.Frame.from_pandas(spark, p).dropna(axis=1)
    exp = p.dropna(axis=1)
    assert f.columns == list(exp.columns) == ["a", "b"]
    assert f._dup_labels, "fixture must keep a stranded __dupN__ name"
    return f, exp


def test_reduced_dup_sort_values(spark, reduced):
    f, exp = reduced
    out = f.sort_values("a", ascending=False).to_pandas()
    e = exp.sort_values("a", ascending=False, kind="mergesort") \
        .reset_index(drop=True)
    _diff(out, e)


def test_reduced_dup_groupby_key_and_named_agg(spark, reduced):
    f, exp = reduced
    out = f.groupby("a").agg(total=("b", "sum"), hi=("a", "max")) \
        .to_pandas()
    e = exp.groupby("a").agg(total=("b", "sum"), hi=("a", "max"))
    assert list(out.columns) == list(e.columns)
    np.testing.assert_allclose(out.values, e.values, rtol=1e-12)
    np.testing.assert_allclose(out.index.values.astype(float),
                               e.index.values.astype(float), rtol=1e-12)


def test_reduced_dup_groupby_str_agg(spark, reduced):
    f, exp = reduced
    out = f.groupby("a").agg("sum").to_pandas()
    e = exp.groupby("a").agg("sum")
    assert list(out.columns) == list(e.columns)
    np.testing.assert_allclose(out.values, e.values, rtol=1e-12)


def test_merge_cross_with_on_raises(spark):
    l = gp.Frame.from_pandas(spark, pd.DataFrame({"k": [1, 2]}))
    r = gp.Frame.from_pandas(spark, pd.DataFrame({"k": [3]}))
    with pytest.raises(ValueError, match="Can not pass on"):
        l.merge(r, how="cross", on="k")
    with pytest.raises(ValueError, match="Can not pass on"):
        l.merge(r, how="cross", left_on="k", right_on="k")


# ---------------- r13: duplicate labels x MultiIndex columns ----------------
# reference indexes/multi.py:122 — MultiIndex codes allow repeated
# tuples, so concat(axis=1) of two frames sharing a (value, category)
# column MultiIndex produces duplicate tuple labels.

def _mi_frames(spark):
    pdf = pd.DataFrame({"g": [1, 1, 2, 2],
                        "c": ["x", "y", "x", "y"],
                        "v": [1.0, 2.0, 3.0, 4.0],
                        "w": [5.0, 6.0, 7.0, 8.0]})
    from go_pandas_spark.operators.reshape import unstack
    agg = gp.Frame.from_pandas(spark, pdf).groupby(
        ["g", "c"], as_index=False).agg(v=("v", "mean"), w=("w", "mean"))
    wide = unstack(agg, "c", ["v", "w"], "g")
    exp = pdf.pivot_table(values=["v", "w"], index="g", columns="c")
    return wide, exp


def test_concat_axis1_dup_tuples(spark):
    wide, exp = _mi_frames(spark)
    got = gp.concat([wide, wide], axis=1).to_pandas().sort_index()
    want = pd.concat([exp, exp], axis=1).sort_index()
    assert [tuple(t) for t in got.columns] == [tuple(t) for t in want.columns]
    np.testing.assert_allclose(got.to_numpy(), want.to_numpy(), rtol=1e-12)


def test_dup_tuple_getitem_returns_both(spark):
    wide, exp = _mi_frames(spark)
    both = gp.concat([wide, wide], axis=1)
    one = both[("v", "x")]
    got = one.to_pandas().sort_index()
    want = pd.concat([exp, exp], axis=1)[[("v", "x")]].sort_index()
    assert [tuple(t) for t in got.columns] == [tuple(t) for t in want.columns]
    np.testing.assert_allclose(got.to_numpy(), want.to_numpy(), rtol=1e-12)
    # the single-occurrence path is still a Series
    s = wide[("v", "x")]
    assert not isinstance(s, gp.Frame)


def test_dup_tuple_partial_outer_select_dups_inner(spark):
    wide, exp = _mi_frames(spark)
    both = gp.concat([wide, wide], axis=1)
    got = both["v"].to_pandas().sort_index()
    want = pd.concat([exp, exp], axis=1)["v"].sort_index()
    assert list(got.columns) == list(want.columns)  # x, y, x, y
    np.testing.assert_allclose(got.to_numpy(), want.to_numpy(), rtol=1e-12)


def test_concat_axis1_mi_no_overlap_keeps_labels(spark):
    """Non-overlapping MultiIndex concat keeps both tuple maps (was:
    labels silently dropped)."""
    wide, exp = _mi_frames(spark)
    ren = wide.swaplevel_columns()  # (cat, value) tuples — disjoint
    got = gp.concat([wide, ren], axis=1).to_pandas().sort_index()
    want = pd.concat([exp, exp.swaplevel(axis=1)], axis=1).sort_index()
    assert [tuple(t) for t in got.columns] == [tuple(t) for t in want.columns]
    np.testing.assert_allclose(got.to_numpy(), want.to_numpy(), rtol=1e-12)


def test_stack_multi_dup_tuples_raises(spark):
    from go_pandas_spark.operators.reshape import stack_multi
    wide, _ = _mi_frames(spark)
    both = gp.concat([wide, wide], axis=1)
    with pytest.raises(ValueError, match="duplicate column labels"):
        stack_multi(both.reset_index())


def test_concat_axis1_mi_plus_flat_dup_raises(spark):
    """One concat output cannot carry tuple labels AND repeated flat
    labels (two metadata layers on one frame) — pinned refusal."""
    wide, _ = _mi_frames(spark)
    flat = pd.DataFrame({"g": [1, 2], "z": [1.0, 2.0], "z2": [3.0, 4.0]})
    flat.columns = ["g", "z", "z"]
    fd = gp.Frame.from_pandas(spark, flat).set_index("g")
    with pytest.raises(NotImplementedError, match="duplicate "):
        gp.concat([wide, fd], axis=1)
