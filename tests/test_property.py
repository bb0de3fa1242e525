"""Property-based invariants (hypothesis — the reference uses it in
its offsets/apply suites, SURVEY §5): row-count/schema/ordering laws
that must hold for ANY input frame."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

import go_pandas_spark as gp

KEYS = st.sampled_from(["a", "b", "c", "d"])
ROWS = st.lists(
    st.tuples(KEYS, st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
              st.integers(min_value=-1000, max_value=1000)),
    min_size=1, max_size=30)


def _frame(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "x", "n"])
    return gp.Frame.from_pandas(spark, pdf), pdf


@settings(max_examples=15, deadline=None)
@given(rows=ROWS)
def test_merge_rowcount_laws(spark, rows):
    f, pdf = _frame(spark, rows)
    inner = f.merge(f, on="k", suffixes=("_l", "_r"))
    exp = pdf.merge(pdf, on="k")
    assert len(inner) == len(exp)


@settings(max_examples=15, deadline=None)
@given(rows=ROWS)
def test_concat_and_dedup_laws(spark, rows):
    f, pdf = _frame(spark, rows)
    both = gp.concat([f, f])
    assert len(both) == 2 * len(pdf)
    d = both.drop_duplicates()
    assert len(d) == len(pdf.drop_duplicates())


@settings(max_examples=15, deadline=None)
@given(rows=ROWS)
def test_sort_is_stable_and_idempotent(spark, rows):
    f, pdf = _frame(spark, rows)
    s1 = f.sort_values(["k", "x", "n"]).to_pandas().reset_index(drop=True)
    s2 = f.sort_values(["k", "x", "n"]).sort_values(["k", "x", "n"]).to_pandas().reset_index(drop=True)
    exp = pdf.sort_values(["k", "x", "n"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(s1, exp, check_dtype=False)
    pd.testing.assert_frame_equal(s1, s2, check_dtype=False)


@settings(max_examples=15, deadline=None)
@given(rows=ROWS)
def test_groupby_sum_matches_pandas(spark, rows):
    f, pdf = _frame(spark, rows)
    got = f.groupby("k", as_index=False).agg(s=("x", "sum"), n=("n", "count")).to_pandas()
    exp = pdf.groupby("k", sort=True).agg(s=("x", "sum"), n=("n", "count")).reset_index()
    got = got.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-9)


@settings(max_examples=15, deadline=None)
@given(rows=ROWS)
def test_rank_bounds(spark, rows):
    f, pdf = _frame(spark, rows)
    r = f.assign(r=f["x"].rank("average")).to_pandas()["r"]
    n = len(pdf)
    assert r.min() >= 1 and r.max() <= n
    assert abs(r.sum() - n * (n + 1) / 2) < 1e-6  # rank sums are conserved


@settings(max_examples=10, deadline=None)
@given(expr_parts=st.lists(st.sampled_from(
    ["x > 0", "n <= 10", "k == 'a'", "not (n < -5)", "x ** 2 < 1e9"]), min_size=1, max_size=3),
    rows=ROWS)
def test_query_translator_never_crashes_and_subsets(spark, expr_parts, rows):
    f, pdf = _frame(spark, rows)
    expr = " and ".join(expr_parts)
    out = f.query(expr)
    assert 0 <= len(out) <= len(pdf)


VALS = st.lists(
    st.one_of(st.none(), st.floats(min_value=-1e6, max_value=1e6,
                                   allow_nan=False, allow_infinity=False)),
    min_size=1, max_size=40)


@settings(max_examples=12, deadline=None)
@given(vals=VALS, n=st.integers(min_value=1, max_value=6))
def test_dist_rolling_any_input_matches_pandas(spark, vals, n):
    """Block-partitioned ungrouped rolling == pandas for any values
    (incl. nulls) and any window size, even when blocks ≪ window."""
    import numpy as np

    pdf = pd.DataFrame({"x": pd.array(vals, dtype="float64")})
    f = gp.Frame.from_pandas(spark, pdf)
    got = f.rolling(n, min_periods=1).sum().to_pandas()["x"].to_numpy()
    exp = pdf["x"].rolling(n, min_periods=1).sum().to_numpy()
    assert np.allclose(got, exp, equal_nan=True)


@settings(max_examples=12, deadline=None)
@given(vals=VALS)
def test_dist_cum_and_expanding_any_input_matches_pandas(spark, vals):
    import numpy as np

    pdf = pd.DataFrame({"x": pd.array(vals, dtype="float64")})
    f = gp.Frame.from_pandas(spark, pdf)
    got_c = f.cumsum().to_pandas()["x"].to_numpy()
    assert np.allclose(got_c, pdf["x"].cumsum().to_numpy(), equal_nan=True)
    got_e = f.expanding().mean().to_pandas()["x"].to_numpy()
    assert np.allclose(got_e, pdf["x"].expanding().mean().to_numpy(), equal_nan=True)
    got_m = f.cummax().to_pandas()["x"].to_numpy()
    assert np.allclose(got_m, pdf["x"].cummax().to_numpy(), equal_nan=True)


@settings(max_examples=10, deadline=None)
@given(vals=VALS, method=st.sampled_from(["average", "min", "max", "dense", "first"]))
def test_dist_rank_any_input_matches_pandas(spark, vals, method):
    import numpy as np

    pdf = pd.DataFrame({"x": pd.array(vals, dtype="float64")})
    f = gp.Frame.from_pandas(spark, pdf)
    got = f[["x"]].rank(method=method).to_pandas()["x"].to_numpy()
    exp = pdf["x"].rank(method=method).to_numpy()
    assert np.allclose(got, exp, equal_nan=True)


@settings(max_examples=10, deadline=None)
@given(rows=ROWS)
def test_secondary_surface_laws(spark, rows):
    """take / duplicated / factorize / pct_change match pandas on
    arbitrary frames."""
    import numpy as np

    f, pdf = _frame(spark, rows)
    n = len(pdf)
    idx = [0, n - 1, n // 2]
    got = f.take(idx).to_pandas().reset_index(drop=True)
    exp = pdf.take(idx).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)

    assert f["k"].duplicated().collect() == pdf["k"].duplicated().tolist()
    codes, uniques = f["k"].factorize()
    exp_codes, exp_uniques = pd.factorize(pdf["k"])
    assert codes.collect() == exp_codes.tolist()
    assert uniques == exp_uniques.tolist()

    got_pct = f[["x"]].pct_change().to_pandas()["x"].to_numpy()
    exp_pct = pdf[["x"]].pct_change(fill_method=None)["x"].to_numpy()
    # division by exact 0.0: Spark nulls where numpy yields ±inf —
    # compare only where both are finite, and require the non-finite
    # POSITIONS to agree
    got_bad = ~np.isfinite(got_pct)
    exp_bad = ~np.isfinite(exp_pct)
    assert (got_bad == exp_bad).all()
    assert np.allclose(got_pct[~got_bad], exp_pct[~exp_bad])


@settings(max_examples=12, deadline=None)
@given(vals=st.lists(st.one_of(st.none(),
                               st.floats(min_value=-100, max_value=100, allow_nan=False)),
                     min_size=2, max_size=25),
       direction=st.sampled_from(["forward", "backward", "both"]),
       area=st.sampled_from([None, "inside", "outside"]),
       limit=st.sampled_from([None, 1, 2]))
def test_interpolate_direction_area_any_pattern(spark, vals, direction, area, limit):
    """interpolate(limit_direction, limit_area, limit) equals pandas
    for ANY NaN pattern (reference generic.py:6438 preserve-set)."""
    import numpy as np

    pdf = pd.DataFrame({"v": [float("nan") if v is None else v for v in vals]})
    f = gp.Frame.from_pandas(spark, pdf)
    got = f.interpolate(subset=["v"], limit=limit, limit_direction=direction,
                        limit_area=area).to_pandas()["v"].to_numpy()
    exp = pdf["v"].interpolate(limit=limit, limit_direction=direction,
                               limit_area=area).to_numpy()
    assert np.allclose(got, exp, equal_nan=True), (vals, direction, area, limit)


@settings(max_examples=10, deadline=None)
@given(words=st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=60),
       chunk=st.sampled_from([4, 7, 10]), overlap=st.sampled_from([0, 2, 3]))
def test_chunk_documents_covers_all_tokens(spark, words, chunk, overlap):
    """Chunking invariants for ANY token stream: starts advance by
    chunk-overlap; every token appears in some chunk; reassembling the
    non-overlapped heads reconstructs the document."""
    from go_pandas_spark.operators.text import chunk_documents

    text = " ".join(words)
    sdf = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    rows = sorted((r["chunk_id"], r["chunk_text"]) for r in
                  chunk_documents(sdf, "doc_id", "text",
                                  chunk_size=chunk, overlap=overlap).collect())
    step = chunk - overlap
    # reconstruction: chunk i contributes its tokens from offset
    # (overlap if i>0 else 0) — the rest repeats the previous chunk
    rebuilt = []
    for cid, ctext in rows:
        toks = ctext.split(" ")
        rebuilt.extend(toks if cid == 0 else toks[overlap:])
    assert rebuilt == words, (words, chunk, overlap, rows)


@settings(max_examples=15, deadline=None)
@given(rows=ROWS, thr=st.floats(min_value=-1e5, max_value=1e5, allow_nan=False))
def test_flex_comparison_laws(spark, rows, thr):
    """eq/ne partition every cell; lt|ge partition non-null numerics;
    string columns compare False against numeric scalars."""
    f, pdf = _frame(spark, rows)
    eq = f.eq(thr).to_pandas()
    ne = f.ne(thr).to_pandas()
    for c in ("k", "x", "n"):
        assert eq[c].dtype == bool and ne[c].dtype == bool
        assert (eq[c] ^ ne[c]).all()        # exact complements
    assert not eq["k"].any()                # str vs float -> False
    lt, ge = f.lt(thr).to_pandas(), f.ge(thr).to_pandas()
    nonnull = pdf["x"].notna()
    assert ((lt["x"] | ge["x"]) == nonnull.values).all()
    assert (lt["x"].values == (pdf["x"] < thr).fillna(False).values).all()


@settings(max_examples=10, deadline=None)
@given(rows=ROWS)
def test_frame_agg_matches_reductions(spark, rows):
    """agg(['sum','min','max']) agrees with the individual reductions
    and with pandas on the numeric columns."""
    f, pdf = _frame(spark, rows)
    got = f.agg(["sum", "min", "max"])
    assert got.loc["sum", "x"] == pytest.approx(pdf["x"].sum())
    assert got.loc["min", "n"] == pdf["n"].min()
    assert got.loc["max", "x"] == pdf["x"].max()
    s = f.sum()
    assert got.loc["sum", "x"] == pytest.approx(s["x"])


# ---- to_datetime format-parsing fuzz family (r11) -------------------
# Random strftime formats × random in-range datetimes × string
# corruption, engine to_datetime(format=, errors='coerce') vs pandas.
# The parser was the one §2.9 surface with no adversarial coverage;
# first wave caught the Java 'yy' century pivot (69-99 must map to
# 19xx like POSIX/pandas, not 20xx).

_DATE_FMTS = ["%Y-%m-%d", "%d/%m/%Y", "%m/%d/%Y", "%Y%m%d",
              "%b %d %Y", "%d %B %Y", "%y-%m-%d"]
_TIME_FMTS = ["", " %H:%M", " %H:%M:%S", " %I:%M %p"]

_DT = st.datetimes(min_value=pd.Timestamp("1700-01-01").to_pydatetime(),
                   max_value=pd.Timestamp("2200-12-31").to_pydatetime())


def _corrupt(s: str, mode: int) -> str:
    if mode == 1 and len(s) > 3:
        return s[:-2]                       # truncated tail
    if mode == 2:
        return s.replace("0", "x", 1)       # non-digit injection
    if mode == 3:
        return ""                           # empty
    if mode == 4:
        return "not a date at all"
    if mode == 5:
        return s.lower()   # r13: month names / am-pm parse any-case
    if mode == 6:
        return s.upper()
    return s


@settings(max_examples=20, deadline=None)
@given(dfmt=st.sampled_from(_DATE_FMTS), tfmt=st.sampled_from(_TIME_FMTS),
       dts=st.lists(_DT, min_size=1, max_size=8),
       modes=st.lists(st.integers(min_value=0, max_value=6), min_size=1,
                      max_size=8))
def test_to_datetime_format_fuzz(spark, dfmt, tfmt, dts, modes):
    fmt = dfmt + tfmt
    strs = [_corrupt(d.strftime(fmt), m)
            for d, m in zip(dts, modes + [0] * len(dts))]
    pdf = pd.DataFrame({"s": strs})
    f = gp.Frame.from_pandas(spark, pdf)
    got = gp.to_datetime(f["s"], format=fmt).to_pandas()
    exp = pd.to_datetime(pdf["s"], format=fmt, errors="coerce")
    for s, g, e in zip(strs, got, exp):
        g = pd.Timestamp(g).tz_localize(None) if not pd.isna(g) else g
        assert (pd.isna(g) and pd.isna(e)) or g == e, \
            f"{s!r} with {fmt!r}: engine={g} pandas={e}"


def test_to_datetime_inference_battery(spark):
    """No-format inference: the delimiter/compact variants pandas'
    sniffer accepts parse identically; free-form dateutil guesses
    (two-digit-year-first) stay NaT — documented delta."""
    cases = ["2024-01-02", "2024-01-02 03:04:05", "2024/01/02",
             "20240102", "2024-01-02T03:04:05", "", "garbage",
             # r12 stretch: month-name shapes pandas' sniffer accepts
             "02-Jan-2024", "2-Mar-1999 10:30:00", "Jan 2, 2024",
             "Dec 31, 2023 23:59:59", "January 2, 2024", "2 Jan 2024",
             "15 Aug 2025 06:07:08",
             # r13: dateutil is case-insensitive on month names
             "02-jan-2024", "2-MAR-1999 10:30:00", "december 31, 2023",
             "15 AUGUST 2025", "jan 2, 2024"]
    pdf = pd.DataFrame({"s": cases})
    f = gp.Frame.from_pandas(spark, pdf)
    got = gp.to_datetime(f["s"]).to_pandas()
    for s, g in zip(cases, got):
        if s in ("", "garbage"):
            assert pd.isna(g)
        else:
            exp = pd.to_datetime(s)
            assert pd.Timestamp(g).tz_localize(None) == exp, f"{s!r}: {g}"


def test_to_datetime_monthname_fuzz(spark):
    """r12 stretch wave: random dates rendered through each month-name
    shape (with/without time) parse identically to pandas inference;
    corrupted strings stay NaT in both."""
    import numpy as np

    rng = np.random.RandomState(12)
    fmts = ["%d-%b-%Y", "%b %d, %Y", "%B %d, %Y", "%d %b %Y",
            "%d-%b-%Y %H:%M:%S", "%b %d, %Y %H:%M:%S"]
    base = pd.Timestamp("1972-01-01")
    dts = [base + pd.Timedelta(days=int(d), seconds=int(s))
           for d, s in zip(rng.randint(0, 25000, 60),
                           rng.randint(0, 86400, 60))]
    strs, fs = [], []
    for i, d in enumerate(dts):
        fmt = fmts[i % len(fmts)]
        s = d.strftime(fmt)
        if i % 10 == 9:
            s = s.replace("-", "~", 1)  # corrupt → NaT in both
        elif i % 5 == 3:
            s = s.lower()   # r13 wave: scraped-data casing
        elif i % 5 == 4:
            s = s.upper()
        strs.append(s)
        fs.append(fmt)
    pdf = pd.DataFrame({"s": strs})
    f = gp.Frame.from_pandas(spark, pdf)
    got = gp.to_datetime(f["s"]).to_pandas()
    exp = pd.to_datetime(pdf["s"], format="mixed", errors="coerce")
    for s, g, e in zip(strs, got, exp):
        g = pd.Timestamp(g).tz_localize(None) if not pd.isna(g) else g
        assert (pd.isna(g) and pd.isna(e)) or g == e, \
            f"{s!r}: engine={g} pandas={e}"
