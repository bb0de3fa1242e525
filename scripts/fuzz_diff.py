"""Differential fuzz harness: random frames, engine vs real pandas.

The late-r5 ad-hoc fuzz campaign caught 14 real semantic bugs; this
script makes the harness reusable.  Each *family* is a function that
takes (spark, rng) and either returns None (pass) or a string
describing the mismatch.  Frames are generated with mixed dtypes,
nulls, NaN/inf, unicode, ties, and random partitioning so both
value semantics and shuffle/order invariance get exercised.

Usage:
    python scripts/fuzz_diff.py [--family NAME] [--waves N] [--seed S]

On failure the wave prints the family, seed, and mismatch detail --
rerun with that seed to reproduce, then pin a regression test.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import go_pandas_spark as gp  # noqa: E402


# ---------------------------------------------------------------- generators

def rand_pdf(rng: np.random.Generator, n: int | None = None,
             with_dt: bool = False) -> pd.DataFrame:
    """Mixed-dtype frame with an explicit row id for order-free compare."""
    n = n or int(rng.integers(5, 200))
    keys = rng.choice(list("abcd") + [None], size=n).astype(object)
    ints = rng.integers(-5, 6, size=n).astype("float64")
    ints[rng.random(n) < 0.15] = np.nan
    flts = rng.normal(0, 10, size=n)
    flts[rng.random(n) < 0.2] = np.nan
    pdf = pd.DataFrame({
        "rid": np.arange(n, dtype="int64"),
        "k": keys,
        "i": ints,
        "v": flts,
        "w": rng.integers(0, 3, size=n).astype("int64"),
    })
    if with_dt:
        base = pd.Timestamp("2024-01-01")
        offs = np.sort(rng.integers(0, 10_000, size=n))
        pdf["ts"] = base + pd.to_timedelta(offs * 60, unit="s")
    return pdf


def to_frame(spark, rng: np.random.Generator, pdf: pd.DataFrame):
    f = gp.Frame.from_pandas(spark, pdf)
    parts = int(rng.integers(1, 9))
    # repartition scrambles physical order; engine semantics must not care
    return f.repartition(parts)


def _sorted(a):
    return np.sort(np.asarray(a, dtype="float64"))


def close(got, exp, tol=1e-9) -> bool:
    g = np.asarray(got, dtype="float64")
    e = np.asarray(exp, dtype="float64")
    if g.shape != e.shape:
        return False
    with np.errstate(invalid="ignore"):
        return bool(np.all((np.isnan(g) & np.isnan(e)) |
                           np.isclose(g, e, rtol=1e-6, atol=1e-9, equal_nan=True)))


def by_rid(frame_pdf: pd.DataFrame, col: str):
    return frame_pdf.sort_values("rid")[col].to_numpy()


# ---------------------------------------------------------------- families

def fam_groupby_agg(spark, rng):
    """Named-agg battery vs pandas incl. NaN group keys and dropna."""
    pdf = rand_pdf(rng)
    f = to_frame(spark, rng, pdf)
    dropna = bool(rng.integers(0, 2))
    fn = rng.choice(["sum", "mean", "var", "std", "median", "min", "max",
                     "sem", "skew", "mad", "nunique", "count", "prod"])
    got = getattr(f.groupby("k", dropna=dropna), fn)().to_pandas()
    if "k" not in got.columns:
        got = got.reset_index()
    exp = getattr(pdf.groupby("k", dropna=dropna)["v"], fn)()
    if fn == "mad":  # pandas mad via apply (deprecated path consistent w/ 0.24)
        exp = pdf.groupby("k", dropna=dropna)["v"].apply(
            lambda s: (s - s.mean()).abs().mean())
    gv = got.set_index("k")["v"].sort_index()
    ev = exp.sort_index()
    if not close(gv.to_numpy(), ev.reindex(gv.index).to_numpy()):
        return f"groupby {fn} dropna={dropna}\n{gv}\nvs\n{ev}"


def fam_groupby_transform(spark, rng):
    pdf = rand_pdf(rng)
    f = to_frame(spark, rng, pdf)
    fn = rng.choice(["sum", "mean", "max", "min", "count"])
    got = f.groupby("k").transform(fn, cols=["v"]).to_pandas()
    exp = pdf.groupby("k")["v"].transform(fn)
    if not close(by_rid(got, "v"), exp.to_numpy()):
        return f"transform {fn}"


def fam_ewm_moments(spark, rng):
    """ewm std/var (mean already covered by pinned tests)."""
    pdf = rand_pdf(rng)
    f = to_frame(spark, rng, pdf).sort_values("rid")
    alpha = float(rng.uniform(0.05, 0.95))
    adjust = bool(rng.integers(0, 2))
    stat = rng.choice(["std", "var"])
    got = getattr(f.groupby("w").ewm(alpha=alpha, adjust=adjust), stat)(
        cols=["v"]).to_pandas()
    exp = pdf.groupby("w")["v"].transform(
        lambda s: getattr(s.ewm(alpha=alpha, adjust=adjust), stat)())
    if not close(by_rid(got, "v"), exp.to_numpy(), tol=1e-6):
        return f"ewm {stat} alpha={alpha} adjust={adjust}"


def fam_expanding_moments(spark, rng):
    pdf = rand_pdf(rng)
    f = to_frame(spark, rng, pdf).sort_values("rid")
    stat = rng.choice(["var", "std", "skew", "kurt", "sem"])
    mp = int(rng.integers(1, 4))
    got = getattr(f.groupby("w").expanding(min_periods=mp), stat)(
        cols=["v"]).to_pandas()
    exp = pdf.sort_values("rid").groupby("w")["v"].transform(
        lambda s: getattr(s.expanding(min_periods=mp), stat)())
    if not close(by_rid(got, "v"), exp.to_numpy(), tol=1e-6):
        return f"expanding {stat} min_periods={mp}"


def fam_rolling_moments(spark, rng):
    pdf = rand_pdf(rng)
    f = to_frame(spark, rng, pdf).sort_values("rid")
    stat = rng.choice(["sum", "mean", "var", "std", "min", "max", "median",
                       "skew", "kurt", "sem", "count"])
    win = int(rng.integers(2, 8))
    mp = int(rng.integers(1, win + 1))
    center = bool(rng.integers(0, 2))
    got = getattr(f.groupby("w").rolling(win, min_periods=mp, center=center),
                  stat)(cols=["v"]).to_pandas()
    exp = pdf.sort_values("rid").groupby("w")["v"].transform(
        lambda s: getattr(s.rolling(win, min_periods=mp, center=center), stat)())
    if not close(by_rid(got, "v"), exp.to_numpy(), tol=1e-6):
        return f"rolling {stat} win={win} mp={mp} center={center}"


def fam_value_counts(spark, rng):
    pdf = rand_pdf(rng)
    f = to_frame(spark, rng, pdf)
    normalize = bool(rng.integers(0, 2))
    dropna = bool(rng.integers(0, 2))
    got = f["i"].value_counts(normalize=normalize, dropna=dropna)
    exp = pdf["i"].value_counts(normalize=normalize, dropna=dropna)
    gp_ = got.to_pandas() if hasattr(got, "to_pandas") else got
    if isinstance(gp_, pd.DataFrame):
        gp_ = gp_.set_index(gp_.columns[0]).iloc[:, 0]
    g = gp_.sort_index()
    e = exp.sort_index()
    # align on float keys incl. NaN
    gk = [x for x in g.index if not pd.isna(x)]
    ek = [x for x in e.index if not pd.isna(x)]
    if not close(sorted(gk), sorted(ek)) or not close(
            _sorted(g.to_numpy()), _sorted(e.to_numpy())):
        return f"value_counts normalize={normalize} dropna={dropna}\n{g}\nvs\n{e}"


def fam_nlargest(spark, rng):
    pdf = rand_pdf(rng)
    f = to_frame(spark, rng, pdf)
    n = int(rng.integers(1, 12))
    which = rng.choice(["nlargest", "nsmallest"])
    got = getattr(f, which)(n, "i").to_pandas()
    exp = getattr(pdf, which)(n, "i")
    if not close(_sorted(got["i"].to_numpy()), _sorted(exp["i"].to_numpy())):
        return f"{which} n={n}\n{got['i'].tolist()}\nvs\n{exp['i'].tolist()}"


def fam_cut_qcut(spark, rng):
    pdf = rand_pdf(rng)
    f = to_frame(spark, rng, pdf)
    if rng.integers(0, 2):
        nb = int(rng.integers(2, 6))
        right = bool(rng.integers(0, 2))
        got = gp.cut(f["v"], nb, right=right, labels=False)
        exp = pd.cut(pdf["v"], nb, right=right, labels=False)
        g = by_rid(got._frame.to_pandas() if hasattr(got, "_frame") else got.to_pandas(), got.name if hasattr(got, "name") else "v")
    else:
        q = int(rng.integers(2, 6))
        got = gp.qcut(f["v"], q, labels=False)
        try:
            exp = pd.qcut(pdf["v"], q, labels=False, duplicates="raise")
        except ValueError:
            return None  # duplicate edges: engine documents drop behavior
        g = by_rid(got._frame.to_pandas() if hasattr(got, "_frame") else got.to_pandas(), got.name if hasattr(got, "name") else "v")
    if not close(g, exp.to_numpy()):
        return "cut/qcut codes"


def fam_quantile(spark, rng):
    pdf = rand_pdf(rng)
    f = to_frame(spark, rng, pdf)
    q = float(rng.uniform(0, 1))
    got = f["v"].quantile(q)
    exp = pdf["v"].quantile(q)
    if not close([got], [exp], tol=1e-6):
        return f"quantile q={q}: {got} vs {exp}"


def fam_duplicated(spark, rng):
    pdf = rand_pdf(rng)
    f = to_frame(spark, rng, pdf)
    keep = rng.choice(["first", "last", False])
    got = f.drop_duplicates(subset=["k", "w"], keep=keep).to_pandas()
    exp = pdf.drop_duplicates(subset=["k", "w"], keep=keep)
    if sorted(got["rid"].tolist()) != sorted(exp["rid"].tolist()):
        return (f"drop_duplicates keep={keep}: got rid {sorted(got['rid'].tolist())} "
                f"vs {sorted(exp['rid'].tolist())}")


def fam_shift_fill(spark, rng):
    pdf = rand_pdf(rng)
    f = to_frame(spark, rng, pdf).sort_values("rid")
    per = int(rng.integers(-4, 5))
    got = f.groupby("w").shift(periods=per, cols=["v"]).to_pandas()
    exp = pdf.sort_values("rid").groupby("w")["v"].shift(per)
    if not close(by_rid(got, "v"), exp.to_numpy()):
        return f"groupby shift periods={per}"


def fam_concat_align(spark, rng):
    p1 = rand_pdf(rng)
    p2 = rand_pdf(rng).rename(columns={"v": "v2"})
    f1 = to_frame(spark, rng, p1)
    f2 = to_frame(spark, rng, p2)
    got = gp.concat([f1, f2]).to_pandas()
    exp = pd.concat([p1, p2], sort=False)
    if len(got) != len(exp) or set(got.columns) != set(exp.columns):
        return f"concat shape {got.shape} vs {exp.shape}"
    for c in ("v", "v2"):
        if not close(_sorted(got[c].dropna()), _sorted(exp[c].dropna())):
            return f"concat values col {c}"


def fam_rank_na(spark, rng):
    pdf = rand_pdf(rng)
    f = to_frame(spark, rng, pdf)
    method = rng.choice(["average", "min", "max", "dense", "first"])
    na_opt = rng.choice(["keep", "top", "bottom"])
    pct = bool(rng.integers(0, 2))
    ascending = bool(rng.integers(0, 2))
    got = f.assign(r=f.groupby("w")["v"].rank(method, ascending=ascending,
                                              na_option=na_opt, pct=pct)).to_pandas()
    exp = pdf.groupby("w")["v"].rank(method=method, ascending=ascending,
                                     na_option=na_opt, pct=pct)
    if not close(by_rid(got, "r"), exp.to_numpy()):
        return f"rank {method}/{na_opt} pct={pct} asc={ascending}"


def fam_fillna_limit(spark, rng):
    pdf = rand_pdf(rng)
    f = to_frame(spark, rng, pdf).sort_values("rid")
    method = rng.choice(["ffill", "bfill"])
    limit = rng.choice([None, 1, 2])
    got = getattr(f.groupby("w"), "fillna")(method=method, limit=limit,
                                            cols=["v"]).to_pandas()
    exp = pdf.sort_values("rid").groupby("w")["v"].transform(
        lambda s: getattr(s, method)(limit=limit))
    if not close(by_rid(got, "v"), exp.to_numpy()):
        return f"fillna {method} limit={limit}"


def fam_describe(spark, rng):
    pdf = rand_pdf(rng)
    f = to_frame(spark, rng, pdf)
    got = f[["i", "v"]].describe().to_pandas()
    exp = pdf[["i", "v"]].describe()
    gcol = got.set_index(got.columns[0]) if got.columns[0] not in ("i",) else got
    for c in ("i", "v"):
        g = gcol[c].to_numpy() if c in gcol else None
        if g is None or not close(_sorted(np.nan_to_num(g)),
                                  _sorted(np.nan_to_num(exp[c].to_numpy())), tol=1e-6):
            return f"describe col {c}\n{got}\nvs\n{exp}"


FAMILIES = {
    "groupby_agg": fam_groupby_agg,
    "groupby_transform": fam_groupby_transform,
    "ewm_moments": fam_ewm_moments,
    "expanding_moments": fam_expanding_moments,
    "rolling_moments": fam_rolling_moments,
    "value_counts": fam_value_counts,
    "nlargest": fam_nlargest,
    "cut_qcut": fam_cut_qcut,
    "quantile": fam_quantile,
    "duplicated": fam_duplicated,
    "shift_fill": fam_shift_fill,
    "concat_align": fam_concat_align,
    "rank_na": fam_rank_na,
    "fillna_limit": fam_fillna_limit,
    "describe": fam_describe,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default=None)
    ap.add_argument("--waves", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    spark = gp.get_spark("fuzz")
    fams = {args.family: FAMILIES[args.family]} if args.family else FAMILIES
    failures = 0
    for name, fn in fams.items():
        for w in range(args.waves):
            seed = args.seed * 10_000 + hash(name) % 1000 + w
            rng = np.random.default_rng(seed)
            try:
                detail = fn(spark, rng)
            except Exception:
                failures += 1
                print(f"FAIL {name} wave={w} seed={seed} (exception)")
                traceback.print_exc()
                continue
            if detail:
                failures += 1
                print(f"FAIL {name} wave={w} seed={seed}: {detail}")
            else:
                print(f"ok   {name} wave={w}")
    print(f"\n{'FAILURES: %d' % failures if failures else 'ALL GREEN'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
