"""Aggregate expression library.

Reference parity: the NaN-aware reductions of ``pandas/core/nanops.py``
(nansum:390, nanmean:429, nanstd:564, nansem:666, nanskew:799,
nankurt:878) and the groupby kernel table
``pandas/core/groupby/ops.py:318-353``. Spark aggregates are already
NULL-skipping, so "nan-awareness" is free; the work here is the
*bias-correction deltas*: pandas skew/kurt are the sample-adjusted
G1/G2 statistics while Spark's ``skewness``/``kurtosis`` are the
population g1/g2.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def pandas_skew_col(c: Column) -> Column:
    """Bias-corrected sample skewness G1 = g1 * sqrt(n(n-1))/(n-2)."""
    n = F.count(c).cast("double")
    g1 = F.skewness(c)
    return F.when(n < 3, F.lit(None)).otherwise(g1 * F.sqrt(n * (n - 1)) / (n - 2))


def pandas_kurt_col(c: Column) -> Column:
    """Bias-corrected excess kurtosis G2 = ((n+1)g2 + 6)(n-1)/((n-2)(n-3))."""
    n = F.count(c).cast("double")
    g2 = F.kurtosis(c)
    return F.when(n < 4, F.lit(None)).otherwise(((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3)))


def sem_col(c: Column, ddof: int = 1) -> Column:
    """Standard error of mean = std / sqrt(n) (pandas ``sem``)."""
    std = F.stddev_samp(c) if ddof == 1 else F.stddev_pop(c)
    return std / F.sqrt(F.count(c).cast("double"))


def mode_col(sdf, col: str) -> Column:
    return F.mode(F.col(col))


AGG_TABLE: dict[str, object] = {
    # name → factory(Column) -> Column ; mirrors _cython_table
    # (pandas/core/base.py:184) name-resolution.
    "sum": F.sum,
    "mean": F.avg,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "size": lambda c: F.count(F.lit(1)),
    "first": lambda c: F.first(c, ignorenulls=True),
    "last": lambda c: F.last(c, ignorenulls=True),
    "var": F.var_samp,
    "std": F.stddev_samp,
    "sem": sem_col,
    "median": lambda c: F.percentile(c, F.lit(0.5)),
    "nunique": F.countDistinct,
    "prod": F.product,
    "product": F.product,
    "any": lambda c: F.max(c.cast("boolean")),
    "all": lambda c: F.min(c.cast("boolean")),
    "skew": pandas_skew_col,
    "kurt": pandas_kurt_col,
    "mad": None,  # needs two-phase (mean first) — handled in GroupBy
    "idxmin": None,  # needs the index column — handled in GroupBy
    "idxmax": None,
    "ohlc": None,
}


def resolve_agg(name: str, c: Column) -> Column:
    fn = AGG_TABLE.get(name)
    if fn is None:
        raise KeyError(f"aggregate {name!r} needs special handling")
    return fn(c)


# ---------------- pairwise matrices ----------------

def corr_matrix(frame, method: str = "pearson"):
    """Pairwise correlation matrix (``frame.py:6798``).

    ONE aggregation job computes all pairs (upper triangle) — the
    driver only reshapes the single result row. Spearman = pearson of
    fractional ranks (pandas 'average' method), matching
    ``nancorr_spearman`` (``pandas/_libs/algos.pyx:298``).
    """
    from ..functions.dtypes import is_numeric
    from .ranks import rank_col

    cols = [c for c, dt in frame.dtypes.items() if is_numeric(dt)]
    sdf = frame._sdf
    if method == "spearman":
        for c in cols:
            sdf = sdf.withColumn(f"__rk_{c}__", rank_col(F.col(c), method="average"))
        src = {c: f"__rk_{c}__" for c in cols}
    elif method == "pearson":
        src = {c: c for c in cols}
    else:
        raise NotImplementedError(f"corr method {method}")
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(F.corr(F.col(src[a]), F.col(src[b])).alias(f"{a}||{b}"))
    row = sdf.agg(*aggs).first().asDict()
    import pandas as pd

    m = pd.DataFrame(index=cols, columns=cols, dtype=float)
    for k, v in row.items():
        a, b = k.split("||")
        m.loc[a, b] = v
        m.loc[b, a] = v
    return m


def cov_matrix(frame):
    from ..functions.dtypes import is_numeric

    cols = [c for c, dt in frame.dtypes.items() if is_numeric(dt)]
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(F.covar_samp(F.col(a), F.col(b)).alias(f"{a}||{b}"))
    row = frame._sdf.agg(*aggs).first().asDict()
    import pandas as pd

    m = pd.DataFrame(index=cols, columns=cols, dtype=float)
    for k, v in row.items():
        a, b = k.split("||")
        m.loc[a, b] = v
        m.loc[b, a] = v
    return m


def describe(frame):
    """``generic.py:9084`` — count/mean/std/min/25%/50%/75%/max, exact
    percentiles (pandas interpolation) in a single aggregation."""
    from ..functions.dtypes import is_numeric
    from ..frame import Frame
    from .. import _internal as I

    cols = [c for c, dt in frame.dtypes.items() if is_numeric(dt)]
    stats = [
        ("count", lambda c: F.count(c).cast("double")),
        ("mean", F.avg),
        ("std", F.stddev_samp),
        ("min", lambda c: F.min(c).cast("double")),
        ("25%", lambda c: F.percentile(c, F.lit(0.25))),
        ("50%", lambda c: F.percentile(c, F.lit(0.5))),
        ("75%", lambda c: F.percentile(c, F.lit(0.75))),
        ("max", lambda c: F.max(c).cast("double")),
    ]
    aggs = [fn(F.col(c)).alias(f"{c}||{nm}") for c in cols for nm, fn in stats]
    row = frame._sdf.agg(*aggs).first().asDict()
    spark = frame._sdf.sparkSession
    data = [
        tuple([nm] + [row[f"{c}||{nm}"] for c in cols])
        for nm, _ in stats
    ]
    out = spark.createDataFrame(data, schema=["summary"] + cols)
    return Frame(I.attach_order(out))
