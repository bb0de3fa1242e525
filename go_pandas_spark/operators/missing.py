"""Missing-data operators: fillna / ffill / bfill / interpolate / replace.

Reference parity: ``generic.py:5606 fillna``, pad/backfill kernels
``pandas/_libs/algos.pyx:400,598``, ``generic.py:6438 interpolate`` →
``core/missing.py:111``, ``generic.py:6098 replace``.

Mapping (SURVEY §2.9 "Missing-data"): ffill = ``last(col,
ignorenulls=True)`` over an unbounded-preceding window; bfill
mirrored; ``limit`` = a count-since-last-valid guard expression;
linear interpolation = prev/next value + position algebra over two
windows. All JVM-side expressions — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, Window as W, functions as F

from .. import _internal as I


def _fill_exprs(c: str, method: str, limit: int | None, partition_by: list[str]):
    part = partition_by or []
    if method in ("ffill", "pad"):
        w = W.partitionBy(*part).orderBy(I.ORDER_COL).rowsBetween(W.unboundedPreceding, W.currentRow)
        rn_w = W.partitionBy(*part).orderBy(I.ORDER_COL)
        pick = lambda col: F.last(col, ignorenulls=True).over(w)  # noqa: E731
    elif method in ("bfill", "backfill"):
        w = W.partitionBy(*part).orderBy(I.ORDER_COL).rowsBetween(W.currentRow, W.unboundedFollowing)
        rn_w = W.partitionBy(*part).orderBy(F.col(I.ORDER_COL).desc())
        pick = lambda col: F.first(col, ignorenulls=True).over(w)  # noqa: E731
    else:
        raise ValueError(method)
    filled = pick(F.col(c))
    if limit is not None:
        rn = F.row_number().over(rn_w)
        last_valid_rn = pick(F.when(F.col(c).isNotNull(), rn))
        gap = rn - last_valid_rn
        filled = F.when(F.col(c).isNotNull() | (gap <= limit), filled)
    return filled


def fillna(frame, value=None, method: str | None = None, subset=None, limit: int | None = None,
           partition_by: list[str] | None = None):
    from ..frame import Frame

    cols = subset or frame.columns
    cols = [cols] if isinstance(cols, str) else list(cols)
    sdf = frame._sdf
    if method is not None:
        for c in cols:
            sdf = sdf.withColumn(c, _fill_exprs(c, method, limit, partition_by or []))
    elif isinstance(value, dict):
        for c, v in value.items():
            sdf = sdf.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    else:
        from ..functions.dtypes import is_numeric

        dtypes = frame.dtypes
        numeric_value = isinstance(value, (int, float)) and not isinstance(value, bool)
        for c in cols:
            # only fill type-compatible columns (pandas casts; we skip)
            if numeric_value and not is_numeric(dtypes[c]):
                continue
            if isinstance(value, str) and dtypes[c] != "string":
                continue
            sdf = sdf.withColumn(c, F.coalesce(F.col(c), F.lit(value)))
    return Frame(sdf, frame._index_names)


def interpolate(frame, method: str = "linear", subset=None, partition_by: list[str] | None = None,
                on: str | None = None):
    """Linear interpolation between valid observations; trailing NaNs
    clamp to the last valid value, leading NaNs stay (np.interp /
    pandas default semantics). ``method='linear'`` ignores the index
    spacing (positional); ``method='time'`` weights by the timestamp
    column ``on`` (``interpolate_1d``, ``core/missing.py:111``)."""
    from ..frame import Frame
    from ..functions.dtypes import is_numeric

    if method not in ("linear", "time"):
        raise NotImplementedError(f"interpolate method={method!r} (scipy family → map_batches)")
    if method == "time" and on is None:
        raise ValueError("interpolate(method='time') needs on=<timestamp column>")
    part = partition_by or []
    dtypes = frame.dtypes
    cols = subset or [c for c in frame.columns if is_numeric(dtypes[c])]
    cols = [cols] if isinstance(cols, str) else list(cols)
    sdf = frame._sdf
    wp = W.partitionBy(*part).orderBy(I.ORDER_COL).rowsBetween(W.unboundedPreceding, W.currentRow)
    wf = W.partitionBy(*part).orderBy(I.ORDER_COL).rowsBetween(W.currentRow, W.unboundedFollowing)
    if method == "time":
        pos = F.unix_micros(F.col(on).cast("timestamp")).cast("double")
    else:
        pos = F.row_number().over(W.partitionBy(*part).orderBy(I.ORDER_COL)).cast("double")
    sdf = sdf.withColumn("__rn__", pos)
    for c in cols:
        col = F.col(c)
        prev_v = F.last(col, ignorenulls=True).over(wp)
        prev_p = F.last(F.when(col.isNotNull(), F.col("__rn__")), ignorenulls=True).over(wp)
        next_v = F.first(col, ignorenulls=True).over(wf)
        next_p = F.first(F.when(col.isNotNull(), F.col("__rn__")), ignorenulls=True).over(wf)
        frac = (F.col("__rn__") - prev_p).cast("double") / (next_p - prev_p).cast("double")
        interp = prev_v + (next_v - prev_v) * frac
        sdf = sdf.withColumn(
            c,
            F.when(col.isNotNull(), col)
            .when(prev_v.isNull(), F.lit(None))
            .when(next_v.isNull(), prev_v)
            .otherwise(interp),
        )
    return Frame(sdf.drop("__rn__"), frame._index_names)


def replace(frame, to_replace, value=None, subset=None, regex: bool = False):
    """``generic.py:6098`` — when-chains / regexp_replace (JVM-side)."""
    from ..frame import Frame

    cols = subset or frame.columns
    cols = [cols] if isinstance(cols, str) else list(cols)
    mapping = to_replace if isinstance(to_replace, dict) else {to_replace: value}
    dtypes = frame.dtypes
    sdf = frame._sdf
    for c in cols:
        col = F.col(c)
        if regex:
            expr = col
            for pat, rep in mapping.items():
                expr = F.regexp_replace(expr, pat, rep)
            sdf = sdf.withColumn(c, expr)
        else:
            expr = col
            for old, new in mapping.items():
                if isinstance(old, str) and dtypes[c] != "string":
                    continue
                if isinstance(old, (int, float)) and not isinstance(old, bool) and dtypes[c] == "string":
                    continue
                expr = F.when(col == F.lit(old), F.lit(new)).otherwise(expr)
            sdf = sdf.withColumn(c, expr)
    return Frame(sdf, frame._index_names)
