"""Reshape operators: pivot / pivot_table / crosstab / melt / stack /
unstack / get_dummies / cut / qcut.

Reference parity: ``pandas/core/reshape/pivot.py:25 pivot_table``,
``:371 pivot``, ``:393 crosstab``; ``reshape.py:446,362 stack/
unstack``; ``melt.py:25``; ``reshape.py:686 get_dummies``;
``tile.py:23,237 cut/qcut``.

Spark mapping: unstack/pivot → ``groupBy().pivot()``, melt/stack →
the SQL ``stack()`` table generator, get_dummies → when-projections
over the (driver-collected, small-by-definition) category set,
cut → when-chains, qcut → percentile breaks then bin.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .. import _internal as I
from ..frame import Frame


def melt(frame, id_vars=None, value_vars=None, var_name: str = "variable", value_name: str = "value") -> Frame:
    id_vars = [id_vars] if isinstance(id_vars, str) else list(id_vars or [])
    value_vars = [value_vars] if isinstance(value_vars, str) else list(
        value_vars or [c for c in frame.columns if c not in id_vars])
    # stack() needs one common value type: mixed numerics melt to
    # double (pandas: float64), anything else to string (pandas:
    # object) — fuzz-caught on (double, bigint) value columns
    from ..functions.dtypes import is_numeric

    dtypes = frame.dtypes
    vts = {dtypes[c] for c in value_vars}
    if len(vts) > 1:
        target = "double" if all(is_numeric(t) for t in vts) else "string"
        pairs = ", ".join(f"'{c}', CAST(`{c}` AS {target})" for c in value_vars)
    else:
        pairs = ", ".join(f"'{c}', `{c}`" for c in value_vars)
    stack_expr = f"stack({len(value_vars)}, {pairs}) as (`{var_name}`, `{value_name}`)"
    sdf = frame._sdf.selectExpr(*[f"`{c}`" for c in id_vars], stack_expr)
    return Frame(sdf)


def pivot(frame, index: str, columns: str, values: str, check_duplicates: bool = True) -> Frame:
    """``pivot.py:371`` — no aggregation; errors on duplicate
    (index, columns) pairs like pandas."""
    sdf = frame._sdf
    if check_duplicates:
        dups = sdf.groupBy(index, columns).count().filter(F.col("count") > 1).limit(1)
        if dups.count() > 0:
            raise ValueError("Index contains duplicate entries, cannot reshape")
    out = sdf.groupBy(index).pivot(columns).agg(F.first(values))
    return Frame(out).set_index(index)


def _first_in_order(c: Column) -> Column:
    # pandas first/last = first/last IN FRAME ORDER; aggregate first()
    # is order-undefined after a shuffle (see operators/aggregates.py)
    from .. import _internal as I

    return F.min_by(c, F.when(c.isNotNull(), F.col(I.ORDER_COL)))


def _last_in_order(c: Column) -> Column:
    from .. import _internal as I

    return F.max_by(c, F.when(c.isNotNull(), F.col(I.ORDER_COL)))


_PIVOT_AGGS = {
    # sum carries the pandas min_count=0 neutral: a cell whose rows are
    # ALL null sums to 0.0, while a cell with NO rows stays NULL —
    # Spark's pivot only evaluates the agg for combinations present in
    # the data, so the coalesce applies exactly to the former
    # (fuzz-caught, pivot_table_rand seed 2020348)
    "mean": F.avg, "sum": lambda c: F.coalesce(F.sum(c), F.lit(0.0)),
    "count": F.count, "min": F.min, "max": F.max,
    "first": _first_in_order, "last": _last_in_order,
    "median": lambda c: F.percentile(c, F.lit(0.5)), "std": F.stddev_samp, "var": F.var_samp,
    "nunique": F.countDistinct,
}


def pivot_table(frame, values=None, index=None, columns=None, aggfunc="mean",
                fill_value=None, margins: bool = False, margins_name: str = "All",
                dropna: bool = True) -> Frame:
    """``pivot.py:25``. ``margins=True`` = a one-level rollup: computed
    as a union of (grouped pivot) + (grand pivot row), plus a row-total
    column — each a Catalyst aggregation over the same scan.
    ``dropna=True`` (pandas default): rows with a null index/columns
    key are excluded (pandas groupby drops NaN keys)."""
    index = [index] if isinstance(index, str) else list(index or [])
    if dropna:
        key_cols = index + ([columns] if isinstance(columns, str)
                            else list(columns or []))
        if key_cols:
            frame = Frame(frame._sdf.dropna(subset=key_cols),
                          frame._index_names)
    if isinstance(values, (list, tuple)) and len(values) > 1:
        # multi-values → MultiIndex columns (value, category)
        if columns is None:
            raise ValueError("multiple values need columns=")
        aggs = [(_PIVOT_AGGS[aggfunc](F.col(v)) if isinstance(aggfunc, str)
                 else aggfunc(F.col(v))).alias(v) for v in values]
        out = frame._sdf.groupBy(*index).pivot(columns).agg(*aggs)
        if margins:
            # per-value (v, All) columns + one All row, every margin
            # recomputed from raw rows (correct for non-additive aggs
            # too) — three Catalyst aggregations over the same scan.
            sdf = frame._sdf

            def vagg(v):
                return (_PIVOT_AGGS[aggfunc](F.col(v)) if isinstance(aggfunc, str)
                        else aggfunc(F.col(v)))

            # name margin cols "{All}_{value}" — the exact shape Spark
            # gives pivoted multi-agg columns, so _relabel_pivoted
            # attaches the (value, All) label for free
            tots = [vagg(v).alias(f"{margins_name}_{v}") for v in values]
            for ix in index:
                out = out.withColumn(ix, F.col(ix).cast("string"))
            totals = sdf.groupBy(*index).agg(*tots)
            for ix in index:
                totals = totals.withColumn(ix, F.col(ix).cast("string"))
            out = out.join(totals, index, "left")
            grand = (sdf.groupBy().pivot(columns).agg(*aggs)
                     .crossJoin(sdf.groupBy().agg(*tots)))
            for ix in index:
                grand = grand.withColumn(ix, F.lit(margins_name))
            out = out.unionByName(grand, allowMissingColumns=True)
        res = _relabel_pivoted(out, index, list(values))
        if margins:
            # pandas column order: value-major, All last per value
            labels = dict(res._col_labels or {})
            sel = list(index)
            ordered_labels: dict[str, tuple] = {}
            for v in values:
                cats = [p for p, lab in labels.items()
                        if lab[0] == v and lab[1] != margins_name]
                for p in cats + [f"{v}__{margins_name}"]:
                    sel.append(p)
                    ordered_labels[p] = labels[p]
            # pandas row order: index ascending, All row last
            order = ([F.when(F.col(ix) == margins_name, 1).otherwise(0).asc()
                      for ix in index] + [F.col(ix).asc() for ix in index])
            res = Frame(res._sdf.select(*sel).orderBy(*order),
                        col_labels=ordered_labels)
        if fill_value is not None:
            vc = [c for c in res.columns if c not in index]
            res = Frame(res._sdf.fillna(fill_value, subset=vc), res._index_names,
                        res._col_labels)
        return res.set_index(index) if index else res
    values = values if isinstance(values, str) else (values[0] if values else None)
    if values is None:
        raise ValueError("pivot_table needs values=")
    agg = _PIVOT_AGGS[aggfunc](F.col(values)) if isinstance(aggfunc, str) else aggfunc(F.col(values))
    sdf = frame._sdf
    if columns is None:
        out = sdf.groupBy(*index).agg(agg.alias(values))
    else:
        out = sdf.groupBy(*index).pivot(columns).agg(agg)
    if margins:
        # the 'All' label forces the index columns to string (pandas
        # produces object dtype for the same reason)
        for ix in index:
            out = out.withColumn(ix, F.col(ix).cast("string"))
        pivot_cols = [c for c in out.columns if c not in index and not I.is_internal(c)]
        row_total = _PIVOT_AGGS[aggfunc](F.col(values))
        if aggfunc in ("mean", "median", "std", "var"):
            # margins for non-additive aggs recompute from raw rows
            totals = sdf.groupBy(*index).agg(row_total.alias(margins_name))
            out = out.join(totals, index, "left")
            grand = sdf.groupBy().pivot(columns).agg(agg) if columns else sdf.groupBy().agg(agg.alias(values))
            grand_all = sdf.groupBy().agg(row_total.alias(margins_name))
            grand = grand.crossJoin(grand_all)
        else:
            totals = sdf.groupBy(*index).agg(row_total.alias(margins_name))
            out = out.join(totals, index, "left")
            grand = (sdf.groupBy().pivot(columns).agg(agg) if columns else sdf.groupBy().agg(agg.alias(values)))
            grand = grand.crossJoin(sdf.groupBy().agg(row_total.alias(margins_name)))
        for ix in index:
            grand = grand.withColumn(ix, F.lit(margins_name).cast(dict(out.dtypes)[ix]))
        out = out.unionByName(grand, allowMissingColumns=True)
    if fill_value is not None:
        value_cols = [c for c in out.columns if c not in index]
        out = out.fillna(fill_value, subset=value_cols)
    res = Frame(out)
    return res.set_index(index) if index else res


def crosstab(frame, index: str, columns: str, normalize=False) -> Frame:
    """``pivot.py:393`` — pivot on count (+ optional normalization).
    Null index/columns keys are excluded (pandas groupby semantics)."""
    sdf = frame._sdf.dropna(subset=[index, columns])
    out = sdf.groupBy(index).pivot(columns).agg(F.count(F.lit(1))).na.fill(0)
    val_cols = [c for c in out.columns if c != index]
    if normalize is True or normalize == "all":
        total = sdf.count()
        for c in val_cols:
            out = out.withColumn(c, F.col(c) / F.lit(total))
    elif normalize == "index":
        # materialize the row total BEFORE dividing — in-place column
        # replacement would corrupt later columns' denominators
        out = out.withColumn("__tot__", sum(F.col(c) for c in val_cols).cast("double"))
        for c in val_cols:
            out = out.withColumn(c, F.col(c) / F.col("__tot__"))
        out = out.drop("__tot__")
    elif normalize == "columns":
        # column totals in one extra agg
        tot = out.agg(*[F.sum(c).alias(c) for c in val_cols]).first().asDict()
        for c in val_cols:
            out = out.withColumn(c, F.col(c) / F.lit(tot[c]))
    return Frame(out).set_index(index)


def stack(frame, id_vars: list[str] | None = None) -> Frame:
    """``reshape.py:446`` analog for flat columns: wide → long.
    Mixed value dtypes unify first (all-numeric → double, else string)
    — Spark's stack() requires homogeneous value columns where pandas
    upcasts to object/float."""
    from ..functions.dtypes import is_numeric

    ids = id_vars or []
    vals = [c for c in frame.columns if c not in ids]
    dts = {c: dt for c, dt in frame.dtypes.items() if c in vals}
    if len(set(dts.values())) > 1:
        target = "double" if all(is_numeric(dt) for dt in dts.values()) else "string"
        frame = frame.assign(**{c: frame[c].astype(target) for c in vals})
    return melt(frame, id_vars=ids, var_name="level_1", value_name="value")


def unstack(frame, level_col: str, value_col, index: str) -> Frame:
    """``reshape.py:362`` analog: long → wide (= pivot with first).
    A LIST of value columns produces MultiIndex columns
    ``(value, level)`` — the ``_Unstacker`` multi-level path."""
    if isinstance(value_col, (list, tuple)) and not isinstance(value_col, str):
        sdf = frame._sdf
        aggs = [_first_in_order(F.col(v)).alias(v) for v in value_col]
        out = sdf.groupBy(index).pivot(level_col).agg(*aggs)
        return _relabel_pivoted(out, [index], list(value_col)).set_index(index)
    return pivot(frame, index=index, columns=level_col, values=value_col, check_duplicates=False)


def _relabel_pivoted(out, index_cols: list[str], values: list[str]) -> Frame:
    """Spark names multi-agg pivot output ``{category}_{value}``;
    rename to stable physical names ``{value}__{category}`` and attach
    ``(value, category)`` MultiIndex labels. Column order is VALUE-
    major (all categories of values[0] first), matching pandas
    unstack/pivot_table (``reshape.py:362`` _Unstacker emits the value
    level outermost) — Spark's pivot emits category-major."""
    labels: dict[str, tuple] = {}
    sel = [F.col(c) for c in index_cols]
    data: list[tuple[int, int, "F.Column"]] = []  # (value pos, src pos, expr)
    for pos, c in enumerate(out.columns):
        if c in index_cols or I.is_internal(c):
            continue
        v = next((v for v in sorted(values, key=len, reverse=True)
                  if c.endswith("_" + v)), None)
        if v is None:  # single-agg pivot keeps bare category names
            data.append((0, pos, F.col(c)))
            continue
        cat = c[: -(len(v) + 1)]
        phys = f"{v}__{cat}"
        labels[phys] = (v, cat)
        data.append((values.index(v), pos, F.col(c).alias(phys)))
    # within a value, keep Spark's own category order (pivot emits
    # categories type-aware sorted — a string re-sort would scramble
    # numeric categories: '1','10','2',...), so sort by source position
    data.sort(key=lambda t: (t[0], t[1]))
    sel += [e for _, _, e in data]
    return Frame(out.select(*sel), col_labels=labels or None)


def stack_multi(frame, var_name: str = "level_1") -> Frame:
    """Inverse of the multi-level ``unstack``: moves the INNERMOST
    column level back into rows (``reshape.py:446`` with a column
    MultiIndex). One ``stack()`` generator expression — a single
    projection, no shuffle."""
    labels = frame._col_labels
    if not labels:
        raise ValueError("stack_multi needs MultiIndex columns (see stack())")
    if len(set(labels.values())) != len(labels):
        # the rev map below would silently drop all but one occurrence
        raise ValueError("stack_multi on duplicate column labels is "
                         "ambiguous — drop or rename duplicates first")
    lvl0: list[str] = []
    suffixes: list[str] = []
    for t in frame.column_labels:
        if isinstance(t, tuple):
            if t[0] not in lvl0:
                lvl0.append(t[0])
            if t[1] not in suffixes:
                suffixes.append(t[1])
    rev = {lab: phys for phys, lab in labels.items()}
    id_vars = [c for c in frame.columns if c not in labels]
    rows = []
    for s in suffixes:
        cols = ", ".join(
            f"`{rev[(v, s)]}`" if (v, s) in rev else "NULL" for v in lvl0)
        rows.append(f"'{s}', {cols}")
    names = ", ".join(f"`{v}`" for v in lvl0)
    expr = f"stack({len(suffixes)}, {', '.join(rows)}) as (`{var_name}`, {names})"
    sdf = frame._sdf.selectExpr(*[f"`{c}`" for c in id_vars], expr)
    return Frame(sdf)


def wide_to_long(frame, stubnames: list[str], i: list[str] | str, j: str, sep: str = "") -> Frame:
    """``melt.py:181`` — columns like ``price2020, price2021`` → long
    rows (stub value + suffix column). Suffixes are parsed from the
    schema on the driver; the reshape itself is one ``stack`` expression."""
    i = [i] if isinstance(i, str) else list(i)
    suffixes: list[str] = []
    for c in frame.columns:
        for stub in stubnames:
            if c.startswith(stub + sep) and len(c) > len(stub + sep):
                sfx = c[len(stub + sep):]
                if sfx not in suffixes:
                    suffixes.append(sfx)
    rows = []
    for sfx in suffixes:
        cols = ", ".join(
            f"`{stub}{sep}{sfx}`" if f"{stub}{sep}{sfx}" in frame.columns else "NULL"
            for stub in stubnames)
        rows.append(f"'{sfx}', {cols}")
    names = ", ".join(f"`{s}`" for s in stubnames)
    expr = f"stack({len(suffixes)}, {', '.join(rows)}) as (`{j}`, {names})"
    sdf = frame._sdf.selectExpr(*[f"`{c}`" for c in i], expr)
    return Frame(sdf)


def get_dummies(frame, column: str | None = None, prefix: str | None = None,
                dummy_na: bool = False, drop_first: bool = False,
                columns: list[str] | None = None) -> Frame:
    """``reshape.py:686`` — the category set is collected to the driver
    (it is small by definition; a 100k-category dummy expansion is a
    modeling bug, not a data-scale problem) and becomes when-projections.
    ``columns=[...]`` (pandas primary form) expands each listed column;
    with neither argument, every string column expands (pandas object
    inference)."""
    if column is None:
        if columns is None:
            columns = [c for c, dt in frame.dtypes.items() if dt == "string"]
        out = frame
        for c in columns:
            out = get_dummies(out, c, dummy_na=dummy_na, drop_first=drop_first)
        return out
    prefix = prefix if prefix is not None else column
    cats = [r[0] for r in frame._sdf.select(column).distinct().collect() if r[0] is not None]
    cats = sorted(cats)
    if drop_first:
        cats = cats[1:]
    sdf = frame._sdf
    for cat in cats:
        # null keys get 0 in every dummy (pandas), not NULL — the SQL
        # three-valued `null == cat` must be coalesced
        sdf = sdf.withColumn(
            f"{prefix}_{cat}",
            F.coalesce((F.col(column) == F.lit(cat)).cast("int"), F.lit(0)))
    if dummy_na:
        sdf = sdf.withColumn(f"{prefix}_nan", F.col(column).isNull().cast("int"))
    return Frame(sdf.drop(column), frame._index_names)


def cut(scol, bins, labels: list | None = None, right: bool = True):
    """``tile.py:23`` — fixed-break binning as a when-chain (JVM-side).

    Accepts a Column or a Series (pandas ``pd.cut(s, bins)`` form);
    ``bins`` is a break list or — Series form only — an int count of
    equal-width bins (pandas ``_nbins_to_bins``: linspace over min/max
    with the outer edge pushed out by 0.1% of the range; ONE min/max
    job). Returns the bin label, the "(lo, hi]" interval string, or —
    with ``labels=False`` (pandas: integer codes) — the 0-based index.
    """
    from ..series import Series

    if isinstance(scol, Series):
        if isinstance(bins, int):
            row = scol._frame._sdf.agg(F.min(scol._scol).alias("mn"),
                                       F.max(scol._scol).alias("mx")).first()
            if row["mn"] is None:  # empty/all-null: edges are arbitrary
                row = {"mn": 0.0, "mx": 1.0}
            mn, mx = float(row["mn"]), float(row["mx"])
            if mn == mx:  # pandas widens a degenerate range by 0.1%
                mn -= 0.001 * abs(mn) if mn != 0 else 0.001
                mx += 0.001 * abs(mx) if mx != 0 else 0.001
                edges = [mn + (mx - mn) * i / bins for i in range(bins + 1)]
            else:
                edges = [mn + (mx - mn) * i / bins for i in range(bins + 1)]
                adj = (mx - mn) * 0.001
                if right:
                    edges[0] -= adj
                else:
                    edges[-1] += adj
            bins = edges
        return scol._with_scol(cut(scol._scol, bins, labels=labels, right=right))
    if isinstance(bins, int):
        raise TypeError("cut(Column, int): equal-width bins need a Series "
                        "(the edge computation requires the owning frame)")
    codes = labels is False
    expr = F.lit(None).cast("int" if codes else "string")
    for i in range(len(bins) - 1):
        lo, hi = bins[i], bins[i + 1]
        if right:
            cond = (scol > F.lit(lo)) & (scol <= F.lit(hi))
        else:
            cond = (scol >= F.lit(lo)) & (scol < F.lit(hi))
        if codes:
            label = i
        else:
            label = labels[i] if labels else (f"({lo}, {hi}]" if right else f"[{lo}, {hi})")
        expr = F.when(cond, F.lit(label)).otherwise(expr)
    return expr


def _dedup_breaks(breaks: list, labels, duplicates: str) -> list:
    uniq = sorted(set(breaks))
    if len(uniq) < len(breaks):
        if duplicates == "raise":
            raise ValueError(
                f"Bin edges must be unique: {breaks!r}. "
                "You can drop duplicate edges with duplicates='drop'")
        if duplicates != "drop":
            raise ValueError("duplicates must be 'raise' or 'drop'")
        breaks = uniq
        if labels not in (None, False) and len(labels) != len(breaks) - 1:
            raise ValueError("labels length must match the number of deduplicated bins")
    return breaks


def qcut(frame, column=None, q: int | None = None, labels: list | None = None,
         duplicates: str = "raise"):
    """``tile.py:237`` — exact percentile breaks (matches pandas), then
    bin. ``duplicates='drop'`` collapses repeated quantile edges (heavily
    skewed columns) exactly like pandas; ``'raise'`` mirrors the pandas
    ValueError. At 100 TB swap ``percentile`` → ``approx_percentile``.

    Two forms: ``qcut(frame, column, q)`` (engine-native, returns a
    Frame with a ``<column>_bin`` column) and the pandas form
    ``qcut(series, q)`` → Series of labels/codes."""
    from ..series import Series

    if isinstance(frame, Series):
        s, q = frame, column  # pandas positional form qcut(s, q, ...)
        probs = [i / q for i in range(q + 1)]
        row = s._frame._sdf.agg(
            F.percentile(s._scol, F.array(*[F.lit(p) for p in probs])).alias("b")).first()
        breaks = _dedup_breaks(list(row["b"]), labels, duplicates)
        nbins = len(breaks) - 1
        breaks[0] = breaks[0] - 1e-9
        lbls = False if labels is False else (labels or [f"q{i}" for i in range(nbins)])
        return s._with_scol(cut(s._scol, breaks, lbls, right=True))
    probs = [i / q for i in range(q + 1)]
    row = frame._sdf.agg(F.percentile(F.col(column), F.array(*[F.lit(p) for p in probs])).alias("b")).first()
    breaks = _dedup_breaks(list(row["b"]), labels, duplicates)
    nbins = len(breaks) - 1
    breaks[0] = breaks[0] - 1e-9  # pandas includes the min in the first bin
    # labels=False → 0-based bin codes (pandas tile.py:288)
    lbls = False if labels is False else (labels or [f"q{i}" for i in range(nbins)])
    sdf = frame._sdf.withColumn(f"{column}_bin", cut(F.col(column), breaks, lbls, right=True))
    return Frame(sdf, frame._index_names)
