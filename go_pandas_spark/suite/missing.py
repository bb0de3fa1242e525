"""Missing-data operators: fillna/ffill/bfill(+limit)/interpolate/
replace/dropna (§2.9 Missing-data).

The fixtures have no NULLs, so each query first masks values NULL
deterministically (value where event_type='error' → NULL), then
repairs them — exercising the real operators end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, query
from .windows import TS

_MASKED = f"""
    masked AS (
      SELECT event_id, user_id, {TS} AS uts,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events)
"""


def _masked_events(spark, sf_dir):
    ev = load(spark, sf_dir, "events").sort_values(["user_id", "ts", "event_id"])
    return ev.assign(v=ev["value"].mask(ev["event_type"] == "error"))


@query(
    "fillna_scalar_and_dict",
    oracle=f"""
    WITH {_MASKED}
    SELECT event_id, COALESCE(v, -1.0) AS v_scalar, COALESCE(v, 0.5) AS v_dict
    FROM masked
    """,
)
def fillna_scalar_and_dict(spark, sf_dir):
    ev = _masked_events(spark, sf_dir)
    out = ev.assign(v_scalar=ev["v"].fillna(-1.0))
    out = out.fillna(value={"v": 0.5})
    out = out.rename({"v": "v_dict"})
    return out[["event_id", "v_scalar", "v_dict"]].to_spark()


@query(
    "ffill_bfill_grouped",
    oracle=f"""
    WITH {_MASKED}
    SELECT event_id,
           last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY uts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS v_ffill,
           first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY uts, event_id
                                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_bfill
    FROM masked
    """,
)
def ffill_bfill_grouped(spark, sf_dir):
    ev = _masked_events(spark, sf_dir)
    g = ev.groupby("user_id")["v"]
    out = ev.assign(v_ffill=g.ffill(), v_bfill=g.bfill())
    return out[["event_id", "v_ffill", "v_bfill"]].to_spark()


@query(
    "ffill_with_limit",
    oracle=f"""
    WITH {_MASKED},
    r AS (
      SELECT event_id, user_id, uts, v,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY uts, event_id) AS rn
      FROM masked),
    w AS (
      SELECT event_id, v, rn,
             last_value(v IGNORE NULLS) OVER win AS filled,
             last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER win AS last_rn
      FROM r
      WINDOW win AS (PARTITION BY user_id ORDER BY uts, event_id ROWS UNBOUNDED PRECEDING))
    SELECT event_id,
           CASE WHEN v IS NOT NULL OR rn - last_rn <= 1 THEN filled END AS v_ffill1
    FROM w
    """,
)
def ffill_with_limit(spark, sf_dir):
    """limit=1: only the first NULL after a valid value is filled
    (count-since-last-valid guard, SURVEY §2.9)."""
    from ..operators.missing import fillna

    ev = _masked_events(spark, sf_dir)
    f = fillna(ev, method="ffill", subset=["v"], limit=1, partition_by=["user_id"])
    f = f.rename({"v": "v_ffill1"})
    return f[["event_id", "v_ffill1"]].to_spark()


@query(
    "interpolate_linear",
    oracle=f"""
    WITH {_MASKED},
    r AS (
      SELECT event_id, user_id, uts, v,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY uts, event_id) AS rn
      FROM masked),
    w AS (
      SELECT event_id, v, rn,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wp AS pp,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wf AS np
      FROM r
      WINDOW wp AS (PARTITION BY user_id ORDER BY uts, event_id ROWS UNBOUNDED PRECEDING),
             wf AS (PARTITION BY user_id ORDER BY uts, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_id,
           ROUND(CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NULL THEN NULL
                      WHEN nv IS NULL THEN pv
                      ELSE pv + (nv - pv) * (rn - pp) / CAST(np - pp AS DOUBLE) END, 6) AS v_interp
    FROM w
    """,
)
def interpolate_linear(spark, sf_dir):
    """Linear interpolation = prev/next value+position algebra over two
    windows (``core/missing.py:111`` → SURVEY §2.9)."""
    from ..operators.missing import interpolate

    ev = _masked_events(spark, sf_dir)
    f = interpolate(ev, subset=["v"], partition_by=["user_id"])
    f = f.assign(v_interp=f["v"].round(6))
    return f[["event_id", "v_interp"]].to_spark()


@query(
    "dropna_and_counts",
    oracle=f"""
    WITH {_MASKED}
    SELECT 'total' AS bucket, CAST(COUNT(*) AS BIGINT) AS n FROM masked
    UNION ALL SELECT 'kept', CAST(COUNT(*) AS BIGINT) FROM masked WHERE v IS NOT NULL
    UNION ALL SELECT 'isna', CAST(COUNT(*) AS BIGINT) FROM masked WHERE v IS NULL
    ORDER BY bucket
    """,
)
def dropna_and_counts(spark, sf_dir):
    import go_pandas_spark as gp

    ev = _masked_events(spark, sf_dir)
    total = ev.assign(bucket="total").groupby("bucket", as_index=False).agg(n=("event_id", "count"))
    kept = ev.dropna(subset=["v"]).assign(bucket="kept").groupby("bucket", as_index=False).agg(
        n=("event_id", "count"))
    na = ev[ev["v"].isna()].assign(bucket="isna").groupby("bucket", as_index=False).agg(
        n=("event_id", "count"))
    return gp.concat([total, kept, na]).sort_values("bucket").to_spark()


@query(
    "replace_values",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN 'failure'
                WHEN event_type = 'view' THEN 'impression'
                ELSE event_type END AS et_replaced,
           regexp_replace(event_type, '^(click|view)$', 'engagement', 'g') AS et_regex
    FROM events
    """,
)
def replace_values(spark, sf_dir):
    from ..operators.missing import replace

    ev = load(spark, sf_dir, "events")
    ev = ev.assign(et_replaced=ev["event_type"], et_regex=ev["event_type"])
    ev = replace(ev, {"error": "failure", "view": "impression"}, subset=["et_replaced"])
    ev = replace(ev, {"^(click|view)$": "engagement"}, subset=["et_regex"], regex=True)
    return ev[["event_id", "et_replaced", "et_regex"]].to_spark()


@query(
    "interpolate_time_weighted",
    oracle=f"""
    WITH {_MASKED},
    r AS (
      SELECT event_id, user_id, v, CAST(epoch_us(uts) AS DOUBLE) AS p, uts
      FROM masked),
    w AS (
      SELECT event_id, v, p,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN p END IGNORE NULLS) OVER wp AS pp,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN p END IGNORE NULLS) OVER wf AS np
      FROM r
      WINDOW wp AS (PARTITION BY user_id ORDER BY uts, event_id ROWS UNBOUNDED PRECEDING),
             wf AS (PARTITION BY user_id ORDER BY uts, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_id,
           ROUND(CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NULL THEN NULL
                      WHEN nv IS NULL THEN pv
                      ELSE pv + (nv - pv) * (p - pp) / (np - pp) END, 6) AS v_interp
    FROM w
    """,
)
def interpolate_time_weighted(spark, sf_dir):
    """interpolate(method='time'): weights from timestamp spacing, not
    row position."""
    from ..operators.missing import interpolate

    ev = _masked_events(spark, sf_dir)
    f = interpolate(ev, method="time", on="ts", subset=["v"], partition_by=["user_id"])
    f = f.assign(v_interp=f["v"].round(6))
    return f[["event_id", "v_interp"]].to_spark()


@query(
    "interpolate_limit_direction",
    oracle=f"""
    WITH {_MASKED},
    r AS (
      SELECT event_id, user_id, uts, v,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY uts, event_id) AS rn
      FROM masked),
    w AS (
      SELECT event_id, v, rn,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wp AS pp,
             first_value(v IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER wf AS np
      FROM r
      WINDOW wp AS (PARTITION BY user_id ORDER BY uts, event_id ROWS UNBOUNDED PRECEDING),
             wf AS (PARTITION BY user_id ORDER BY uts, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_id,
           ROUND(CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NOT NULL AND nv IS NOT NULL
                           AND (rn - pp <= 2 OR np - rn <= 2)
                      THEN pv + (nv - pv) * (rn - pp) / CAST(np - pp AS DOUBLE)
                      END, 6) AS v_both2
    FROM w
    """,
)
def interpolate_limit_direction(spark, sf_dir):
    """interpolate(limit_direction='both', limit_area='inside',
    limit=2): only interior NaNs within 2 rows of a valid neighbor on
    EITHER side get interpolated (reference ``generic.py:6438``
    preserve-set semantics) — same pure-window plan as plain linear."""
    from ..operators.missing import interpolate

    ev = _masked_events(spark, sf_dir)
    f = interpolate(ev, subset=["v"], partition_by=["user_id"], limit=2,
                    limit_direction="both", limit_area="inside")
    f = f.assign(v_both2=f["v"].round(6))
    return f[["event_id", "v_both2"]].to_spark()


@query(
    "ffill_global_limit",
    oracle=f"""
    WITH {_MASKED},
    r AS (SELECT event_id, v,
                 ROW_NUMBER() OVER (ORDER BY uts, event_id) AS rn
          FROM masked),
    p AS (
      SELECT event_id, v, rn,
             LAST_VALUE(v IGNORE NULLS) OVER w AS fv,
             MAX(CASE WHEN v IS NOT NULL THEN rn END) OVER w AS vrn
      FROM r
      WINDOW w AS (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT event_id,
           CASE WHEN v IS NOT NULL OR rn - vrn <= 2 THEN fv END AS v_ffill2
    FROM p
    """,
)
def ffill_global_limit(spark, sf_dir):
    """Whole-frame ffill with limit=2 — the r7 blocked plan (running
    pick + running count + picked row-number marker; no global window,
    operators/missing.py fillna ungrouped branch)."""
    from ..operators.missing import fillna

    ev = load(spark, sf_dir, "events").sort_values(["ts", "event_id"])
    ev = ev.assign(v=ev["value"].mask(ev["event_type"] == "error"))
    f = fillna(ev, method="ffill", subset=["v"], limit=2)
    f = f.rename({"v": "v_ffill2"})
    return f[["event_id", "v_ffill2"]].to_spark()


@query(
    "interpolate_global_linear",
    oracle=f"""
    WITH {_MASKED},
    r AS (SELECT event_id, v,
                 ROW_NUMBER() OVER (ORDER BY uts, event_id) AS rn
          FROM masked),
    p AS (
      SELECT event_id, v, rn,
             LAST_VALUE(v IGNORE NULLS) OVER wb AS pv,
             MAX(CASE WHEN v IS NOT NULL THEN rn END) OVER wb AS pp,
             FIRST_VALUE(v IGNORE NULLS) OVER wf AS nv,
             MIN(CASE WHEN v IS NOT NULL THEN rn END) OVER wf AS np
      FROM r
      WINDOW wb AS (ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (ORDER BY rn ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_id,
           ROUND(CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NOT NULL AND nv IS NOT NULL
                        THEN pv + (nv - pv) * (rn - pp) / (np - pp)
                      WHEN pv IS NOT NULL THEN pv END, 6) AS v_interp
    FROM p
    """,
)
def interpolate_global_linear(spark, sf_dir):
    """Whole-frame linear interpolation — the r7 blocked plan (two
    running-pick passes give prev/next value+position; forward default:
    leading NaNs stay, trailing clamp)."""
    from ..operators.missing import interpolate

    ev = load(spark, sf_dir, "events").sort_values(["ts", "event_id"])
    ev = ev.assign(v=ev["value"].mask(ev["event_type"] == "error"))
    f = interpolate(ev, subset=["v"])
    f = f.assign(v_interp=f["v"].round(6))
    return f[["event_id", "v_interp"]].to_spark()
