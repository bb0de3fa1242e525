"""Reshape operators: pivot_table / crosstab / melt / get_dummies /
cut / qcut (§2.8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, query

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_table_mean",
    oracle="""
    SELECT user_id,
           ROUND(AVG(value) FILTER (event_type = 'click'), 6) AS click,
           ROUND(AVG(value) FILTER (event_type = 'error'), 6) AS error,
           ROUND(AVG(value) FILTER (event_type = 'purchase'), 6) AS purchase,
           ROUND(AVG(value) FILTER (event_type = 'signup'), 6) AS signup,
           ROUND(AVG(value) FILTER (event_type = 'view'), 6) AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def pivot_table_mean(spark, sf_dir):
    import go_pandas_spark as gp

    ev = load(spark, sf_dir, "events")
    pt = gp.pivot_table(ev, values="value", index="user_id", columns="event_type",
                        aggfunc="mean").reset_index()
    for c in EVENT_TYPES:
        pt = pt.assign(**{c: pt[c].round(6)})
    return pt.sort_values("user_id").to_spark()


@query(
    "pivot_table_margins",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (event_type = 'click') AS DOUBLE) AS click,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (event_type = 'purchase') AS DOUBLE) AS purchase,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS "All"
    FROM events WHERE event_type IN ('click', 'purchase') GROUP BY user_id
    UNION ALL
    SELECT 'All',
           CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (event_type = 'click') AS DOUBLE),
           CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (event_type = 'purchase') AS DOUBLE),
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
    FROM events WHERE event_type IN ('click', 'purchase')
    """,
)
def pivot_table_margins(spark, sf_dir):
    """pivot_table(margins=True) — the reference's only grouping-sets
    analog (``pivot.py:25``; SURVEY §2.4 margins ≈ rollup)."""
    import go_pandas_spark as gp

    ev = load(spark, sf_dir, "events")
    ev = ev[ev["event_type"].isin(["click", "purchase"])]
    ev = ev.assign(value=ev["value"].astype("decimal(18,6)"))
    pt = gp.pivot_table(ev, values="value", index="user_id", columns="event_type",
                        aggfunc="sum", margins=True).reset_index()
    pt = pt.assign(user_id=pt["user_id"].astype("string"),
                   click=pt["click"].astype("double"),
                   purchase=pt["purchase"].astype("double"),
                   All=pt["All"].astype("double"))
    return pt.to_spark()


@query(
    "crosstab_counts",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
           CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
           CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
           CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def crosstab_counts(spark, sf_dir):
    import go_pandas_spark as gp

    ev = load(spark, sf_dir, "events")
    ct = gp.crosstab(ev, "user_id", "event_type").reset_index()
    return ct.sort_values("user_id").to_spark()


@query(
    "melt_wide_to_long",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def melt_wide_to_long(spark, sf_dir):
    import go_pandas_spark as gp

    li = load(spark, sf_dir, "lineitem")
    m = gp.melt(li, id_vars=["l_orderkey", "l_linenumber"],
                value_vars=["l_quantity", "l_discount", "l_tax"])
    return m.to_spark()


@query(
    "get_dummies_onehot",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS et_click,
           CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS et_error,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS et_purchase,
           CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS et_signup,
           CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS et_view
    FROM events
    """,
)
def get_dummies_onehot(spark, sf_dir):
    import go_pandas_spark as gp

    ev = load(spark, sf_dir, "events")
    d = gp.get_dummies(ev[["event_id", "event_type"]], "event_type", prefix="et")
    return d.to_spark()


@query(
    "cut_fixed_bins",
    oracle="""
    SELECT CASE WHEN l_quantity > 0  AND l_quantity <= 10 THEN 'low'
                WHEN l_quantity > 10 AND l_quantity <= 25 THEN 'mid'
                WHEN l_quantity > 25 AND l_quantity <= 40 THEN 'high'
                WHEN l_quantity > 40 AND l_quantity <= 100 THEN 'max' END AS qty_bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(l_extendedprice), 6) AS avg_price
    FROM lineitem GROUP BY qty_bin ORDER BY qty_bin
    """,
)
def cut_fixed_bins(spark, sf_dir):
    import go_pandas_spark as gp

    li = load(spark, sf_dir, "lineitem")
    b = li.assign(qty_bin=gp.cut(li["l_quantity"]._scol, [0, 10, 25, 40, 100],
                                 labels=["low", "mid", "high", "max"]))
    g = b.groupby("qty_bin", as_index=False).agg(n=("l_orderkey", "count"),
                                                 avg_price=("l_extendedprice", "mean"))
    g = g.assign(avg_price=lambda x: x["avg_price"].round(6))
    return g.sort_values("qty_bin").to_spark()


@query(
    "qcut_quartiles",
    oracle="""
    WITH breaks AS (
      SELECT QUANTILE_CONT(o_totalprice, 0.00) - 1e-9 AS b0,
             QUANTILE_CONT(o_totalprice, 0.25) AS b1,
             QUANTILE_CONT(o_totalprice, 0.50) AS b2,
             QUANTILE_CONT(o_totalprice, 0.75) AS b3,
             QUANTILE_CONT(o_totalprice, 1.00) AS b4
      FROM orders)
    SELECT CASE WHEN o_totalprice > b0 AND o_totalprice <= b1 THEN 'q0'
                WHEN o_totalprice > b1 AND o_totalprice <= b2 THEN 'q1'
                WHEN o_totalprice > b2 AND o_totalprice <= b3 THEN 'q2'
                WHEN o_totalprice > b3 AND o_totalprice <= b4 THEN 'q3' END AS price_q,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders, breaks GROUP BY price_q ORDER BY price_q
    """,
)
def qcut_quartiles(spark, sf_dir):
    import go_pandas_spark as gp

    od = load(spark, sf_dir, "orders")
    b = gp.qcut(od, "o_totalprice", 4)
    g = b.rename({"o_totalprice_bin": "price_q"}).groupby("price_q", as_index=False).agg(
        n=("o_orderkey", "count"))
    return g.sort_values("price_q").to_spark()


@query(
    "unstack_long_to_wide",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) FILTER (c_mktsegment = 'BUILDING') AS BIGINT) AS "BUILDING",
           CAST(COUNT(*) FILTER (c_mktsegment = 'MACHINERY') AS BIGINT) AS "MACHINERY"
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    GROUP BY n_name ORDER BY n_name
    """,
)
def unstack_long_to_wide(spark, sf_dir):
    import go_pandas_spark as gp

    cu = load(spark, sf_dir, "customer")
    na = load(spark, sf_dir, "nation")
    j = cu[cu["c_mktsegment"].isin(["BUILDING", "MACHINERY"])].merge(
        na, left_on="c_nationkey", right_on="n_nationkey")
    long = j.groupby(["n_name", "c_mktsegment"], as_index=False).agg(n=("c_custkey", "count"))
    wide = gp.unstack(long, level_col="c_mktsegment", value_col="n", index="n_name").reset_index()
    wide = wide.fillna(0)
    wide = wide.assign(BUILDING=wide["BUILDING"].astype("int64"),
                       MACHINERY=wide["MACHINERY"].astype("int64"))
    return wide.sort_values("n_name").to_spark()


@query(
    "crosstab_normalized_index",
    oracle="""
    WITH c AS (
      SELECT user_id,
             COUNT(*) FILTER (event_type = 'click') AS click,
             COUNT(*) FILTER (event_type = 'error') AS error,
             COUNT(*) FILTER (event_type = 'purchase') AS purchase,
             COUNT(*) FILTER (event_type = 'signup') AS signup,
             COUNT(*) FILTER (event_type = 'view') AS view
      FROM events GROUP BY user_id)
    SELECT user_id,
           ROUND(click / CAST(click+error+purchase+signup+view AS DOUBLE), 6) AS click,
           ROUND(error / CAST(click+error+purchase+signup+view AS DOUBLE), 6) AS error,
           ROUND(purchase / CAST(click+error+purchase+signup+view AS DOUBLE), 6) AS purchase,
           ROUND(signup / CAST(click+error+purchase+signup+view AS DOUBLE), 6) AS signup,
           ROUND(view / CAST(click+error+purchase+signup+view AS DOUBLE), 6) AS view
    FROM c ORDER BY user_id
    """,
)
def crosstab_normalized_index(spark, sf_dir):
    """crosstab(normalize='index') — row-fraction variant."""
    import go_pandas_spark as gp

    ev = load(spark, sf_dir, "events")
    ct = gp.crosstab(ev, "user_id", "event_type", normalize="index").reset_index()
    for c in EVENT_TYPES:
        ct = ct.assign(**{c: ct[c].round(6)})
    return ct.sort_values("user_id").to_spark()


@query(
    "pivot_table_multi_values",
    oracle="""
    SELECT user_id,
           ROUND(AVG(value) FILTER (event_type = 'click'), 6)    AS value__click,
           ROUND(AVG(value) FILTER (event_type = 'purchase'), 6) AS value__purchase,
           ROUND(AVG(vlen) FILTER (event_type = 'click'), 6)     AS vlen__click,
           ROUND(AVG(vlen) FILTER (event_type = 'purchase'), 6)  AS vlen__purchase
    FROM (SELECT user_id, event_type, value, CAST(length(props) AS DOUBLE) AS vlen
          FROM events WHERE event_type IN ('click', 'purchase'))
    GROUP BY user_id ORDER BY user_id
    """,
)
def pivot_table_multi_values(spark, sf_dir):
    """pivot_table with a LIST of values → MultiIndex (value, category)
    columns (pivot.py:25 multi-value path; physical names stay flat as
    value__category — the oracle compares those)."""
    from ..operators.reshape import pivot_table

    ev = load(spark, sf_dir, "events")
    ev = ev[ev["event_type"].isin(["click", "purchase"])]
    ev = ev.assign(vlen=ev["props"].str.len().astype("double"))
    wide = pivot_table(ev, values=["value", "vlen"], index="user_id",
                       columns="event_type", aggfunc="mean")
    out = wide.reset_index()
    rounded = {c: out[c].round(6) for c in out.columns if c != "user_id"}
    return out.assign(**rounded).sort_values("user_id").to_spark()


@query(
    "unstack_row_multiindex",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (m = 1) AS DOUBLE) AS "1",
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (m = 2) AS DOUBLE) AS "2",
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (m = 3) AS DOUBLE) AS "3",
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (m = 4) AS DOUBLE) AS "4",
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (m = 5) AS DOUBLE) AS "5",
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) FILTER (m = 6) AS DOUBLE) AS "6"
    FROM (SELECT o_orderpriority, CAST(month(o_orderdate) AS INT) AS m, o_totalprice
          FROM orders WHERE year(o_orderdate) = 1995 AND month(o_orderdate) <= 6)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def unstack_row_multiindex(spark, sf_dir):
    """unstack(level=-1) from a 2-level (priority, month) row index —
    the _Unstacker path (reshape.py:446) over ROW MultiIndex: one
    pivot aggregation, remaining level stays the index."""
    od = load(spark, sf_dir, "orders")
    od = od[(od["o_orderdate"].dt.year == 1995) & (od["o_orderdate"].dt.month <= 6)]
    od = od.assign(m=od["o_orderdate"].dt.month,
                   dec=od["o_totalprice"].astype("decimal(18,6)"))
    long = od.groupby(["o_orderpriority", "m"], as_index=False).agg(total=("dec", "sum"))
    long = long.assign(total=long["total"].astype("double"))
    wide = long.set_index(["o_orderpriority", "m"]).unstack(-1)
    return wide.reset_index().to_spark()


@query(
    "sort_index_level_swaplevel",
    oracle="""
    SELECT m, o_orderpriority, CAST(n AS BIGINT) AS n
    FROM (SELECT o_orderpriority, CAST(month(o_orderdate) AS INT) AS m,
                 COUNT(*) AS n
          FROM orders WHERE year(o_orderdate) = 1995
          GROUP BY o_orderpriority, m)
    ORDER BY m, o_orderpriority
    """,
)
def sort_index_level_swaplevel(spark, sf_dir):
    """swaplevel on the ROW index + sort_index(level=0) (multi.py:122,
    generic.py:3361): pure column renames plus one range sort."""
    od = load(spark, sf_dir, "orders")
    od = od[od["o_orderdate"].dt.year == 1995]
    od = od.assign(m=od["o_orderdate"].dt.month)
    g = od.groupby(["o_orderpriority", "m"], as_index=False).agg(n=("o_orderkey", "count"))
    f = g.set_index(["o_orderpriority", "m"]).swaplevel(0, 1)
    f = f.sort_index(level=0)
    return f.reset_index().to_spark()
