"""Joins, filters, set ops, dedup, top-k, query/eval front end."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, query


@query(
    "filter_isin_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R') AND l_quantity > 45
    """,
)
def filter_isin_project(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    f = li[li["l_returnflag"].isin(["A", "R"]) & (li["l_quantity"] > 45)]
    return f[["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"]].to_spark()


@query(
    "query_string_frontend",
    oracle="""
    SELECT l_orderkey, l_quantity, l_discount
    FROM lineitem
    WHERE l_quantity > 40 AND l_returnflag = 'A' AND l_discount <= 0.05
       OR NOT (l_linestatus = 'O') AND l_quantity < 3
    """,
)
def query_string_frontend(spark, sf_dir):
    """pandas-dialect string → Spark SQL (SURVEY §3.1)."""
    li = load(spark, sf_dir, "lineitem")
    f = li.query(
        "l_quantity > 40 and l_returnflag == 'A' and l_discount <= @dmax"
        " or not (l_linestatus == 'O') and l_quantity < @qmin",
        dmax=0.05, qmin=3)
    return f[["l_orderkey", "l_quantity", "l_discount"]].to_spark()


@query(
    "eval_assign_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS DOUBLE) AS net,
           FLOOR(l_quantity / 7) AS q_div,
           ((CAST(l_quantity - 25 AS BIGINT) % 7) + 7) % 7 AS q_mod,
           ROUND(POWER(l_discount, 2), 9) AS disc_sq
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def eval_assign_arithmetic(spark, sf_dir):
    """eval() assignments + Python-sign floordiv/mod semantics."""
    li = load(spark, sf_dir, "lineitem")
    f = li[li["l_linenumber"] == 1]
    f = f.eval("net = l_extendedprice * (1 - l_discount)")
    # Decimal-route the money product: bit-identical across engines
    # (the round-1 driver hash-flaked on the raw double; cf. q1 discipline).
    f = f.assign(net=f["net"].astype("decimal(18,6)").astype("float64"))
    f = f.assign(
        q_div=f["l_quantity"].floordiv_py(7),
        q_mod=(f["l_quantity"] - 25).astype("int64").mod_py(7),
        disc_sq=(f["l_discount"] ** 2).round(9),
    )
    return f[["l_orderkey", "l_linenumber", "net", "q_div", "q_mod", "disc_sq"]].to_spark()


@query(
    "merge_inner_multikey",
    oracle="""
    SELECT o_orderkey, o_totalprice, l_linenumber, l_quantity
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F' AND l_linenumber <= 2
    """,
)
def merge_inner_multikey(spark, sf_dir):
    od = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    j = od[od["o_orderstatus"] == "F"].merge(
        li[li["l_linenumber"] <= 2], left_on="o_orderkey", right_on="l_orderkey")
    return j[["o_orderkey", "o_totalprice", "l_linenumber", "l_quantity"]].to_spark()


@query(
    "merge_left_nulls",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, agg.n_items, agg.total_qty
    FROM orders o LEFT JOIN (
        SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
        FROM lineitem WHERE l_quantity > 49 GROUP BY l_orderkey) agg
    ON o.o_orderkey = agg.l_orderkey
    """,
)
def merge_left_nulls(spark, sf_dir):
    od = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    li = li[li["l_quantity"] > 49]
    li = li.assign(qty_d=li["l_quantity"].astype("decimal(18,6)"))
    agg = li.groupby("l_orderkey", as_index=False).agg(
        n_items=("l_orderkey", "count"), total_qty=("qty_d", "sum"))
    agg = agg.assign(total_qty=lambda x: x["total_qty"].astype("double"))
    j = od.merge(agg, left_on="o_orderkey", right_on="l_orderkey", how="left")
    return j[["o_orderkey", "o_totalprice", "n_items", "total_qty"]].to_spark()


@query(
    "merge_outer_indicator",
    oracle="""
    WITH j AS (
      SELECT o_orderkey, l_orderkey,
             CASE WHEN o_orderkey IS NOT NULL AND l_orderkey IS NOT NULL THEN 'both'
                  WHEN o_orderkey IS NOT NULL THEN 'left_only' ELSE 'right_only' END AS _merge
      FROM (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000) o
      FULL OUTER JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
      ON o.o_orderkey = l.l_orderkey)
    SELECT _merge, CAST(COUNT(*) AS BIGINT) AS n FROM j GROUP BY _merge ORDER BY _merge
    """,
)
def merge_outer_indicator(spark, sf_dir):
    od = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    left = od[od["o_totalprice"] > 300000][["o_orderkey"]]
    right = li[["l_orderkey"]].drop_duplicates()
    j = left.merge(right, left_on="o_orderkey", right_on="l_orderkey", how="outer", indicator=True)
    g = j.groupby("_merge", as_index=False).agg(n=("_merge", "count"))
    return g.sort_values("_merge").to_spark()


@query(
    "join_semi_anti",
    oracle="""
    SELECT 'no_items' AS bucket, CAST(COUNT(*) AS BIGINT) AS n FROM orders
      WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
    UNION ALL
    SELECT 'has_items' AS bucket, CAST(COUNT(*) AS BIGINT) AS n FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
    ORDER BY bucket
    """,
)
def join_semi_anti(spark, sf_dir):
    import go_pandas_spark as gp

    od = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    anti = od.merge(li, left_on="o_orderkey", right_on="l_orderkey", how="left_anti")
    semi = od.merge(li, left_on="o_orderkey", right_on="l_orderkey", how="left_semi")
    a = anti.assign(bucket="no_items").groupby("bucket", as_index=False).agg(n=("o_orderkey", "count"))
    s = semi.assign(bucket="has_items").groupby("bucket", as_index=False).agg(n=("o_orderkey", "count"))
    return gp.concat([a, s]).sort_values("bucket").to_spark()


@query(
    "cross_join_small",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2 WHERE r1.r_name <> r2.r_name
    """,
)
def cross_join_small(spark, sf_dir):
    re = load(spark, sf_dir, "region")
    l = re[["r_name"]].rename({"r_name": "from_region"})
    r = re[["r_name"]].rename({"r_name": "to_region"})
    j = l.merge(r, how="cross")
    return j[j["from_region"] != j["to_region"]].to_spark()


@query(
    "combine_first_coalesce",
    oracle="""
    SELECT c_custkey,
           COALESCE(a.bal, b.bal) AS bal
    FROM (SELECT c_custkey, CASE WHEN c_acctbal > 5000 THEN ROUND(c_acctbal,2) END AS bal FROM customer) a
    FULL OUTER JOIN (SELECT c_custkey AS ck2, -1.0 AS bal FROM customer) b ON a.c_custkey = b.ck2
    """,
)
def combine_first_coalesce(spark, sf_dir):
    import go_pandas_spark as gp

    cu = load(spark, sf_dir, "customer")
    a = cu.assign(bal=cu["c_acctbal"].round(2).where(cu["c_acctbal"] > 5000))[
        ["c_custkey", "bal"]].set_index("c_custkey")
    b = cu.assign(bal=-1.0)[["c_custkey", "bal"]].set_index("c_custkey")
    out = gp.combine_first(a, b).reset_index()
    return out.to_spark()


@query(
    "concat_union_dedup",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 8000)
    """,
)
def concat_union_dedup(spark, sf_dir):
    import go_pandas_spark as gp

    cu = load(spark, sf_dir, "customer")
    a = cu[cu["c_mktsegment"] == "BUILDING"][["c_custkey", "c_mktsegment"]]
    b = cu[cu["c_acctbal"] > 8000][["c_custkey", "c_mktsegment"]]
    return gp.concat([a, b]).drop_duplicates().to_spark()


@query(
    "set_ops_index",
    oracle="""
    SELECT 'intersection' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    UNION ALL
    SELECT 'difference' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    UNION ALL
    SELECT 'union' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      UNION SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    ORDER BY op
    """,
)
def set_ops_index(spark, sf_dir):
    """Index.union/intersection/difference (SURVEY §2.7) → Spark set ops."""
    od = load(spark, sf_dir, "orders")
    f = od[od["o_orderstatus"] == "F"][["o_custkey"]].to_spark().distinct()
    o = od[od["o_orderstatus"] == "O"][["o_custkey"]].to_spark().distinct()
    rows = [
        ("intersection", f.intersect(o)),
        ("difference", f.subtract(o)),
        ("union", f.union(o).distinct()),
    ]
    out = None
    for name, sdf in rows:
        one = sdf.agg(F.count(F.lit(1)).alias("n")).select(F.lit(name).alias("op"), "n")
        out = one if out is None else out.unionByName(one)
    return out.orderBy("op")


@query(
    "drop_duplicates_keep_first",
    oracle="""
    SELECT user_id, event_id, event_type FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
      FROM events) WHERE rn = 1
    """,
)
def drop_duplicates_keep_first(spark, sf_dir):
    """keep='first' under a defined order: sort by event_id, then the
    natural-order contract makes 'first' deterministic."""
    ev = load(spark, sf_dir, "events")
    s = ev.sort_values("event_id")
    d = s.drop_duplicates(subset=["user_id", "event_type"], keep="first")
    return d[["user_id", "event_id", "event_type"]].to_spark()


@query(
    "drop_duplicates_keep_last",
    oracle="""
    SELECT user_id, event_id, event_type FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) AS rn
      FROM events) WHERE rn = 1
    """,
)
def drop_duplicates_keep_last(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    s = ev.sort_values("event_id")
    d = s.drop_duplicates(subset=["user_id", "event_type"], keep="last")
    return d[["user_id", "event_id", "event_type"]].to_spark()


@query(
    "nlargest_orders",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)
def nlargest_orders(spark, sf_dir):
    od = load(spark, sf_dir, "orders").sort_values("o_orderkey")
    top = od.nlargest(15, "o_totalprice")
    top = top.assign(o_totalprice=top["o_totalprice"].round(2))
    return top[["o_orderkey", "o_totalprice"]].to_spark()


@query(
    "nsmallest_parts",
    oracle="""
    SELECT p_partkey, ROUND(p_retailprice, 2) AS p_retailprice
    FROM part ORDER BY p_retailprice ASC, p_partkey LIMIT 15
    """,
)
def nsmallest_parts(spark, sf_dir):
    pt = load(spark, sf_dir, "part").sort_values("p_partkey")
    bot = pt.nsmallest(15, "p_retailprice")
    bot = bot.assign(p_retailprice=bot["p_retailprice"].round(2))
    return bot[["p_partkey", "p_retailprice"]].to_spark()


@query(
    "where_mask_clip",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity > 25 THEN l_quantity ELSE -1 END AS q_where,
           CASE WHEN l_quantity > 25 THEN -1 ELSE l_quantity END AS q_mask,
           LEAST(GREATEST(l_quantity, 10), 40) AS q_clip,
           ABS(l_quantity - 25) AS q_abs
    FROM lineitem WHERE l_linenumber = 3
    """,
)
def where_mask_clip(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    f = li[li["l_linenumber"] == 3]
    q = f["l_quantity"]
    f = f.assign(
        q_where=q.where(q > 25, -1.0),
        q_mask=q.mask(q > 25, -1.0),
        q_clip=q.clip(10, 40),
        q_abs=(q - 25).abs(),
    )
    return f[["l_orderkey", "l_linenumber", "q_where", "q_mask", "q_clip", "q_abs"]].to_spark()


@query(
    "loc_label_slice",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders WHERE o_orderkey BETWEEN 1000 AND 2000
    """,
)
def loc_label_slice(spark, sf_dir):
    """.loc inclusive label slice + setter surface (indexing.py:1537):
    the slice compiles to a BETWEEN predicate Catalyst pushes to the
    scan — partition-prunable at rest."""
    od = load(spark, sf_dir, "orders")[
        ["o_orderkey", "o_totalprice", "o_orderstatus"]].set_index("o_orderkey")
    out = od.loc[1000:2000].reset_index()
    return out.to_spark()


@query(
    "iloc_step_slice",
    oracle="""
    WITH t AS (SELECT o_orderkey, o_totalprice,
                      ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rn
               FROM orders)
    SELECT o_orderkey, o_totalprice FROM t WHERE rn % 7 = 0
    """,
)
def iloc_step_slice(spark, sf_dir):
    """.iloc slice with step (indexing.py:1912): position arithmetic
    on the order contract, no driver-side row movement."""
    od = load(spark, sf_dir, "orders")[
        ["o_orderkey", "o_totalprice"]].sort_values("o_orderkey")
    return od.iloc[::7].to_spark()
