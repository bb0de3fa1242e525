"""TPC-H-shaped relational queries (adapted to the fixture columns).

These are the headline scan→filter→join→aggregate→sort pipelines;
Catalyst handles pushdown/pruning/join-strategy (verified in
tests/test_plans.py). Money sums go through decimal for
engine-independent exactness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, query


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    f = li[li["l_shipdate"] <= "1998-09-02"]
    f = f.assign(
        qty_d=f["l_quantity"].astype("decimal(18,6)"),
        price_d=f["l_extendedprice"].astype("decimal(18,6)"),
        disc_d=f["l_discount"].astype("decimal(18,6)"),
        disc_price=(f["l_extendedprice"] * (1 - f["l_discount"])).astype("decimal(18,6)"),
        charge=(f["l_extendedprice"] * (1 - f["l_discount"]) * (1 + f["l_tax"])).astype("decimal(18,6)"),
    )
    g = f.groupby(["l_returnflag", "l_linestatus"], as_index=False, sort=False).agg(
        sum_qty=("qty_d", "sum"),
        sum_base_price=("price_d", "sum"),
        sum_disc_price=("disc_price", "sum"),
        sum_charge=("charge", "sum"),
        sum_disc=("disc_d", "sum"),
        count_order=("l_quantity", "count"),
    )
    g = g.assign(
        avg_qty=lambda x: (x["sum_qty"].astype("double") / x["count_order"]).round(6),
        avg_price=lambda x: (x["sum_base_price"].astype("double") / x["count_order"]).round(6),
        avg_disc=lambda x: (x["sum_disc"].astype("double") / x["count_order"]).round(6),
        sum_qty=lambda x: x["sum_qty"].astype("double"),
        sum_base_price=lambda x: x["sum_base_price"].astype("double"),
        sum_disc_price=lambda x: x["sum_disc_price"].astype("double"),
        sum_charge=lambda x: x["sum_charge"].astype("double"),
    ).drop("sum_disc")
    return g.sort_values(["l_returnflag", "l_linestatus"]).to_spark()


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-03-15' AND l_shipdate > DATE '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cu = cu[cu["c_mktsegment"] == "BUILDING"]
    od = od[od["o_orderdate"] < "1998-03-15"]
    li = li[li["l_shipdate"] > "1998-03-15"]
    j = cu.merge(od, left_on="c_custkey", right_on="o_custkey").merge(
        li, left_on="o_orderkey", right_on="l_orderkey")
    j = j.assign(rev=(j["l_extendedprice"] * (1 - j["l_discount"])).astype("decimal(18,6)"))
    g = j.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"], as_index=False, sort=False).agg(
        revenue=("rev", "sum"))
    g = g.assign(revenue=lambda x: x["revenue"].astype("double"))
    top = g.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    return top[["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]].to_spark()


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1999-01-01'
    GROUP BY n_name ORDER BY revenue DESC
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    re = load(spark, sf_dir, "region")
    od = od[(od["o_orderdate"] >= "1996-01-01") & (od["o_orderdate"] < "1999-01-01")]
    j = (cu.merge(od, left_on="c_custkey", right_on="o_custkey")
         .merge(li, left_on="o_orderkey", right_on="l_orderkey")
         .merge(su, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[j["c_nationkey"] == j["s_nationkey"]]
    j = (j.merge(na, left_on="s_nationkey", right_on="n_nationkey")
         .merge(re[re["r_name"] == "ASIA"], left_on="n_regionkey", right_on="r_regionkey"))
    j = j.assign(rev=(j["l_extendedprice"] * (1 - j["l_discount"])).astype("decimal(18,6)"))
    g = j.groupby("n_name", as_index=False, sort=False).agg(revenue=("rev", "sum"))
    g = g.assign(revenue=lambda x: x["revenue"].astype("double"))
    return g.sort_values("revenue", ascending=False).to_spark()


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    f = li[(li["l_shipdate"] >= "1996-01-01") & (li["l_shipdate"] < "1997-01-01")
           & li["l_discount"].between(0.03, 0.07) & (li["l_quantity"] < 24)]
    f = f.assign(rev=(f["l_extendedprice"] * f["l_discount"]).astype("decimal(18,6)"))
    return f.to_spark().agg(F.sum("rev").cast("double").alias("revenue"),
                            F.count(F.lit(1)).alias("n"))


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           ROUND(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    na = load(spark, sf_dir, "nation")
    li = li[li["l_returnflag"] == "R"]
    j = (cu.merge(od, left_on="c_custkey", right_on="o_custkey")
         .merge(li, left_on="o_orderkey", right_on="l_orderkey")
         .merge(na, left_on="c_nationkey", right_on="n_nationkey"))
    j = j.assign(rev=(j["l_extendedprice"] * (1 - j["l_discount"])).astype("decimal(18,6)"))
    g = j.groupby(["c_custkey", "c_name", "c_acctbal", "n_name"], as_index=False, sort=False).agg(
        revenue=("rev", "sum"))
    g = g.assign(revenue=lambda x: x["revenue"].astype("double"),
                 c_acctbal=lambda x: x["c_acctbal"].round(2))
    top = g.sort_values(["revenue", "c_custkey"], ascending=[False, True]).head(20)
    return top[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]].to_spark()


@query(
    "q_priority_order_counts",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_priority_order_counts(spark, sf_dir):
    """Q4 shape: EXISTS → left-semi join."""
    od = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    j = od.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    late = j[j["l_shipdate"] > j["o_orderdate"]][["o_orderkey"]].drop_duplicates()
    sem = od.merge(late, on="o_orderkey", how="left_semi")
    g = sem.groupby("o_orderpriority", as_index=False, sort=False).agg(order_count=("o_orderkey", "count"))
    return g.sort_values("o_orderpriority").to_spark()


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                            THEN l_extendedprice * (1 - l_discount)
                                            ELSE 0 END AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6)
           AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-02-01'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    """Q14 shape: conditional aggregation over a join."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    f = li[(li["l_shipdate"] >= "1997-01-01") & (li["l_shipdate"] < "1997-02-01")]
    j = f.merge(pt, left_on="l_partkey", right_on="p_partkey")
    rev = j["l_extendedprice"] * (1 - j["l_discount"])
    j = j.assign(
        rev_d=rev.astype("decimal(18,6)"),
        promo_d=rev.where(j["p_type"] == "PROMO", 0.0).astype("decimal(18,6)"),
    )
    out = j.to_spark().agg(
        F.round(100.0 * F.sum("promo_d").cast("double") / F.sum("rev_d").cast("double"), 6)
        .alias("promo_revenue_pct"))
    return out


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, o_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150)
    GROUP BY c_custkey, o_orderkey
    ORDER BY total_qty DESC, o_orderkey LIMIT 20
    """,
)
def q18_large_volume_customers(spark, sf_dir):
    """Q18 shape: HAVING-subquery semi join + re-aggregation."""
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (li.groupby("l_orderkey", as_index=False, sort=False).agg(q=("l_quantity", "sum"))
           .query("q > 150")[["l_orderkey"]])
    od_big = od.merge(big, left_on="o_orderkey", right_on="l_orderkey", how="left_semi")
    j = cu.merge(od_big, left_on="c_custkey", right_on="o_custkey").merge(
        li, left_on="o_orderkey", right_on="l_orderkey")
    j = j.assign(qty_d=j["l_quantity"].astype("decimal(18,6)"))
    g = j.groupby(["c_custkey", "o_orderkey"], as_index=False, sort=False).agg(total_qty=("qty_d", "sum"))
    g = g.assign(total_qty=lambda x: x["total_qty"].astype("double"))
    top = g.sort_values(["total_qty", "o_orderkey"], ascending=[False, True]).head(20)
    return top[["c_custkey", "o_orderkey", "total_qty"]].to_spark()
