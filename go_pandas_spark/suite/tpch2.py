"""TPC-H deck, part 2: the remaining query shapes (Q2, Q7-9, Q11-13,
Q15-17, Q19-22), adapted to the fixture columns (no partsupp table, no
commit/receipt dates, no phone numbers — see TESTDATA.md).

Together with suite/tpch.py (Q1/Q3/Q4/Q5/Q6/Q10/Q14/Q18 shapes) this
covers all 22 TPC-H query patterns: correlated-min subqueries (Q2),
nation-pair joins (Q7), market share (Q8), profit expressions (Q9),
concentration HAVING-on-global-total (Q11), conditional counts (Q12),
outer-join distributions (Q13), scalar-max subqueries (Q15), NOT-IN +
distinct counts (Q16), correlated-avg subqueries (Q17), disjunctive
predicates (Q19), volume semi-joins (Q20), multi-exists last-to-ship
(Q21), and anti-join + global-avg thresholds (Q22).

Determinism rules (same as suite/tpch.py): money sums go through
DECIMAL(18,6); threshold comparisons against averages are rewritten as
exact cross-multiplications (`x * n > total` instead of `x > total/n`)
so no engine-dependent float division occurs before a comparison;
double min/max are order statistics (exact); tiebreaks are explicit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, query

_DAY = 86400  # seconds


def _sec(series):
    """Timestamp Series -> epoch seconds (µs-precision engine contract)."""
    return series._with_scol(F.unix_seconds(series._scol.cast("timestamp")))


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH j AS (
      SELECT p.p_partkey, p.p_name, l.l_suppkey, l.l_extendedprice
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'STANDARD' AND p.p_size < 10
        AND l.l_suppkey IN (SELECT s_suppkey FROM supplier s
                            JOIN nation n ON s.s_nationkey = n.n_nationkey
                            JOIN region r ON n.n_regionkey = r.r_regionkey
                            WHERE r.r_name = 'EUROPE')),
    m AS (SELECT p_partkey, MIN(l_extendedprice) AS best_price FROM j GROUP BY p_partkey)
    SELECT j.p_partkey, j.p_name, CAST(MIN(j.l_suppkey) AS BIGINT) AS best_suppkey,
           m.best_price
    FROM j JOIN m ON j.p_partkey = m.p_partkey AND j.l_extendedprice = m.best_price
    GROUP BY j.p_partkey, j.p_name, m.best_price
    ORDER BY j.p_partkey LIMIT 50
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape: correlated MIN subquery -> per-group min + equality join
    back. Min over doubles is an order statistic (deterministic); supplier
    ties break on min suppkey."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    re = load(spark, sf_dir, "region")
    pt = pt[(pt["p_type"] == "STANDARD") & (pt["p_size"] < 10)]
    eu = (su.merge(na, left_on="s_nationkey", right_on="n_nationkey")
          .merge(re[re["r_name"] == "EUROPE"], left_on="n_regionkey", right_on="r_regionkey"))
    li_eu = li.merge(eu[["s_suppkey"]], left_on="l_suppkey", right_on="s_suppkey",
                     how="left_semi")
    j = li_eu.merge(pt[["p_partkey", "p_name"]], left_on="l_partkey", right_on="p_partkey")
    m = j.groupby("p_partkey", as_index=False, sort=False).agg(best_price=("l_extendedprice", "min"))
    jm = j.merge(m, on="p_partkey")
    jm = jm[jm["l_extendedprice"] == jm["best_price"]]
    g = jm.groupby(["p_partkey", "p_name", "best_price"], as_index=False, sort=False).agg(
        best_suppkey=("l_suppkey", "min"))
    top = g.sort_values("p_partkey").head(50)
    return top[["p_partkey", "p_name", "best_suppkey", "best_price"]].to_spark()


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(vol) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
                 CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS vol
          FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1998-01-01')
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """Q7 shape: the same dimension table (nation) joined twice under two
    roles; both sides are broadcast dims at any scale."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    supp_n = (su.merge(na[["n_nationkey", "n_name"]].rename(columns={"n_name": "supp_nation"}),
                       left_on="s_nationkey", right_on="n_nationkey")
              [["s_suppkey", "supp_nation"]])
    cust_n = (cu.merge(na[["n_nationkey", "n_name"]].rename(columns={"n_name": "cust_nation"}),
                       left_on="c_nationkey", right_on="n_nationkey")
              [["c_custkey", "cust_nation"]])
    f = li[(li["l_shipdate"] >= "1996-01-01") & (li["l_shipdate"] < "1998-01-01")]
    j = (f.merge(od[["o_orderkey", "o_custkey"]], left_on="l_orderkey", right_on="o_orderkey")
         .merge(cust_n, left_on="o_custkey", right_on="c_custkey")
         .merge(supp_n, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[((j["supp_nation"] == "NATION_1") & (j["cust_nation"] == "NATION_2"))
          | ((j["supp_nation"] == "NATION_2") & (j["cust_nation"] == "NATION_1"))]
    j = j.assign(l_year=j["l_shipdate"].dt.year,
                 vol=(j["l_extendedprice"] * (1 - j["l_discount"])).astype("decimal(18,6)"))
    g = j.groupby(["supp_nation", "cust_nation", "l_year"], as_index=False, sort=False).agg(
        revenue=("vol", "sum"))
    g = g.assign(revenue=lambda x: x["revenue"].astype("double"))
    return g.sort_values(["supp_nation", "cust_nation", "l_year"]).to_spark()


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol
                               ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(SUM(vol) AS DOUBLE), 6) AS mkt_share
    FROM (SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
                 CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)) AS vol,
                 n1.n_name AS supp_nation
          FROM lineitem l
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
            JOIN region r   ON n2.n_regionkey = r.r_regionkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
            JOIN part p     ON l.l_partkey = p.p_partkey
          WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
            AND o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1998-01-01')
    GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """Q8 shape: one nation's share of regional volume per year. Numerator
    and denominator stay exact decimals until the final division."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    cu = load(spark, sf_dir, "customer")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    re = load(spark, sf_dir, "region")
    pt = load(spark, sf_dir, "part")
    od = od[(od["o_orderdate"] >= "1996-01-01") & (od["o_orderdate"] < "1998-01-01")]
    asia_cust = (cu.merge(na, left_on="c_nationkey", right_on="n_nationkey")
                 .merge(re[re["r_name"] == "ASIA"], left_on="n_regionkey",
                        right_on="r_regionkey")[["c_custkey"]])
    supp_n = (su.merge(na[["n_nationkey", "n_name"]].rename(columns={"n_name": "supp_nation"}),
                       left_on="s_nationkey", right_on="n_nationkey")
              [["s_suppkey", "supp_nation"]])
    j = (li.merge(pt[pt["p_type"] == "ECONOMY"][["p_partkey"]],
                  left_on="l_partkey", right_on="p_partkey", how="left_semi")
         .merge(od[["o_orderkey", "o_custkey", "o_orderdate"]],
                left_on="l_orderkey", right_on="o_orderkey")
         .merge(asia_cust, left_on="o_custkey", right_on="c_custkey", how="left_semi")
         .merge(supp_n, left_on="l_suppkey", right_on="s_suppkey"))
    vol = (j["l_extendedprice"] * (1 - j["l_discount"])).astype("decimal(18,6)")
    j = j.assign(o_year=j["o_orderdate"].dt.year, vol=vol,
                 nation_vol=vol.where(j["supp_nation"] == "NATION_5",
                                      0).astype("decimal(18,6)"))
    g = j.groupby("o_year", as_index=False, sort=False).agg(num=("nation_vol", "sum"),
                                                den=("vol", "sum"))
    g = g.assign(mkt_share=lambda x: (x["num"].astype("double")
                                      / x["den"].astype("double")).round(6))
    return g[["o_year", "mkt_share"]].sort_values("o_year").to_spark()


@query(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS profit
    FROM (SELECT n.n_name AS nation,
                 CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
                 CAST(l.l_extendedprice * (1 - l.l_discount)
                      - 0.5 * p.p_retailprice * l.l_quantity AS DECIMAL(18,6)) AS amount
          FROM lineitem l
            JOIN part p     ON l.l_partkey = p.p_partkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            JOIN orders o   ON l.l_orderkey = o.o_orderkey
          WHERE p.p_name LIKE '%widget%')
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark, sf_dir):
    """Q9 shape: profit expression over a 5-way join (p_retailprice stands
    in for ps_supplycost — no partsupp table in the fixture)."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    od = load(spark, sf_dir, "orders")
    pw = pt[pt["p_name"].str.contains("widget")][["p_partkey", "p_retailprice"]]
    j = (li.merge(pw, left_on="l_partkey", right_on="p_partkey")
         .merge(su[["s_suppkey", "s_nationkey"]], left_on="l_suppkey", right_on="s_suppkey")
         .merge(na[["n_nationkey", "n_name"]].rename(columns={"n_name": "nation"}),
                left_on="s_nationkey", right_on="n_nationkey")
         .merge(od[["o_orderkey", "o_orderdate"]], left_on="l_orderkey",
                right_on="o_orderkey"))
    amount = (j["l_extendedprice"] * (1 - j["l_discount"])
              - 0.5 * j["p_retailprice"] * j["l_quantity"]).astype("decimal(18,6)")
    j = j.assign(o_year=j["o_orderdate"].dt.year, amount=amount)
    g = j.groupby(["nation", "o_year"], as_index=False, sort=False).agg(profit=("amount", "sum"))
    g = g.assign(profit=lambda x: x["profit"].astype("double"))
    return g.sort_values(["nation", "o_year"], ascending=[True, False]).to_spark()


@query(
    "q11_revenue_concentration",
    oracle="""
    WITH sr AS (SELECT l_suppkey,
                       SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS value_d
                FROM lineitem GROUP BY l_suppkey)
    SELECT l_suppkey, CAST(value_d AS DOUBLE) AS value
    FROM sr WHERE value_d * 100 > (SELECT SUM(value_d) FROM sr)
    ORDER BY value DESC, l_suppkey
    """,
)
def q11_revenue_concentration(spark, sf_dir):
    """Q11 shape: HAVING against a fraction of the global total. The
    threshold compare is cross-multiplied (value*100 > total) so it stays
    in exact decimal arithmetic — no float division before the filter."""
    li = load(spark, sf_dir, "lineitem")
    li = li.assign(rev_d=(li["l_extendedprice"] * (1 - li["l_discount"]))
                   .astype("decimal(18,6)"))
    g = li.groupby("l_suppkey", as_index=False, sort=False).agg(value_d=("rev_d", "sum"))
    total = g["value_d"].sum()  # scalar subquery: exact Decimal on the driver
    keep = g[g["value_d"] * 100 > total]
    keep = keep.assign(value=keep["value_d"].astype("double"))
    return (keep[["l_suppkey", "value"]]
            .sort_values(["value", "l_suppkey"], ascending=[False, True]).to_spark())


@query(
    "q12_late_shipment_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)
                AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE date_diff('second', o_orderdate, l_shipdate) > 60 * 86400
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q12_late_shipment_priority(spark, sf_dir):
    """Q12 shape: conditional counts split by priority class over late
    shipments (l_returnflag stands in for l_shipmode)."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    j = li.merge(od[["o_orderkey", "o_orderdate", "o_orderpriority"]],
                 left_on="l_orderkey", right_on="o_orderkey")
    lat = _sec(j["l_shipdate"]) - _sec(j["o_orderdate"])
    j = j[lat > 60 * _DAY]
    is_high = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    one = j["l_orderkey"]._with_scol(F.lit(1))
    j = j.assign(high=one.where(is_high, 0), low=one.where(~is_high, 0))
    g = j.groupby("l_returnflag", as_index=False, sort=False).agg(
        high_line_count=("high", "sum"), low_line_count=("low", "sum"))
    return g.sort_values("l_returnflag").to_spark()


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """Q13 shape: outer join preserving zero-order customers, then a
    distribution over the per-customer counts (two aggregations)."""
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    odf = od[od["o_orderpriority"] != "1-URGENT"][["o_custkey", "o_orderkey"]]
    j = cu[["c_custkey"]].merge(odf, left_on="c_custkey", right_on="o_custkey", how="left")
    per_cust = j.groupby("c_custkey", as_index=False, sort=False).agg(c_count=("o_orderkey", "count"))
    dist = per_cust.groupby("c_count", as_index=False, sort=False).agg(custdist=("c_custkey", "count"))
    return dist.sort_values(["custdist", "c_count"], ascending=[False, False]).to_spark()


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_d
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_d AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_d = (SELECT MAX(total_d) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """Q15 shape: scalar MAX subquery over a derived revenue view. The
    equality test is on exact decimal sums, so cross-engine ties are
    bit-identical."""
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    f = li[(li["l_shipdate"] >= "1996-01-01") & (li["l_shipdate"] < "1996-04-01")]
    f = f.assign(rev_d=(f["l_extendedprice"] * (1 - f["l_discount"]))
                 .astype("decimal(18,6)"))
    rev = f.groupby("l_suppkey", as_index=False, sort=False).agg(total_d=("rev_d", "sum"))
    best = rev["total_d"].max()  # driver-side scalar (exact Decimal)
    top = rev[rev["total_d"] == best].merge(su[["s_suppkey", "s_name"]],
                                            left_on="l_suppkey", right_on="s_suppkey")
    top = top.assign(total_revenue=top["total_d"].astype("double"))
    return top[["s_suppkey", "s_name", "total_revenue"]].sort_values("s_suppkey").to_spark()


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 40
    """,
)
def q16_supplier_part_counts(spark, sf_dir):
    """Q16 shape: NOT IN -> anti join, then COUNT(DISTINCT) per group
    (lineitem supplier-part pairs stand in for partsupp)."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    su = load(spark, sf_dir, "supplier")
    bad = su[su["s_acctbal"] < 0][["s_suppkey"]]
    li2 = li[["l_partkey", "l_suppkey"]].merge(bad, left_on="l_suppkey",
                                               right_on="s_suppkey", how="left_anti")
    ptf = pt[(pt["p_brand"] != "Brand#1")
             & pt["p_size"].isin([1, 5, 9, 13, 17, 21, 25])]
    j = li2.merge(ptf[["p_partkey", "p_brand", "p_type", "p_size"]],
                  left_on="l_partkey", right_on="p_partkey")
    g = j.groupby(["p_brand", "p_type", "p_size"], as_index=False, sort=False).agg(
        supplier_cnt=("l_suppkey", "nunique"))
    top = g.sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"],
                        ascending=[False, True, True, True]).head(40)
    return top.to_spark()


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH j AS (SELECT l_partkey, l_quantity, l_extendedprice
               FROM lineitem JOIN part ON l_partkey = p_partkey
               WHERE p_brand = 'Brand#3'),
    s AS (SELECT l_partkey, COUNT(*) AS cnt,
                 SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty
          FROM j GROUP BY l_partkey)
    SELECT ROUND(CAST(SUM(CAST(j.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 6)
             AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM j JOIN s ON j.l_partkey = s.l_partkey
    WHERE CAST(j.l_quantity AS DECIMAL(18,6)) * 5 * s.cnt < s.sum_qty
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """Q17 shape: correlated AVG subquery. `qty < 0.2 * avg(qty)` is
    cross-multiplied to `qty * 5 * cnt < sum(qty)` — exact decimal/integer
    arithmetic on both engines, no float threshold."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    p3 = pt[pt["p_brand"] == "Brand#3"][["p_partkey"]]
    j = li[["l_partkey", "l_quantity", "l_extendedprice"]].merge(
        p3, left_on="l_partkey", right_on="p_partkey", how="left_semi")
    j = j.assign(qty_d=j["l_quantity"].astype("decimal(18,6)"),
                 price_d=j["l_extendedprice"].astype("decimal(18,6)"))
    # per-part stats as window aggregates: one hash partitioning on
    # l_partkey instead of aggregate + join-back (two more exchanges of
    # part-grain data, which grows with the fact table)
    g = j.groupby("l_partkey")
    j = j.assign(cnt=g["l_quantity"].transform("count"),
                 sum_qty=g["qty_d"].transform("sum"))
    small = j[j["qty_d"] * 5 * j["cnt"] < j["sum_qty"]]
    return small.to_spark().agg(
        F.round(F.sum("price_d").cast("double") / 7.0, 6).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n"))


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
             AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#2'  AND l_quantity BETWEEN 1  AND 11 AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#13' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#24' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
)
def q19_disjunctive_revenue(spark, sf_dir):
    """Q19 shape: disjunction of conjunctive range predicates across the
    fact and the dimension — Catalyst pushes the partial predicates to both
    scans and evaluates the OR post-join."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    j = li.merge(pt[["p_partkey", "p_brand", "p_size"]],
                 left_on="l_partkey", right_on="p_partkey")
    cond = (((j["p_brand"] == "Brand#2") & j["l_quantity"].between(1, 11)
             & j["p_size"].between(1, 5))
            | ((j["p_brand"] == "Brand#13") & j["l_quantity"].between(10, 20)
               & j["p_size"].between(1, 10))
            | ((j["p_brand"] == "Brand#24") & j["l_quantity"].between(20, 30)
               & j["p_size"].between(1, 15)))
    f = j[cond]
    f = f.assign(rev_d=(f["l_extendedprice"] * (1 - f["l_discount"]))
                 .astype("decimal(18,6)"))
    return f.to_spark().agg(F.sum("rev_d").cast("double").alias("revenue"),
                            F.count(F.lit(1)).alias("n"))


@query(
    "q20_part_volume_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%gear%')
        AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      GROUP BY l_suppkey HAVING SUM(l_quantity) > 300)
    ORDER BY s_suppkey
    """,
)
def q20_part_volume_suppliers(spark, sf_dir):
    """Q20 shape: nested IN subqueries -> semi-join chain with a HAVING
    volume threshold. Quantities are integral doubles, so the double SUM is
    exact (no decimal cast needed)."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    su = load(spark, sf_dir, "supplier")
    gear = pt[pt["p_name"].str.contains("gear")][["p_partkey"]]
    f = li[(li["l_shipdate"] >= "1996-01-01") & (li["l_shipdate"] < "1997-01-01")]
    f = f.merge(gear, left_on="l_partkey", right_on="p_partkey", how="left_semi")
    vol = f.groupby("l_suppkey", as_index=False, sort=False).agg(qty=("l_quantity", "sum"))
    big = vol[vol["qty"] > 300][["l_suppkey"]]
    out = su.merge(big, left_on="s_suppkey", right_on="l_suppkey", how="left_semi")
    return out[["s_suppkey", "s_name"]].sort_values("s_suppkey").to_spark()


@query(
    "q21_last_to_ship",
    oracle="""
    WITH j AS (SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
               FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    s AS (SELECT l_orderkey, MAX(l_shipdate) AS max_ship,
                 COUNT(DISTINCT l_suppkey) AS nsupp, MAX(o_orderdate) AS od
          FROM j GROUP BY l_orderkey),
    late AS (SELECT l_orderkey, max_ship FROM s
             WHERE nsupp >= 2 AND date_diff('second', od, max_ship) > 60 * 86400),
    last_supp AS (SELECT j.l_orderkey, MIN(j.l_suppkey) AS last_supp
                  FROM j JOIN late ON j.l_orderkey = late.l_orderkey
                                  AND j.l_shipdate = late.max_ship
                  GROUP BY j.l_orderkey)
    SELECT s_suppkey, s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM last_supp JOIN supplier ON last_supp = s_suppkey
    GROUP BY s_suppkey, s_name
    ORDER BY numwait DESC, s_suppkey LIMIT 10
    """,
)
def q21_last_to_ship(spark, sf_dir):
    """Q21 shape: multi-EXISTS over order line sets — which supplier shipped
    last on late multi-supplier orders (no receipt/commit dates in the
    fixture, so lateness is ship-vs-order + 60 days). Ties on the final
    ship date break to the smallest supplier key."""
    li = load(spark, sf_dir, "lineitem")
    od = load(spark, sf_dir, "orders")
    su = load(spark, sf_dir, "supplier")
    j = li[["l_orderkey", "l_suppkey", "l_shipdate"]].merge(
        od[["o_orderkey", "o_orderdate"]], left_on="l_orderkey", right_on="o_orderkey")
    # window formulation: the per-order stats ride the join's existing
    # hash partitioning on the order key — no aggregate + join-back (which
    # costs 3 extra exchanges of order-grain data; at 100 TB that grain
    # scales with the fact table, so it must not reshuffle)
    g = j.groupby("l_orderkey")
    j = j.assign(max_ship=g["l_shipdate"].transform("max"),
                 nsupp=g["l_suppkey"].transform("nunique"))
    last_lines = j[(j["nsupp"] >= 2)
                   & (_sec(j["max_ship"]) - _sec(j["o_orderdate"]) > 60 * _DAY)
                   & (j["l_shipdate"] == j["max_ship"])]
    per_order = last_lines.groupby("l_orderkey", as_index=False, sort=False).agg(
        last_supp=("l_suppkey", "min"))
    g = per_order.groupby("last_supp", as_index=False, sort=False).agg(numwait=("l_orderkey", "count"))
    out = g.merge(su[["s_suppkey", "s_name"]], left_on="last_supp", right_on="s_suppkey")
    top = out.sort_values(["numwait", "s_suppkey"], ascending=[False, True]).head(10)
    return top[["s_suppkey", "s_name", "numwait"]].to_spark()


@query(
    "q22_idle_customers",
    oracle="""
    WITH t AS (SELECT COUNT(*) AS n, SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS s
               FROM customer WHERE c_acctbal > 0)
    SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM customer, t
    WHERE CAST(c_acctbal AS DECIMAL(18,6)) * t.n > t.s
      AND c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderdate >= DATE '2000-01-01')
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def q22_idle_customers(spark, sf_dir):
    """Q22 shape: above-average balance (cross-multiplied to exact decimal
    compare) + anti join against recent orders (every fixture customer has
    historical orders, so 'no orders at all' would be empty — the window
    makes it discriminating)."""
    cu = load(spark, sf_dir, "customer")
    od = load(spark, sf_dir, "orders")
    pos = cu[cu["c_acctbal"] > 0]
    bal_d = pos["c_acctbal"].astype("decimal(18,6)")
    n_pos = pos["c_custkey"].count()  # driver-side scalars (exact)
    s_pos = bal_d.sum()
    rich = cu[cu["c_acctbal"].astype("decimal(18,6)") * n_pos > s_pos]
    recent = od[od["o_orderdate"] >= "2000-01-01"][["o_custkey"]]
    idle = rich.merge(recent, left_on="c_custkey", right_on="o_custkey", how="left_anti")
    idle = idle.assign(bal_d=idle["c_acctbal"].astype("decimal(18,6)"))
    g = idle.groupby("c_nationkey", as_index=False, sort=False).agg(
        numcust=("c_custkey", "count"), totacctbal=("bal_d", "sum"))
    g = g.assign(totacctbal=lambda x: x["totacctbal"].astype("double"))
    return g.sort_values("c_nationkey").to_spark()
