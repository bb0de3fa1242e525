"""Secondary pandas surface as oracle-paired queries (round 4):
take, factorize, Series.duplicated, Frame.pct_change, reindex, update.
The positional/tie-break parity beyond multiset equality is covered by
the pd-diff battery in tests/test_secondary_surface.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, query


@query(
    "frame_take_positions",
    oracle="""
    WITH s AS (SELECT o_orderkey, o_totalprice,
                      ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS pos
               FROM orders),
    n AS (SELECT COUNT(*) AS cnt FROM orders)
    SELECT s.o_orderkey, s.o_totalprice
    FROM s CROSS JOIN n
    JOIN (VALUES (7), (3), (3), (0), (-1)) v(p)
      ON s.pos = CASE WHEN v.p >= 0 THEN v.p ELSE n.cnt + v.p END
    """,
)
def frame_take_positions(spark, sf_dir):
    """take() with duplicate and negative positions — the positional
    map is a broadcast literal join against the distributed running
    count, never a global window."""
    orders = load(spark, sf_dir, "orders").sort_values("o_orderkey")
    return orders.take([7, 3, 3, 0, -1])[["o_orderkey", "o_totalprice"]].to_spark()


@query(
    "series_factorize_codes",
    oracle="""
    WITH m AS (SELECT c_mktsegment, MIN(c_custkey) AS fo FROM customer GROUP BY 1),
    c AS (SELECT c_mktsegment,
                 CAST(ROW_NUMBER() OVER (ORDER BY fo) - 1 AS BIGINT) AS code
          FROM m)
    SELECT c.code FROM customer f JOIN c USING (c_mktsegment)
    """,
)
def series_factorize_codes(spark, sf_dir):
    """factorize(): dense first-appearance codes, distributed (one
    value-keyed agg + broadcast dictionary join)."""
    cust = load(spark, sf_dir, "customer").sort_values("c_custkey")
    codes, _uniques = cust["c_mktsegment"].factorize()
    return codes.to_frame("code").to_spark()


@query(
    "series_duplicated_flags",
    oracle="""
    WITH s AS (SELECT event_id, user_id,
                      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
                      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rl,
                      COUNT(*) OVER (PARTITION BY user_id) AS c
               FROM events)
    SELECT event_id, rn > 1 AS dup_first, rl > 1 AS dup_last, c > 1 AS dup_all
    FROM s
    """,
)
def series_duplicated_flags(spark, sf_dir):
    """Series.duplicated keep=first/last/False — windows partitioned
    BY VALUE (distributed at any cardinality)."""
    ev = load(spark, sf_dir, "events").sort_values("event_id")
    out = ev.assign(dup_first=ev["user_id"].duplicated("first"),
                    dup_last=ev["user_id"].duplicated("last"),
                    dup_all=ev["user_id"].duplicated(False))
    return out[["event_id", "dup_first", "dup_last", "dup_all"]].to_spark()


@query(
    "frame_pct_change",
    oracle="""
    WITH s AS (SELECT CAST(l_quantity AS DOUBLE) AS l_quantity,
                      CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
                      ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
               FROM lineitem WHERE l_orderkey <= 1000)
    SELECT l_quantity / LAG(l_quantity) OVER (ORDER BY rn) - 1 AS q_pct,
           l_extendedprice / LAG(l_extendedprice) OVER (ORDER BY rn) - 1 AS p_pct
    FROM s
    """,
)
def frame_pct_change(spark, sf_dir):
    """Frame.pct_change over the global order — blocked distributed
    (same kernel as diff), no single-task window."""
    li = load(spark, sf_dir, "lineitem")
    li = li[li["l_orderkey"] <= 1000].sort_values(["l_orderkey", "l_linenumber"])
    sub = li[["l_quantity", "l_extendedprice"]].astype("double")
    out = sub.pct_change()
    # RAW doubles, no engine-side ROUND: both engines divide the same
    # parquet-decimal-cast doubles, so the bits match exactly; rounding
    # a dyadic-boundary ratio in two engines can differ by one ulp
    return out.to_spark().select(
        F.col("l_quantity").alias("q_pct"),
        F.col("l_extendedprice").alias("p_pct"))


@query(
    "frame_reindex_labels",
    oracle="""
    SELECT v.k, c.c_acctbal
    FROM (VALUES (5), (3), (999999), (10)) v(k)
    LEFT JOIN customer c ON c.c_custkey = v.k
    """,
)
def frame_reindex_labels(spark, sf_dir):
    """reindex to an explicit label list: left join FROM the labels,
    missing labels become null rows, label order preserved."""
    cust = load(spark, sf_dir, "customer")[["c_custkey", "c_acctbal"]].set_index("c_custkey")
    out = cust.reindex(index=[5, 3, 999999, 10])
    return out.to_spark(index=True).withColumnRenamed("c_custkey", "k")


@query(
    "frame_update_overwrite",
    oracle="""
    SELECT n_nationkey,
           CASE WHEN n_regionkey = 1 THEN lower(n_name) ELSE n_name END AS n_name,
           n_regionkey
    FROM nation
    """,
)
def frame_update_overwrite(spark, sf_dir):
    """update(): other's non-null values overwrite on index match —
    one broadcast join, in place."""
    nat = load(spark, sf_dir, "nation")[["n_nationkey", "n_name", "n_regionkey"]] \
        .set_index("n_nationkey")
    other = load(spark, sf_dir, "nation")
    other = other[other["n_regionkey"] == 1].assign(
        n_name=other["n_name"].str.lower())[["n_nationkey", "n_name"]].set_index("n_nationkey")
    nat.update(other)
    return nat.to_spark(index=True)


@query(
    "frame_align_outer",
    oracle="""
    WITH c AS (SELECT c_custkey AS k, c_acctbal FROM customer WHERE c_custkey <= 60),
         o AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_orders
               FROM orders WHERE o_custkey <= 80 GROUP BY 1)
    SELECT COALESCE(c.k, o.k) AS k, c.c_acctbal, o.n_orders
    FROM c FULL OUTER JOIN o ON c.k = o.k
    """,
)
def frame_align_outer(spark, sf_dir):
    """align(join='outer'): ONE full-outer equi-join on the index
    gives both frames the union label set and union columns."""
    cust = load(spark, sf_dir, "customer")
    c = cust[cust["c_custkey"] <= 60][["c_custkey", "c_acctbal"]] \
        .set_index("c_custkey")
    od = load(spark, sf_dir, "orders")
    o = od[od["o_custkey"] <= 80].groupby("o_custkey", as_index=False) \
        .agg(n_orders=("o_orderkey", "count")) \
        .rename(columns={"o_custkey": "k"}).set_index("k")
    la, ra = c.align(o, join="outer")
    joined = la.to_spark(index=True).withColumnRenamed("c_custkey", "k") \
        .drop("n_orders")
    rb = ra.to_spark(index=True).select(F.col("k").alias("k2"), "n_orders")
    return joined.join(rb, joined["k"] == rb["k2"]).drop("k2")
