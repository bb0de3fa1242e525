"""Remaining §2 surface: Series.map, time-of-day filters, first/last
offsets, concat axis=1, weighted rolling, autocorr, monotonic checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, query
from .windows import TS


@query(
    "series_map_dict",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'click' THEN 1.0 WHEN event_type = 'view' THEN 0.5
                WHEN event_type = 'purchase' THEN 10.0 END AS weight
    FROM events
    """,
)
def series_map_dict(spark, sf_dir):
    """Series.map(dict) → when-chain (``series.py:3129``), JVM-side."""
    ev = load(spark, sf_dir, "events")
    out = ev.assign(weight=ev["event_type"].map({"click": 1.0, "view": 0.5, "purchase": 10.0}))
    return out[["event_id", "weight"]].to_spark()


@query(
    "at_time_between_time",
    oracle=f"""
    SELECT 'at' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM events
      WHERE strftime({TS}, '%H:%M:%S') = '12:00:00'
    UNION ALL
    SELECT 'between', CAST(COUNT(*) AS BIGINT) FROM events
      WHERE strftime({TS}, '%H:%M:%S') BETWEEN '09:00:00' AND '17:00:00'
    UNION ALL
    SELECT 'wrap', CAST(COUNT(*) AS BIGINT) FROM events
      WHERE strftime({TS}, '%H:%M:%S') >= '22:00:00' OR strftime({TS}, '%H:%M:%S') <= '02:00:00'
    ORDER BY op
    """,
)
def at_time_between_time(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    rows = [
        ("at", ev.at_time("12:00:00", on="ts")),       # exact µs time: usually 0 rows
        ("between", ev.between_time("09:00:00", "17:00:00", on="ts")),
        ("wrap", ev.between_time("22:00:00", "02:00:00", on="ts")),
    ]
    # counts collected driver-side: an empty filter result must still
    # produce its 0-count row (a groupby would drop it)
    data = [(name, len(f)) for name, f in rows]
    return spark.createDataFrame(data, "op string, n long")


@query(
    "first_last_offset",
    oracle=f"""
    WITH b AS (SELECT MIN({TS}) AS lo, MAX({TS}) AS hi FROM events)
    SELECT 'first3d' AS op, CAST(COUNT(*) AS BIGINT) AS n
      FROM events, b WHERE {TS} < lo + INTERVAL 3 DAY
    UNION ALL
    SELECT 'last3d', CAST(COUNT(*) AS BIGINT)
      FROM events, b WHERE {TS} > hi - INTERVAL 3 DAY
    ORDER BY op
    """,
)
def first_last_offset(spark, sf_dir):
    """``first('3D')`` / ``last('3D')`` (``generic.py:7818,7881``)."""
    import go_pandas_spark as gp

    ev = load(spark, sf_dir, "events")
    a = ev.first_offset("3d", on="ts").assign(op="first3d").groupby("op", as_index=False).agg(
        n=("event_id", "count"))
    b = ev.last_offset("3d", on="ts").assign(op="last3d").groupby("op", as_index=False).agg(
        n=("event_id", "count"))
    return gp.concat([a, b]).sort_values("op").to_spark()


@query(
    "concat_axis1_align",
    oracle="""
    SELECT c.c_custkey, c.total_spent, n.n_orders
    FROM (SELECT o_custkey AS c_custkey,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spent
          FROM orders GROUP BY 1) c
    FULL OUTER JOIN (SELECT o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS n_orders
                     FROM orders WHERE o_orderstatus = 'F' GROUP BY 1) n
    ON c.c_custkey = n.ck
    """,
)
def concat_axis1_align(spark, sf_dir):
    """concat(axis=1) = outer join on the index (``concat.py:24``)."""
    import go_pandas_spark as gp

    od = load(spark, sf_dir, "orders")
    od = od.assign(price_d=od["o_totalprice"].astype("decimal(18,6)"))
    a = od.groupby("o_custkey", as_index=False).agg(total_spent=("price_d", "sum"))
    a = a.assign(total_spent=lambda x: x["total_spent"].astype("double")).rename(
        {"o_custkey": "c_custkey"}).set_index("c_custkey")
    b = od[od["o_orderstatus"] == "F"].groupby("o_custkey", as_index=False).agg(
        n_orders=("o_orderkey", "count")).rename({"o_custkey": "c_custkey"}).set_index("c_custkey")
    out = gp.concat([a, b], axis=1).reset_index()
    return out[["c_custkey", "total_spent", "n_orders"]].to_spark()


@query(
    "rolling_weighted_triang",
    oracle=f"""
    WITH o AS (SELECT event_id, user_id, value,
                      ROW_NUMBER() OVER w AS rn,
                      LAG(value, 4) OVER w AS x0, LAG(value, 3) OVER w AS x1,
                      LAG(value, 2) OVER w AS x2, LAG(value, 1) OVER w AS x3, value AS x4
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY {TS}, event_id))
    SELECT event_id,
           ROUND((x0*(1.0/3) + x1*(2.0/3) + x2*1.0 + x3*(2.0/3) + x4*(1.0/3))
                 / (1.0/3 + 2.0/3 + 1.0 + 2.0/3 + 1.0/3), 6) AS wmean
    FROM o
    """,
)
def rolling_weighted_triang(spark, sf_dir):
    """win_type='triang' weighted rolling mean = lag-dot-product
    (``core/window.py:595``, SURVEY §2.5 weighted windows)."""
    ev = load(spark, sf_dir, "events").sort_values(["user_id", "ts", "event_id"])
    r = ev.groupby("user_id")["value"].rolling(5, win_type="triang")
    out = ev.assign(wmean=r.mean().round(6))
    return out[["event_id", "wmean"]].to_spark()


@query(
    "autocorr_and_monotonic",
    oracle=f"""
    WITH s AS (SELECT value, LAG(value) OVER (ORDER BY event_id) AS prev,
                      LAG(event_id) OVER (ORDER BY event_id) AS eprev, event_id
               FROM events)
    SELECT ROUND(CORR(value, prev), 6) AS autocorr_1,
           (MIN(CASE WHEN eprev IS NULL OR event_id >= eprev THEN 1 ELSE 0 END) = 1) AS id_monotonic,
           (MIN(CASE WHEN prev IS NULL OR value >= prev THEN 1 ELSE 0 END) = 1) AS value_monotonic
    FROM s
    """,
)
def autocorr_and_monotonic(spark, sf_dir):
    """Series.autocorr (``series.py:2028``) + is_monotonic checks
    (``algos.pyx:796``)."""
    ev = load(spark, sf_dir, "events").sort_values("event_id")
    ac = round(ev["value"].autocorr(1), 6)
    idm = ev["event_id"].is_monotonic_increasing()
    vm = ev["value"].is_monotonic_increasing()
    return spark.createDataFrame([(ac, idm, vm)],
                                 "autocorr_1 double, id_monotonic boolean, value_monotonic boolean")


@query(
    "rollup_hierarchy",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_hierarchy(spark, sf_dir):
    """Grouping-set extras (absent in the reference; SURVEY §2.4)."""
    li = load(spark, sf_dir, "lineitem")
    li = li.assign(qty_d=li["l_quantity"].astype("decimal(18,6)"))
    r = li.rollup(["l_returnflag", "l_linestatus"],
                  {"qty": ("qty_d", "sum"), "n": ("l_quantity", "count")})
    r = r.assign(qty=r["qty"].astype("double"))
    return r[["l_returnflag", "l_linestatus", "qty", "n"]].to_spark()


@query(
    "cube_all_combos",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_all_combos(spark, sf_dir):
    od = load(spark, sf_dir, "orders")
    c = od.cube(["o_orderstatus", "o_orderpriority"], {"n": ("o_orderkey", "count")})
    return c[["o_orderstatus", "o_orderpriority", "n"]].to_spark()


@query(
    "explode_tokens",
    oracle="""
    SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS token
    FROM documents WHERE doc_id < 100
    """,
)
def explode_tokens(spark, sf_dir):
    """Row-exploding array column (engine extra, SURVEY §2.8)."""
    from ..operators.text import tokens

    d = load(spark, sf_dir, "documents")
    d = d[d["doc_id"] < 100]
    d = d.assign(token=d["text"]._with_scol(tokens(d["text"]._scol)))
    return d.explode_col("token")[["doc_id", "token"]].to_spark()


@query(
    "groupby_str_cat",
    oracle="""
    SELECT user_id, string_agg(event_type, '|' ORDER BY event_id) AS event_type
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def groupby_str_cat(spark, sf_dir):
    """str.cat collapse per group (``strings.py:1018``) with a
    deterministic order."""
    ev = load(spark, sf_dir, "events").sort_values("event_id")
    return ev.groupby("user_id")["event_type"].str_cat("|").to_spark()


@query(
    "salted_skew_join",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def salted_skew_join(spark, sf_dir):
    """Salting for skewed join keys (SURVEY 'Partitioning & shuffle'):
    semantics identical to the plain merge."""
    from ..operators.joins import salted_merge

    li = load(spark, sf_dir, "lineitem").rename({"l_orderkey": "k"})
    od = load(spark, sf_dir, "orders").rename({"o_orderkey": "k"})
    od = od.assign(price_d=od["o_totalprice"].astype("decimal(18,6)"))
    j = salted_merge(li, od, on="k", salt=8)
    g = j.groupby("l_returnflag", as_index=False).agg(n=("k", "count"), total=("price_d", "sum"))
    g = g.assign(total=lambda x: x["total"].astype("double"))
    return g.sort_values("l_returnflag").to_spark()


@query(
    "range_interval_join",
    oracle="""
    SELECT o_orderkey, tier, CAST(COUNT(*) OVER () AS BIGINT) AS total
    FROM orders JOIN (VALUES ('low', 0.0, 100000.0), ('mid', 100000.0, 300000.0),
                             ('high', 300000.0, 1e12)) t(tier, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    """,
)
def range_interval_join(spark, sf_dir):
    """Interval matching (IntervalTree analog, SURVEY §2.3) via
    broadcast conditional join."""
    import go_pandas_spark as gp
    from ..operators.joins import range_join
    from ..frame import Frame

    od = load(spark, sf_dir, "orders")
    tiers = Frame(spark.createDataFrame(
        [("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0), ("high", 300000.0, 1e12)],
        "tier string, lo double, hi double"))
    j = range_join(od, tiers, value_col="o_totalprice", lo_col="lo", hi_col="hi")
    sdf = j[["o_orderkey", "tier"]].to_spark()
    from pyspark.sql import Window as W

    return sdf.withColumn("total", F.count(F.lit(1)).over(W.partitionBy()))


@query(
    "timedelta_arithmetic",
    oracle="""
    SELECT o_orderpriority,
           ROUND(AVG(date_diff('second', o_orderdate, l_shipdate) / 86400.0), 6) AS avg_latency_days,
           CAST(MAX(date_diff('second', o_orderdate, l_shipdate)) AS BIGINT) AS max_latency_sec
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def timedelta_arithmetic(spark, sf_dir):
    """timedelta64 analog: timestamp differences as numeric durations
    (SURVEY §1.3 maps timedelta64[ns] -> DayTimeInterval / long µs)."""
    od = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    j = od.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    lat_sec = (j["l_shipdate"]._with_scol(F.unix_seconds(j["l_shipdate"]._scol.cast("timestamp")))
               - j["o_orderdate"]._with_scol(F.unix_seconds(j["o_orderdate"]._scol.cast("timestamp"))))
    j = j.assign(lat_sec=lat_sec, lat_days=lat_sec / 86400.0)
    g = j.groupby("o_orderpriority", as_index=False).agg(
        avg_latency_days=("lat_days", "mean"), max_latency_sec=("lat_sec", "max"))
    g = g.assign(avg_latency_days=lambda x: x["avg_latency_days"].round(6))
    return g.sort_values("o_orderpriority").to_spark()


@query(
    "iloc_positional_slice",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM (
      SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice,
             ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn BETWEEN 11 AND 25
    """,
)
def iloc_positional_slice(spark, sf_dir):
    """iloc rows 10:25 of the sorted frame (positional contract)."""
    od = load(spark, sf_dir, "orders").sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True])
    s = od.iloc_slice(10, 25)
    s = s.assign(o_totalprice=s["o_totalprice"].round(2))
    return s[["o_orderkey", "o_totalprice"]].to_spark()


@query(
    "groupby_resample",
    oracle=f"""
    SELECT user_id, date_trunc('hour', {TS}) AS ts,
           ROUND(SUM(value), 6) AS v_sum, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY user_id, date_trunc('hour', {TS})
    ORDER BY user_id, ts
    """,
)
def groupby_resample(spark, sf_dir):
    """df.groupby(k).resample(f) — grouped time-bin agg, one shuffle."""
    ev = load(spark, sf_dir, "events")
    r = ev.groupby("user_id").resample("1h", on="ts").agg(
        {"v_sum": ("value", "sum"), "n": ("event_id", "count")})
    r = r.assign(v_sum=r["v_sum"].round(6))
    return r[["user_id", "ts", "v_sum", "n"]].to_spark()


@query(
    "tshift_duration",
    oracle=f"""
    SELECT event_id, {TS} + INTERVAL 90 MINUTE AS shifted
    FROM events
    """,
)
def tshift_duration(spark, sf_dir):
    """tshift analog: timestamp + fixed duration (``generic.py:8617``)."""
    ev = load(spark, sf_dir, "events")
    out = ev.assign(shifted=ev["ts"].dt.add_duration("90min"))
    return out[["event_id", "shifted"]].to_spark()


def _integrate_f(row):
    """The reference's enhancingperf.rst:38 kernel, verbatim shape:
    Riemann sum of f(x) = x*(x-1) over [a, b) in N steps."""
    a, b, n = row["a"], row["b"], int(row["n"])
    s = 0.0
    dx = (b - a) / n
    for i in range(n):
        x = a + i * dx
        s += x * (x - 1)
    return s * dx


@query(
    "rowwise_udf_integrate",
    oracle="""
    WITH f AS (
      SELECT l_orderkey, l_linenumber, l_discount AS a, l_tax AS b,
             CAST(trunc(l_quantity * 20) AS INT) AS n
      FROM lineitem WHERE l_orderkey % 16 = 0)
    SELECT l_orderkey, l_linenumber,
           ROUND(list_sum(list_transform(generate_series(0, n - 1),
                 i -> (a + i * ((b - a) / n)) * (a + i * ((b - a) / n) - 1)))
                 * ((b - a) / n), 6) + 0.0 AS result
    FROM f
    """,
)
def rowwise_udf_integrate(spark, sf_dir):
    """BASELINE.md anchor: df.apply(integrate_f, axis=1) = 174 ms per
    1,000 rows in the reference (enhancingperf.rst:81). Same per-row
    Python work here, Arrow-batched and fanned out across cores —
    bench.py reports rows/s to compare against the reference's 5.7k
    rows/s single-thread. The Riemann sum is closed-form in SQL
    (generate_series fold), so the UDF surface is value-verified."""
    li = load(spark, sf_dir, "lineitem")
    f = li[li["l_orderkey"] % 16 == 0]
    f = f.assign(a=f["l_discount"], b=f["l_tax"], n=(f["l_quantity"] * 20).astype("int"))
    res = f.apply(_integrate_f, columns=["a", "b", "n"])
    out = f.assign(result=res)[["l_orderkey", "l_linenumber", "result"]]
    # + 0.0 collapses IEEE -0.0 to +0.0 (bit-level hash parity), both
    # here and in the oracle SQL
    return out.to_spark().withColumn("result", F.round("result", 6) + F.lit(0.0))


@query(
    "dup_label_pipeline",
    oracle="""
    SELECT o_orderkey AS okey,
           o_totalprice AS price_a,
           o_totalprice * 0.5 AS price_b,
           o_totalprice + o_totalprice * 0.5 AS tot
    FROM orders
    WHERE o_orderkey % 8 = 0
    """,
)
def dup_label_pipeline(spark, sf_dir):
    """Duplicate column labels end-to-end (r11; reference frame.py
    getitem + managers.py:1947 allow duplicates everywhere): rename
    onto a collision creates a dup-labeled frame, getitem of the dup
    label returns BOTH occurrences, list selection keeps them,
    set_axis escapes back to unique labels positionally, and ordinary
    arithmetic resumes. All metadata-layer work — the physical plan
    is one scan + projections, no shuffle."""
    od = load(spark, sf_dir, "orders")
    f = od[od["o_orderkey"] % 8 == 0][["o_orderkey", "o_totalprice"]]
    f = f.assign(p2=f["o_totalprice"] * 0.5)
    g = f.rename(columns={"p2": "o_totalprice"})   # duplicate labels
    assert g.columns == ["o_orderkey", "o_totalprice", "o_totalprice"]
    both = g["o_totalprice"]                       # Frame of 2 columns
    assert both.columns == ["o_totalprice", "o_totalprice"]
    sel = g[["o_orderkey", "o_totalprice"]]        # 3 columns (dup kept)
    esc = sel.set_axis(["okey", "price_a", "price_b"], axis=1)
    out = esc.assign(tot=esc["price_a"] + esc["price_b"])
    return out[["okey", "price_a", "price_b", "tot"]].to_spark()


@query(
    "dup_label_agg",
    oracle="""
    SELECT * FROM (
      SELECT 0 AS occurrence, 'l_quantity' AS label,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
             CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
             CAST(MAX(l_quantity) AS DOUBLE) AS max_v,
             COUNT(l_quantity) AS cnt
      FROM lineitem
      UNION ALL
      SELECT 1, 'l_extendedprice',
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
             CAST(MIN(l_extendedprice) AS DOUBLE),
             CAST(MAX(l_extendedprice) AS DOUBLE),
             COUNT(l_extendedprice)
      FROM lineitem
      UNION ALL
      SELECT 2, 'l_quantity',
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE),
             CAST(MIN(l_quantity) AS DOUBLE),
             CAST(MAX(l_quantity) AS DOUBLE),
             COUNT(l_quantity)
      FROM lineitem
    ) t ORDER BY occurrence
    """,
)
def dup_label_agg(spark, sf_dir):
    """Whole-frame reductions on a duplicate-labeled frame (r12;
    reference generic.py:9576 _add_numeric_operations iterates columns
    POSITIONALLY, so df.sum() on dup labels aggregates each occurrence
    separately under its repeated label). The heavy aggregation runs
    as ONE Spark agg job over unique physical columns; decimal sums
    keep the money totals engine-exact."""
    li = load(spark, sf_dir, "lineitem")
    dup = li[["l_quantity", "l_extendedprice", "l_quantity"]] \
        .astype("decimal(18,2)")
    assert dup.columns == ["l_quantity", "l_extendedprice", "l_quantity"]
    s, mn, mx, c = dup.sum(), dup.min(), dup.max(), dup.count()
    assert list(s.index) == dup.columns  # labels repeat, per occurrence
    rows = [(i, str(lab), float(s.iloc[i]), float(mn.iloc[i]),
             float(mx.iloc[i]), int(c.iloc[i]))
            for i, lab in enumerate(s.index)]
    return spark.createDataFrame(
        rows, "occurrence int, label string, sum_v double, min_v double, "
              "max_v double, cnt bigint")


@query(
    "dup_label_merge",
    oracle="""
    SELECT o_orderpriority AS pri,
           COUNT(l_quantity) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_tp,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_tp2
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY pri ORDER BY pri
    """,
)
def dup_label_merge(spark, sf_dir):
    """merge() with a duplicate-labeled INPUT (r12; reference
    merge.py:38 + managers.py:1947 tolerate dup non-key columns):
    the left frame carries o_totalprice twice, the join key stays a
    unique label, both occurrences flow through the join and then
    aggregate identically. Physically one shuffled hash join on the
    key — the dup layer is metadata only."""
    od = load(spark, sf_dir, "orders")[
        ["o_orderkey", "o_orderpriority", "o_totalprice", "o_totalprice"]]
    assert od.columns.count("o_totalprice") == 2
    li = load(spark, sf_dir, "lineitem")[["l_orderkey", "l_quantity"]]
    m = od.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    m2 = m.set_axis(["okey", "pri", "tp1", "tp2", "lkey", "qty"], axis=1) \
        .astype({"tp1": "decimal(18,2)", "tp2": "decimal(18,2)",
                 "qty": "decimal(18,2)"})
    g = m2.groupby("pri", as_index=False).agg(
        n=("qty", "count"), sum_qty=("qty", "sum"),
        sum_tp=("tp1", "sum"), sum_tp2=("tp2", "sum"))
    g = g.astype({"sum_qty": "double", "sum_tp": "double",
                  "sum_tp2": "double"})
    return g.sort_values("pri").to_spark()


@query(
    "multiindex3_unstack",
    oracle="""
    SELECT CAST(l_linenumber % 3 AS BIGINT) AS lb, l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "O"
    FROM lineitem
    GROUP BY lb, l_returnflag ORDER BY lb, l_returnflag
    """,
)
def multiindex3_unstack(spark, sf_dir):
    """3-level row MultiIndex chain (r12; reference multi.py:122 +
    reshape.py:362 _Unstacker take any depth): 3-key groupby ->
    unstack(BY NAME) -> swaplevel(names) -> sort_index(level=names)
    -> reset_index. One hash aggregation + one pivot — the level
    machinery is all metadata over the __index_i__ columns."""
    li = load(spark, sf_dir, "lineitem")
    f = li.assign(lb=(li["l_linenumber"] % 3).astype("bigint"),
                  qty=li["l_quantity"].astype("decimal(18,2)"))
    g = f.groupby(["l_returnflag", "lb", "l_linestatus"]).agg(
        sum_qty=("qty", "sum"))
    w = (g.unstack("l_linestatus")              # level by NAME, depth 3
          .swaplevel("l_returnflag", "lb")      # names, not positions
          .sort_index(level=["lb", "l_returnflag"]))
    out = w.reset_index().astype({"F": "double", "O": "double"})
    return out.to_spark()


@query(
    "dup_tuple_concat",
    oracle="""
    SELECT c_nationkey,
           CAST(2 * SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                FILTER (c_mktsegment = 'BUILDING') AS DOUBLE) AS bal_building_2x,
           CAST(2 * SUM(CAST(c_acctbal AS DECIMAL(18,2)))
                FILTER (c_mktsegment = 'MACHINERY') AS DOUBLE) AS bal_machinery_2x
    FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def dup_tuple_concat(spark, sf_dir):
    """Duplicate TUPLE labels in MultiIndex columns (r13; reference
    indexes/multi.py:122 codes allow repeated tuples): concat(axis=1)
    of two frames sharing a (value, category) column MultiIndex keeps
    the dup tuples, tuple getitem returns every occurrence, partial
    outer-level selection yields a dup-labeled flat frame, and
    set_axis escapes positionally back to unique labels. The plan is
    one hash-agg + one pivot shuffle + a self-join on the index key —
    the dup layer itself is pure projections."""
    import go_pandas_spark as gp

    cu = load(spark, sf_dir, "customer")
    sub = cu[cu["c_mktsegment"].isin(["BUILDING", "MACHINERY"])]
    sub = sub.assign(bal=sub["c_acctbal"].astype("decimal(18,2)"))
    long = sub.groupby(["c_nationkey", "c_mktsegment"], as_index=False).agg(
        bal=("bal", "sum"), n=("c_custkey", "count"))
    from go_pandas_spark.operators.reshape import unstack
    wide = unstack(long, "c_mktsegment", ["bal", "n"], "c_nationkey")
    both = gp.concat([wide, wide], axis=1)
    labs = both.column_labels
    assert labs.count(("bal", "BUILDING")) == 2, labs
    pair = both[("bal", "BUILDING")]           # Frame of both occurrences
    assert pair.column_labels == [("bal", "BUILDING")] * 2
    bal = both["bal"]                          # dup-labeled flat frame
    assert bal.columns == ["BUILDING", "MACHINERY"] * 2
    esc = bal.set_axis(["b1", "m1", "b2", "m2"], axis=1)
    out = esc.assign(bal_building_2x=(esc["b1"] + esc["b2"]).astype("double"),
                     bal_machinery_2x=(esc["m1"] + esc["m2"]).astype("double"))
    out = out.reset_index()
    return out[["c_nationkey", "bal_building_2x", "bal_machinery_2x"]] \
        .sort_values("c_nationkey").to_spark()
