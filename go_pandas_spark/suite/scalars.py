"""Scalar-function surface: .str accessor, .dt accessor, calendar
offsets, JSON extraction (§2.9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, query
from .windows import TS


@query(
    "string_methods_battery",
    oracle="""
    SELECT doc_id,
           upper(text) AS up,
           lower(text) AS lo,
           CAST(length(text) AS INT) AS n,
           contains(text, 'data') AS has_data,
           starts_with(text, 'the') AS starts_the,
           ends_with(text, 'join') AS ends_join,
           regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
           substring(text, 3, 8) AS sliced,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           string_split(text, ' ')[2] AS second_word,
           regexp_extract(text, '[a-z]+a[a-z]*') AS first_a_word,
           CAST(length(text) - length(replace(text, ' ', '')) AS INT) AS n_spaces,
           trim(concat('  ', text, '  ')) AS stripped,
           reverse(text) AS rev,
           translate(text, 'abc', 'xyz') AS translated
    FROM documents
    """,
)
def string_methods_battery(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    t = d["text"]
    out = d.assign(
        up=t.str.upper(),
        lo=t.str.lower(),
        n=t.str.len(),
        has_data=t.str.contains("data", regex=False),
        starts_the=t.str.startswith("the"),
        ends_join=t.str.endswith("join"),
        devoweled=t.str.replace("[aeiou]", "_"),
        sliced=t.str.slice(2, 10),
        padded_id=d["doc_id"].astype("string").str.zfill(8),
        second_word=t.str.split(" ", regex=False).str.get(1),
        first_a_word=t.str.extract("([a-z]+a[a-z]*)", 1),
        n_spaces=(t.str.len() - t.str.replace(" ", "", regex=False).str.len()),
        stripped=t._with_scol(F.concat(F.lit("  "), t._scol, F.lit("  "))).str.strip(),
        rev=t._with_scol(F.reverse(t._scol)),
        translated=t.str.translate({"a": "x", "b": "y", "c": "z"}),
    )
    return out[["doc_id", "up", "lo", "n", "has_data", "starts_the", "ends_join",
                "devoweled", "sliced", "padded_id", "second_word", "first_a_word",
                "n_spaces", "stripped", "rev", "translated"]].to_spark()


@query(
    "string_count_findall",
    oracle="""
    SELECT doc_id,
           CAST(length(regexp_extract_all(text, 'data')) AS INT) AS n_data,
           regexp_extract_all(text, '\\b[a-z]{4}\\b')[1] AS first_4letter,
           CAST(length(string_split(text, ' ')) AS INT) AS n_words
    FROM documents
    """,
)
def string_count_findall(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    t = d["text"]
    out = d.assign(
        n_data=t.str.count("data"),
        first_4letter=t.str.findall(r"\b[a-z]{4}\b").str.get(0),
        n_words=t._with_scol(F.size(F.split(t._scol, " "))),
    )
    return out[["doc_id", "n_data", "first_4letter", "n_words"]].to_spark()


@query(
    "datetime_fields_battery",
    oracle=f"""
    SELECT event_id,
           CAST(year({TS}) AS INT) AS y,
           CAST(month({TS}) AS INT) AS mo,
           CAST(day({TS}) AS INT) AS d,
           CAST(hour({TS}) AS INT) AS h,
           CAST(minute({TS}) AS INT) AS mi,
           CAST(second({TS}) AS INT) AS s,
           CAST((dayofweek({TS}) + 6) % 7 AS INT) AS dow,
           CAST(dayofyear({TS}) AS INT) AS doy,
           CAST(quarter({TS}) AS INT) AS q,
           CAST(weekofyear({TS}) AS INT) AS woy,
           CAST(day(last_day({TS})) AS INT) AS dim,
           (day({TS}) = 1) AS is_mstart,
           (CAST({TS} AS DATE) = last_day({TS})) AS is_mend,
           date_trunc('day', {TS}) AS normalized,
           strftime({TS}, '%Y-%m-%d %H:%M') AS formatted
    FROM events
    """,
)
def datetime_fields_battery(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    ts = ev["ts"]
    out = ev.assign(
        y=ts.dt.year, mo=ts.dt.month, d=ts.dt.day, h=ts.dt.hour,
        mi=ts.dt.minute, s=ts.dt.second, dow=ts.dt.dayofweek,
        doy=ts.dt.dayofyear, q=ts.dt.quarter, woy=ts.dt.week,
        dim=ts.dt.days_in_month,
        is_mstart=ts.dt.is_month_start,
        is_mend=ts.dt.is_month_end,
        normalized=ts.dt.normalize(),
        formatted=ts.dt.strftime("%Y-%m-%d %H:%M"),
    )
    return out[["event_id", "y", "mo", "d", "h", "mi", "s", "dow", "doy", "q",
                "woy", "dim", "is_mstart", "is_mend", "normalized", "formatted"]].to_spark()


@query(
    "datetime_floor_round",
    oracle=f"""
    SELECT event_id,
           date_trunc('minute', {TS}) AS floor_min,
           make_timestamp(CAST(floor(epoch({TS}) / 900) * 900 AS BIGINT) * 1000000) AS floor_15min,
           make_timestamp(CAST(ceil(epoch_us({TS}) / 3600000000.0) * 3600 AS BIGINT) * 1000000) AS ceil_hour
    FROM events
    """,
)
def datetime_floor_round(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    ts = ev["ts"]
    out = ev.assign(
        floor_min=ts.dt.floor("min"),
        floor_15min=ts._with_scol(
            F.timestamp_seconds(
                F.floor(F.unix_micros(ts._scol.cast("timestamp")) / 900_000_000) * 900)),
        ceil_hour=ts.dt.ceil("1h"),
    )
    return out[["event_id", "floor_min", "floor_15min", "ceil_hour"]].to_spark()


@query(
    "calendar_offsets",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN CAST(o_orderdate AS DATE) = last_day(o_orderdate)
                THEN last_day(o_orderdate + INTERVAL 1 MONTH)
                ELSE last_day(o_orderdate) END AS next_month_end,
           CAST(date_trunc('month', o_orderdate + INTERVAL 2 MONTH) AS DATE) AS in2_month_begin,
           CASE WHEN CAST(o_orderdate AS DATE)
                     = last_day(date_trunc('quarter', o_orderdate) + INTERVAL 2 MONTH)
                THEN last_day(date_trunc('quarter', o_orderdate) + INTERVAL 5 MONTH)
                ELSE last_day(date_trunc('quarter', o_orderdate) + INTERVAL 2 MONTH)
           END AS quarter_end,
           CAST(o_orderdate + INTERVAL 14 DAY AS DATE) AS in2_weeks
    FROM orders
    """,
)
def calendar_offsets(spark, sf_dir):
    """MonthEnd/MonthBegin/QuarterEnd/Week offset arithmetic
    (``pandas/tseries/offsets.py`` — SURVEY §2.9 hard case)."""
    import go_pandas_spark as gp

    od = load(spark, sf_dir, "orders")
    d = od["o_orderdate"]
    out = od.assign(
        next_month_end=d._with_scol(gp.add_offset(d._scol, 1, "M")),
        in2_month_begin=d._with_scol(gp.add_offset(d._scol, 2, "MS")),
        quarter_end=d._with_scol(gp.add_offset(d._scol, 1, "Q")),
        in2_weeks=d._with_scol(gp.add_offset(d._scol, 2, "W")),
    )
    return out[["o_orderkey", "next_month_end", "in2_month_begin", "quarter_end", "in2_weeks"]].to_spark()


@query(
    "business_day_add",
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             CASE WHEN (dayofweek(o_orderdate) + 6) % 7 = 5 THEN CAST(o_orderdate AS DATE) - 1
                  WHEN (dayofweek(o_orderdate) + 6) % 7 = 6 THEN CAST(o_orderdate AS DATE) - 2
                  ELSE CAST(o_orderdate AS DATE) END AS start
      FROM orders)
    SELECT o_orderkey,
           CASE WHEN (dayofweek(start) + 6) % 7 + 2 >= 5
                THEN start + CAST(7 * floor(7/5) + 7 % 5 AS INT) + 2
                ELSE start + CAST(7 * floor(7/5) + 7 % 5 AS INT) END AS plus7bd
    FROM base
    """,
)
def business_day_add(spark, sf_dir):
    """BusinessDay(7) arithmetic (``offsets.py:445``) — closed-form
    weekday expression, holiday-free calendar."""
    import go_pandas_spark as gp

    od = load(spark, sf_dir, "orders")
    d = od["o_orderdate"]
    out = od.assign(plus7bd=d._with_scol(gp.add_offset(d._scol, 7, "B")))
    return out[["o_orderkey", "plus7bd"]].to_spark()


@query(
    "to_datetime_parse",
    oracle=f"""
    SELECT event_id,
           strptime(strftime({TS}, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS reparsed,
           CASE WHEN event_id % 10 = 0 THEN NULL
                ELSE strptime(strftime({TS}, '%d/%m/%Y'), '%d/%m/%Y') END AS custom_fmt
    FROM events
    """,
)
def to_datetime_parse(spark, sf_dir):
    """to_datetime round trip + errors='coerce' NULL behavior."""
    import go_pandas_spark as gp

    ev = load(spark, sf_dir, "events")
    ts = ev["ts"]
    s1 = ts.dt.strftime("%Y-%m-%d %H:%M:%S")
    s2 = ts.dt.strftime("%d/%m/%Y").where(ev["event_id"] % 10 != 0, "not a date")
    out = ev.assign(
        reparsed=gp.to_datetime(s1, "%Y-%m-%d %H:%M:%S"),
        custom_fmt=gp.to_datetime(s2, "%d/%m/%Y"),
    )
    return out[["event_id", "reparsed", "custom_fmt"]].to_spark()


@query(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS absent
    FROM events
    """,
)
def json_extract_props(spark, sf_dir):
    """json_normalize analog: get_json_object projections (§2.9)."""
    import go_pandas_spark as gp

    ev = load(spark, sf_dir, "events")
    n = gp.json_normalize(ev, "props", ["k", "missing"])
    out = n.assign(
        k_str=n["k"],
        k_int=n["k"].astype("int64"),
        absent=n["missing"],
    )
    return out[["event_id", "k_str", "k_int", "absent"]].to_spark()


@query(
    "custom_business_day_holidays",
    oracle="""
    WITH cal AS (
      SELECT CAST(d AS DATE) AS cal_date,
             CASE WHEN dayofweek(d) BETWEEN 1 AND 5
                       AND CAST(d AS DATE) NOT IN
                           (DATE '1997-01-01', DATE '1997-07-04', DATE '1997-12-25')
                  THEN 1 ELSE 0 END AS is_bd
      FROM generate_series(DATE '1994-11-01', DATE '2002-05-01', INTERVAL 1 DAY) t(d)),
    c2 AS (SELECT cal_date, is_bd, SUM(is_bd) OVER (ORDER BY cal_date) AS bd_le FROM cal),
    bds AS (SELECT bd_le AS bd_ord, cal_date AS bd_date FROM c2 WHERE is_bd = 1)
    SELECT o.o_orderkey, CAST(b.bd_date AS TIMESTAMP) AS due_date
    FROM orders o
    JOIN c2 ON CAST(o.o_orderdate AS DATE) = c2.cal_date
    JOIN bds b ON c2.bd_le + 5 = b.bd_ord
    """,
)
def custom_business_day_holidays(spark, sf_dir):
    """CustomBusinessDay(5, holidays) — calendar-table broadcast joins
    (offsets.py:792 / tseries/holiday.py analog, SURVEY §2.9). The fact
    side never shuffles: both calendar joins are broadcasts."""
    import go_pandas_spark as gp

    od = load(spark, sf_dir, "orders")[["o_orderkey", "o_orderdate"]]
    out = gp.custom_business_day_add(
        od, "o_orderdate", 5,
        holidays=["1997-01-01", "1997-07-04", "1997-12-25"], new_col="due_date")
    return out[["o_orderkey", "due_date"]].to_spark()


@query(
    "period_monthly_rollup",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS period,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY period ORDER BY period
    """,
)
def period_monthly_rollup(spark, sf_dir):
    """PeriodIndex-style monthly rollup: dt.to_period('M') labels as
    the grouping key (core/arrays/period.py:100 analog — string-label
    delta documented in the accessor)."""
    od = load(spark, sf_dir, "orders")
    od = od.assign(period=od["o_orderdate"].dt.to_period("M"),
                   price_d=od["o_totalprice"].astype("decimal(18,6)"))
    g = od.groupby("period", as_index=False).agg(total=("price_d", "sum"),
                                                 n=("o_orderkey", "count"))
    g = g.assign(total=lambda x: x["total"].astype("double"))
    return g.sort_values("period").to_spark()


_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


@query(
    "string_extended_battery",
    oracle=f"""
    SELECT doc_id,
           translate(text, '{_ASCII_LOWER}{_ASCII_UPPER}', '{_ASCII_UPPER}{_ASCII_LOWER}') AS swapped,
           regexp_matches(text, '^[^a-zA-Z]*([A-Z][a-z]*[^a-zA-Z]*)+$') AS titled,
           regexp_matches(text, '^[0-9]+$') AS decimal_only,
           CASE WHEN len(string_split(text, 'data')) > 1
                THEN CAST(length(text) - length(list_extract(string_split(text, 'data'), -1)) - 4 AS INT)
                ELSE -1 END AS rfind_data,
           CASE WHEN strpos(text, ' ') > 0 THEN split_part(text, ' ', 1) ELSE text END AS part_head,
           CASE WHEN strpos(text, ' ') > 0 THEN substr(text, strpos(text, ' ') + 1) ELSE '' END AS part_tail,
           list_extract(string_split(text, ' '), -1) AS rpart_tail,
           array_to_string(string_split(text, ' '), '-') AS joined,
           CASE WHEN starts_with(text, 'the ') THEN substr(text, 5) ELSE text END AS no_the,
           CASE WHEN ends_with(text, 'data') THEN substr(text, 1, length(text) - 4) ELSE text END AS no_data
    FROM documents
    """,
)
def string_extended_battery(spark, sf_dir):
    """The .str completion sweep (strings.py:1177-1630): swapcase,
    istitle, isdecimal, rfind, partition/rpartition, join,
    removeprefix/removesuffix — every one a JVM expression."""
    d = load(spark, sf_dir, "documents")
    t = d["text"]
    part = t.str.partition(" ")
    rpart = t.str.rpartition(" ")
    out = d.assign(
        swapped=t.str.swapcase(),
        titled=t.str.istitle(),
        decimal_only=t.str.isdecimal(),
        rfind_data=t.str.rfind("data").astype("int32"),
        part_head=part.str.get(0),
        part_tail=part.str.get(2),
        rpart_tail=rpart.str.get(2),
        joined=t.str.split(" ", regex=False).str.join("-"),
        no_the=t.str.removeprefix("the "),
        no_data=t.str.removesuffix("data"),
    )
    return out[["doc_id", "swapped", "titled", "decimal_only", "rfind_data",
                "part_head", "part_tail", "rpart_tail", "joined",
                "no_the", "no_data"]].to_spark()


@query(
    "exotic_offsets",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderdate AS d,
             date_trunc('month', o_orderdate) AS fd
      FROM orders),
    wom AS (
      SELECT o_orderkey, d,
             fd + to_days((CAST((4 - (dayofweek(fd) + 6) % 7 + 7) % 7 AS INT) + 14)) AS a0,
             date_trunc('month', d + INTERVAL 1 MONTH) AS fd2
      FROM base)
    SELECT w.o_orderkey,
           CAST(CASE WHEN CAST(d AS DATE) = last_day(d)
                     THEN date_trunc('month', d + INTERVAL 1 MONTH) + INTERVAL 14 DAY
                     WHEN day(d) >= 15 THEN CAST(last_day(d) AS TIMESTAMP)
                     ELSE date_trunc('month', d) + INTERVAL 14 DAY END AS TIMESTAMP) AS sme,
           CAST(CASE WHEN a0 > CAST(d AS TIMESTAMP) THEN a0
                     ELSE fd2 + to_days(CAST((4 - (dayofweek(fd2) + 6) % 7 + 7) % 7 AS INT) + 14) END
                AS TIMESTAMP) AS third_friday
    FROM wom w
    """,
)
def exotic_offsets(spark, sf_dir):
    """SemiMonthEnd + WeekOfMonth(3rd Friday) closed-form offset
    arithmetic (offsets.py:1136, :1383) — anchor-index expressions,
    no calendar table. Easter/BusinessHour/FY5253 are pd-diff-tested
    (no tractable SQL oracle)."""
    od = load(spark, sf_dir, "orders")
    d = od["o_orderdate"]
    out = od.assign(
        sme=d.dt.add_offset(1, "SM"),
        third_friday=d.dt.add_offset(1, "WOM-3FRI"),
    )
    return out[["o_orderkey", "sme", "third_friday"]].to_spark()
