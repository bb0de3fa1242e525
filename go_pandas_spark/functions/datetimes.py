"""`.dt` accessor, to_datetime, date_range, calendar offsets.

Reference parity: accessor ``pandas/core/indexes/accessors.py:117``,
field kernels ``core/arrays/datetimes.py:1064+``, ``to_datetime``
``core/tools/datetimes.py:373``, offsets ``pandas/tseries/offsets.py``
(MonthEnd:918, Week:1254, QuarterEnd:1608, BusinessDay:445).

Semantic deltas (deliberate, SURVEY §1.3): timestamps are µs
precision (ns truncates); tz is the session zone (UTC) with
tz_localize/tz_convert as explicit conversions.

Calendar-offset arithmetic has no Spark builtin — implemented as an
expression library over add_months / last_day / next_day / dayofweek
arithmetic (SURVEY §2.9 "Datetime").
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


class DatetimeMethods:
    def __init__(self, series):
        self._s = series

    def _w(self, col: Column):
        return self._s._with_scol(col)

    @property
    def _c(self) -> Column:
        return self._s._scol

    # fields -----------------------------------------------------------
    @property
    def year(self):
        return self._w(F.year(self._c))

    @property
    def month(self):
        return self._w(F.month(self._c))

    @property
    def day(self):
        return self._w(F.dayofmonth(self._c))

    @property
    def hour(self):
        return self._w(F.hour(self._c))

    @property
    def minute(self):
        return self._w(F.minute(self._c))

    @property
    def second(self):
        return self._w(F.second(self._c))

    @property
    def microsecond(self):
        return self._w((F.unix_micros(self._c.cast("timestamp")) % 1_000_000).cast("int"))

    @property
    def dayofweek(self):
        # pandas: Monday=0 … Sunday=6; Spark dayofweek: Sunday=1 … Saturday=7
        return self._w(((F.dayofweek(self._c) + 5) % 7).cast("int"))

    weekday = dayofweek

    @property
    def dayofyear(self):
        return self._w(F.dayofyear(self._c))

    @property
    def quarter(self):
        return self._w(F.quarter(self._c))

    @property
    def days_in_month(self):
        return self._w(F.dayofmonth(F.last_day(self._c)))

    daysinmonth = days_in_month

    @property
    def week(self):
        return self._w(F.weekofyear(self._c))

    weekofyear = week

    @property
    def date(self):
        return self._w(F.to_date(self._c))

    @property
    def is_month_start(self):
        return self._w(F.dayofmonth(self._c) == 1)

    @property
    def is_month_end(self):
        return self._w(F.to_date(self._c) == F.last_day(self._c))

    @property
    def is_quarter_start(self):
        return self._w((F.dayofmonth(self._c) == 1) & (F.month(self._c).isin(1, 4, 7, 10)))

    @property
    def is_quarter_end(self):
        return self._w((F.to_date(self._c) == F.last_day(self._c)) & (F.month(self._c).isin(3, 6, 9, 12)))

    @property
    def is_year_start(self):
        return self._w((F.dayofmonth(self._c) == 1) & (F.month(self._c) == 1))

    @property
    def is_year_end(self):
        return self._w((F.month(self._c) == 12) & (F.dayofmonth(self._c) == 31))

    @property
    def is_leap_year(self):
        y = F.year(self._c)
        return self._w(((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0))

    # transforms ---------------------------------------------------------
    def normalize(self):
        return self._w(F.date_trunc("day", self._c))

    def floor(self, freq: str):
        return self._w(F.date_trunc(_freq_to_trunc(freq), self._c))

    def ceil(self, freq: str):
        from ..window import offset_to_us

        us = offset_to_us(_norm_freq(freq))
        e = F.unix_micros(self._c.cast("timestamp"))
        return self._w(F.timestamp_micros(((e + us - 1) / us).cast("long") * us))

    def round(self, freq: str):
        from ..window import offset_to_us

        us = offset_to_us(_norm_freq(freq))
        e = F.unix_micros(self._c.cast("timestamp"))
        return self._w(F.timestamp_micros(F.round(e / us).cast("long") * us))

    def strftime(self, fmt: str):
        return self._w(F.date_format(self._c, strftime_to_spark(fmt)))

    def tz_localize(self, tz: str):
        return self._w(F.to_utc_timestamp(self._c, tz))

    def tz_convert(self, tz: str):
        return self._w(F.from_utc_timestamp(self._c, tz))

    def add_duration(self, offset: str):
        """tshift analog for fixed-tick offsets: ts + n*freq
        (``generic.py:8617``) as µs arithmetic."""
        from ..window import offset_to_us

        us = offset_to_us(offset if offset[0].isdigit() else "1" + offset)
        return self._w(F.timestamp_micros(F.unix_micros(self._c.cast("timestamp")) + us))

    def to_period(self, freq: str = "M"):
        """Period labels (``core/arrays/period.py:100``). Deliberate
        delta (SURVEY §1.3): periods are canonical STRING labels, not a
        Period dtype — the dominant use (group by month/quarter/year)
        needs only a stable label; ordinal arithmetic stays on the
        timestamp via ``add_offset``."""
        f = freq.upper()
        if f == "M":
            return self._w(F.date_format(self._c, "yyyy-MM"))
        if f == "Q":
            return self._w(F.concat(F.year(self._c).cast("string"), F.lit("Q"),
                                    F.quarter(self._c).cast("string")))
        if f in ("Y", "A"):
            return self._w(F.year(self._c).cast("string"))
        if f == "D":
            return self._w(F.date_format(self._c, "yyyy-MM-dd"))
        if f == "H":
            return self._w(F.date_format(self._c, "yyyy-MM-dd HH:00"))
        raise ValueError(f"to_period: unsupported freq {freq!r}")

    # offset arithmetic ---------------------------------------------------
    def add_offset(self, n: int, freq: str):
        """``ts + n * offset`` for the calendar offsets of
        ``pandas/tseries/offsets.py`` — pure expressions."""
        return self._w(add_offset(self._c, n, freq))


def _norm_freq(freq: str) -> str:
    return freq if freq[0].isdigit() else "1" + freq


_TRUNC = {"d": "day", "h": "hour", "min": "minute", "t": "minute", "s": "second",
          "m": "month", "w": "week", "q": "quarter", "y": "year", "a": "year"}


def _freq_to_trunc(freq: str) -> str:
    return _TRUNC.get(freq.lower(), freq)


_STRF = [("%Y", "yyyy"), ("%y", "yy"), ("%m", "MM"), ("%d", "dd"), ("%H", "HH"),
         ("%I", "hh"), ("%M", "mm"), ("%S", "ss"), ("%f", "SSSSSS"), ("%j", "DDD"),
         ("%a", "EEE"), ("%A", "EEEE"), ("%b", "MMM"), ("%B", "MMMM"), ("%p", "a"),
         ("%%", "%")]


def strftime_to_spark(fmt: str) -> str:
    for k, v in _STRF:
        fmt = fmt.replace(k, v)
    return fmt


def add_offset(c: Column, n: int, freq: str) -> Column:
    """Calendar-offset arithmetic (MonthEnd/MonthBegin/QuarterEnd/
    YearEnd/Week/BusinessDay…) as JVM expressions. Results are
    timestamps: pandas offset arithmetic on datetime64 stays
    datetime64 (midnight-anchored), never a bare date."""
    f = freq.lower()
    out = None
    if f in ("m", "monthend"):
        # pandas MonthEnd: roll forward to month end, n-1 more months if
        # already at month end
        at_end = F.to_date(c) == F.last_day(c)
        months = F.when(at_end, n).otherwise(n - 1)
        out = F.last_day(F.add_months(c, months))
    elif f in ("ms", "monthbegin"):
        # n>0: truncating after the month add lands on the n-th next
        # month begin whether or not we start on a begin.
        out = F.trunc(F.add_months(c, n), "month")
    elif f in ("q", "quarterend"):
        out = F.last_day(F.add_months(F.date_trunc("quarter", c), 3 * n - 1))
    elif f in ("y", "a", "yearend"):
        out = F.last_day(F.add_months(F.date_trunc("year", c), 12 * n - 1))
    elif f in ("w", "week"):
        out = F.date_add(F.to_date(c), 7 * n)
    elif f in ("d", "day"):
        out = F.date_add(F.to_date(c), n)
    elif f in ("b", "businessday"):
        out = add_business_days(c, n)
    else:
        raise ValueError(f"unsupported offset {freq!r}")
    return out.cast("timestamp")


def add_business_days(c: Column, n: int) -> Column:
    """BusinessDay (``offsets.py:445``): weekend-skipping day add, as a
    closed-form expression on the weekday (no holiday calendar; pass a
    holiday broadcast table through ``operators.joins.merge`` for
    CustomBusinessDay)."""
    # Mon=0..Sun=6
    wd = (F.dayofweek(c) + 5) % 7
    # roll weekend starts to previous Friday for counting
    start = F.when(wd == 5, F.date_sub(F.to_date(c), 1)).when(wd == 6, F.date_sub(F.to_date(c), 2)).otherwise(F.to_date(c))
    swd = (F.dayofweek(start) + 5) % 7
    weeks = F.floor(F.lit(n) / 5)
    rem = F.lit(n) % 5
    cand = F.date_add(start, (weeks * 7 + rem).cast("int"))
    cwd = swd + rem
    adjusted = F.when(cwd >= 5, F.date_add(cand, 2)).otherwise(cand)
    return adjusted


def custom_business_day_add(frame, column: str, n: int, holidays=(),
                            new_col: str | None = None):
    """CustomBusinessDay(n, holidays) (``offsets.py:792``, holiday
    calendars ``tseries/holiday.py``): business-day arithmetic against a
    generated calendar table, broadcast-joined twice (date → business-day
    ordinal, ordinal+n → date) — the SURVEY §2.9 design. The calendar is
    O(span-in-days) rows, tiny at any data scale, so both joins broadcast:
    the fact table never shuffles.

    Semantics match pandas: +n lands on the n-th strictly-later business
    day, -n on the n-th strictly-earlier, 0 rolls forward to the next
    business day."""
    import datetime as dt

    from ..frame import Frame

    new_col = new_col or f"{column}_cbd"
    sdf = frame._sdf
    row = sdf.agg(F.min(F.to_date(F.col(column))).alias("lo"),
                  F.max(F.to_date(F.col(column))).alias("hi")).first()
    lo, hi = row["lo"], row["hi"]
    if lo is None:  # empty or all-null column
        return Frame(sdf.withColumn(new_col, F.lit(None).cast("timestamp")),
                     frame._index_names)
    pad = 7 * (abs(n) // 5 + 2)
    hol = {d if isinstance(d, dt.date) else dt.date.fromisoformat(str(d)[:10])
           for d in holidays}
    days, ords = [], []
    cum_lt = 0  # business days strictly before d
    d = lo - dt.timedelta(days=pad)
    end = hi + dt.timedelta(days=pad)
    while d <= end:
        is_bd = d.weekday() < 5 and d not in hol
        days.append((d, cum_lt, cum_lt + (1 if is_bd else 0)))  # (date, <, ≤)
        if is_bd:
            cum_lt += 1
            ords.append((cum_lt, d))
        d += dt.timedelta(days=1)
    spark = sdf.sparkSession
    cal = spark.createDataFrame(days, "cal_date date, bd_lt long, bd_le long")
    bds = spark.createDataFrame(ords, "bd_ord long, bd_date date")
    if n > 0:
        target = F.col("bd_le") + n
    elif n < 0:
        target = F.col("bd_lt") + n + 1
    else:
        target = F.col("bd_lt") + 1  # roll forward
    out = (sdf.withColumn("__d__", F.to_date(F.col(column)))
           .join(F.broadcast(cal), F.col("__d__") == F.col("cal_date"), "left")
           .withColumn("__ord__", target)
           .join(F.broadcast(bds), F.col("__ord__") == F.col("bd_ord"), "left")
           # pandas CustomBusinessDay on datetime64 yields datetime64,
           # not date — keep the engine's uniform timestamp dtype
           .withColumn(new_col, F.col("bd_date").cast("timestamp"))
           .drop("__d__", "cal_date", "bd_lt", "bd_le", "__ord__", "bd_ord", "bd_date"))
    return Frame(out, frame._index_names)


def to_datetime(col_or_series, fmt: str | None = None, errors: str = "coerce"):
    """``core/tools/datetimes.py:373`` — cast/parse to timestamp.

    errors='coerce' (NULL on failure) is the only distributed-sane
    default; Spark try_to_timestamp gives exactly that.
    """
    from ..series import Series

    s = col_or_series
    c = s._scol if isinstance(s, Series) else s
    if fmt is not None:
        out = F.try_to_timestamp(c, F.lit(strftime_to_spark(fmt)))
    else:
        out = F.try_to_timestamp(c)
    if isinstance(s, Series):
        return s._with_scol(out)
    return out


def to_numeric(col_or_series, errors: str = "coerce"):
    from ..series import Series

    s = col_or_series
    c = s._scol if isinstance(s, Series) else s
    out = c.cast("double")
    if isinstance(s, Series):
        return s._with_scol(out)
    return out


def date_range(spark, start: str, periods: int, freq: str = "1d"):
    """Distributed time spine: ``sequence()`` + explode — the
    ``date_range``/upsample-spine generator (SURVEY §2.10)."""
    from ..window import offset_to_us
    from .. import _internal as I
    from ..frame import Frame

    us = offset_to_us(_norm_freq(freq))
    sdf = spark.range(periods).select(
        (F.unix_micros(F.to_timestamp(F.lit(start))) + F.col("id") * us).alias("__e__")
    ).select(F.timestamp_micros(F.col("__e__")).alias("ts"))
    return Frame(sdf)
