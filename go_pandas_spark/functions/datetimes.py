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

    def day_name(self):
        return self._w(F.date_format(self._c, "EEEE"))

    def month_name(self):
        return self._w(F.date_format(self._c, "MMMM"))

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

    @property
    def nanosecond(self):
        """ns-within-µs component. The engine's timestamps are µs
        precision (SURVEY §1.3 deliberate delta), so this is always 0 —
        kept for accessor parity (accessors.py nanosecond)."""
        return self._w(F.lit(0))

    @property
    def time(self):
        """Time-of-day (``accessors.py`` time field). Documented delta:
        a "HH:mm:ss" string rather than datetime.time objects — Spark
        has no time type; string sorts and compares identically."""
        return self._w(F.date_format(self._c, "HH:mm:ss"))

    def total_seconds(self):
        """``TimedeltaProperties.total_seconds`` — for day-time
        INTERVAL columns (the type timestamp subtraction/diff yields).
        Spark can't cast intervals to double, so add to the epoch and
        take unix micros — exact to the microsecond."""
        epoch = F.to_timestamp(F.lit("1970-01-01 00:00:00"))
        return self._w(F.unix_micros(epoch + self._c) / F.lit(1_000_000.0))

    # floor/ceil/round: exact INTEGER epoch arithmetic via pmod —
    # date_trunc can't express counted freqs ('15min' NaT'd, fuzz-caught
    # seed 170684), double division loses ulps near boundaries, and
    # casting negative doubles truncates toward zero (pre-1970 dates).
    def _epoch_and_step(self, freq: str):
        from ..window import offset_to_us

        us = offset_to_us(_norm_freq(freq))
        return F.unix_micros(self._c.cast("timestamp")), F.lit(us)

    def floor(self, freq: str):
        e, us = self._epoch_and_step(freq)
        return self._w(F.timestamp_micros(e - F.pmod(e, us)))

    def ceil(self, freq: str):
        e, us = self._epoch_and_step(freq)
        rem = F.pmod(e, us)
        return self._w(F.timestamp_micros(
            F.when(rem == 0, e).otherwise(e - rem + us)))

    def round(self, freq: str):
        """pandas rounds HALF TO EVEN on the multiple (numpy rounding),
        not half-up like Spark's F.round."""
        e, us = self._epoch_and_step(freq)
        rem = F.pmod(e, us)
        fl = e - rem
        m = (fl / us).cast("long")  # exact: fl is a multiple of us
        up = fl + us
        return self._w(F.timestamp_micros(
            F.when(rem * 2 < us, fl)
            .when(rem * 2 > us, up)
            .otherwise(F.when(F.pmod(m, F.lit(2)) == 0, fl).otherwise(up))))

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


_STRF_PARSE = [("%Y", "yyyy"), ("%y", "yy"), ("%m", "M"), ("%d", "d"),
               ("%H", "H"), ("%I", "h"), ("%M", "m"), ("%S", "s"),
               ("%f", "SSSSSS"), ("%j", "DDD"), ("%a", "EEE"),
               ("%A", "EEEE"), ("%b", "MMM"), ("%B", "MMMM"),
               ("%p", "a"), ("%%", "%")]


def strftime_to_spark(fmt: str, parse: bool = False) -> str:
    """strftime → Java DateTimeFormatter. ``parse=True`` uses lenient
    single-letter numeric fields (d/M/H accept 1-2 digits — Java's dd
    is STRICTLY two-digit and rejects 'Mar 5 2024' where Python's %d
    accepts it); formatting keeps the zero-padded two-letter forms."""
    for k, v in (_STRF_PARSE if parse else _STRF):
        fmt = fmt.replace(k, v)
    return fmt


def add_offset(c, n: int, freq: str):
    """Calendar-offset arithmetic (MonthEnd/MonthBegin/QuarterEnd/
    YearEnd/Week/BusinessDay…) as JVM expressions. Results are
    timestamps: pandas offset arithmetic on datetime64 stays
    datetime64 (midnight-anchored), never a bare date. Accepts a
    Column or an engine Series (returns the matching kind)."""
    from ..series import Series as _S

    if isinstance(c, _S):
        return c._with_scol(add_offset(c._scol, n, freq))
    f = freq.lower()
    out = None
    if f in ("m", "monthend"):
        # pandas anchor rule: rolling FORWARD, the first end reached
        # counts as one step unless already AT the end; rolling back
        # (n<=0) counts whole anchors. Unified: n months if at-end or
        # n<=0, else n-1.
        at_end = F.to_date(c) == F.last_day(c)
        months = F.when(at_end | F.lit(n <= 0), n).otherwise(n - 1)
        out = F.last_day(F.add_months(c, months))
    elif f in ("ms", "monthbegin"):
        # mirror rule at the month START: n<0 from mid-month reaches
        # this month's begin first (n+1 more), at-begin counts full n
        at_begin = F.to_date(c) == F.trunc(c, "month")
        months = F.when(at_begin | F.lit(n > 0), n).otherwise(n + 1)
        out = F.trunc(F.add_months(c, months), "month")
    elif f in ("q", "quarterend"):
        qtrunc = F.date_trunc("quarter", c)
        q_end = F.last_day(F.add_months(qtrunc, 2))
        at_end = F.to_date(c) == q_end
        months = F.when(at_end | F.lit(n <= 0), 3 * n + 2).otherwise(3 * n - 1)
        out = F.last_day(F.add_months(qtrunc, months))
    elif f in ("y", "a", "yearend"):
        ytrunc = F.date_trunc("year", c)
        y_end = F.last_day(F.add_months(ytrunc, 11))
        at_end = F.to_date(c) == y_end
        months = F.when(at_end | F.lit(n <= 0), 12 * n + 11).otherwise(12 * n - 1)
        out = F.last_day(F.add_months(ytrunc, months))
    elif f in ("w", "week"):
        out = F.date_add(F.to_date(c), 7 * n)
    elif f in ("d", "day"):
        out = F.date_add(F.to_date(c), n)
    elif f in ("b", "businessday"):
        out = add_business_days(c, n)
    elif f in ("sm", "semimonthend"):
        out = semi_month_end_add(c, n)
    elif f in ("bh", "businesshour"):
        out = business_hour_add(c, n)
    elif f == "easter":
        out = easter_add(c, n)
    elif f.startswith("wom-"):
        # pandas freq string WOM-3FRI = 3rd Friday
        spec = f[4:]
        week = int(spec[0]) - 1
        weekday = ["mon", "tue", "wed", "thu", "fri", "sat", "sun"].index(spec[1:4])
        out = week_of_month_add(c, n, week=week, weekday=weekday)
    elif f.startswith("re-") or f.startswith("fy5253"):
        # RE-L-DEC-SAT / RE-N-DEC-SAT (L=last, N=nearest)
        parts = f.split("-")
        variation = "last" if parts[1] == "l" else "nearest"
        months = ["jan", "feb", "mar", "apr", "may", "jun",
                  "jul", "aug", "sep", "oct", "nov", "dec"]
        sm = months.index(parts[2]) + 1
        weekday = ["mon", "tue", "wed", "thu", "fri", "sat", "sun"].index(parts[3])
        out = fy5253_add(c, n, weekday=weekday, starting_month=sm, variation=variation)
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
    if n >= 0:
        # roll weekend starts to previous Friday for counting
        start = F.when(wd == 5, F.date_sub(F.to_date(c), 1)) \
                 .when(wd == 6, F.date_sub(F.to_date(c), 2)) \
                 .otherwise(F.to_date(c))
        swd = (F.dayofweek(start) + 5) % 7
        weeks, rem = n // 5, n % 5
        cand = F.date_add(start, weeks * 7 + rem)
        adjusted = F.when(swd + rem >= 5, F.date_add(cand, 2)).otherwise(cand)
        return adjusted
    # n < 0 (the floor/mod decomposition above is sign-broken for
    # negatives): roll weekend starts FORWARD to Monday, then walk back
    m = -n
    start = F.when(wd == 5, F.date_add(F.to_date(c), 2)) \
             .when(wd == 6, F.date_add(F.to_date(c), 1)) \
             .otherwise(F.to_date(c))
    swd = (F.dayofweek(start) + 5) % 7
    weeks, rem = m // 5, m % 5
    cand = F.date_sub(start, weeks * 7 + rem)
    return F.when(swd - rem < 0, F.date_sub(cand, 2)).otherwise(cand)


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


_MONTH_NAMES = ["January", "February", "March", "April", "May", "June",
                "July", "August", "September", "October", "November",
                "December"]


def _canon_name_tokens(c: Column) -> Column:
    """Case-normalize month-name and AM/PM tokens to the exact case
    Java's MMM/MMMM/a parsers require — dateutil and strptime (and so
    pandas) are case-insensitive here, and lowercase feeds are common
    in scraped data (r13, VERDICT r12 missing #2). Full month names
    first, so 'january' canonicalizes whole and the 'jan' rule can't
    fire mid-word; abbreviations only when the token ENDS (lookahead),
    so 'Janu' stays unparseable in both engines. Pure JVM regexp
    chain — scan-speed, no shuffle."""
    out = c
    for m in _MONTH_NAMES:
        out = F.regexp_replace(out, f"(?i)\\b{m.lower()}\\b", m)
    for m in _MONTH_NAMES:
        ab = m[:3]
        out = F.regexp_replace(out, f"(?i)\\b{ab.lower()}(?![A-Za-z])", ab)
    out = F.regexp_replace(out, r"(?i)\bam\b", "AM")
    out = F.regexp_replace(out, r"(?i)\bpm\b", "PM")
    return out


def to_datetime(col_or_series, fmt: str | None = None, errors: str = "coerce",
                format: str | None = None):
    """``core/tools/datetimes.py:373`` — cast/parse to timestamp.

    errors='coerce' (NULL on failure) is the only distributed-sane
    default; Spark try_to_timestamp gives exactly that. ``format=``
    is the pandas keyword; ``fmt`` kept for back-compat.
    """
    from ..series import Series

    if format is not None:
        fmt = format
    s = col_or_series
    c = s._scol if isinstance(s, Series) else s
    if fmt is not None and any(t in fmt for t in ("%b", "%B", "%p")):
        # strptime month names / AM-PM are case-insensitive; Java's
        # parser is not — canonicalize the tokens first
        c = _canon_name_tokens(c)
    if fmt is not None:
        # two candidate patterns: lenient single-letter fields accept
        # 1-2 digit numbers ('Mar 5 2024'), but Java cannot parse
        # ADJACENT variable-width fields ('20240305' needs strict
        # yyyyMMdd) — try lenient first, fall back to strict
        lenient = strftime_to_spark(fmt, parse=True)
        strict = strftime_to_spark(fmt)
        out = F.try_to_timestamp(c, F.lit(lenient))
        if strict != lenient:
            out = F.coalesce(out, F.try_to_timestamp(c, F.lit(strict)))
        if "%y" in fmt and "%Y" not in fmt:
            # two-digit years: Java 'yy' maps to 2000-2099, but the
            # POSIX/pandas pivot is 69 (69-99 → 19xx; r11 fuzz-caught).
            # make_interval keeps time-of-day (add_months returns a
            # bare date — the first fuzz wave caught that too)
            out = F.when(F.year(out) >= 2069,
                         out - F.make_interval(F.lit(100))).otherwise(out)
    else:
        # bare inference: ISO first (Spark's default), then the
        # delimiter/compact variants pandas' format sniffer accepts
        # ('2024/01/02', '20240102'), then the month-NAME shapes
        # pandas guess_datetime_format recognizes (r12 stretch:
        # '02-Jan-2024', 'Jan 2, 2024', '2 Jan 2024',
        # 'January 2, 2024', each with optional time-of-day).
        # Month names parse case-insensitively (r13): the name-shape
        # candidates read a token-canonicalized copy of the string —
        # dateutil is case-insensitive where Java's parser is not.
        cn = _canon_name_tokens(c)
        name_shapes = ["d-MMM-yyyy", "MMM d, yyyy", "MMMM d, yyyy",
                       "d MMM yyyy", "d MMMM yyyy", "d-MMMM-yyyy"]
        out = F.coalesce(
            F.try_to_timestamp(c),
            F.try_to_timestamp(c, F.lit("yyyy/M/d H:m:s")),
            F.try_to_timestamp(c, F.lit("yyyy/M/d")),
            F.try_to_timestamp(c, F.lit("yyyyMMdd")),
            *[F.try_to_timestamp(cn, F.lit(p + sfx))
              for p in name_shapes for sfx in (" H:m:s", "")])
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


def date_range(spark, start: str, end: str | int | None = None,
               periods: int | None = None, freq: str = "1d"):
    """Distributed time spine: ``sequence()`` + explode — the
    ``date_range``/upsample-spine generator (SURVEY §2.10).

    Accepts ``periods=`` (engine-native) or ``end=`` (pandas primary
    form; inclusive). Anchored weekly frequencies (``W``/``W-SUN``/
    ``W-MON``…) snap the start forward to the anchor weekday then step
    7 days, like pandas ``tseries/frequencies``."""
    import datetime as _dt

    from ..window import offset_to_us
    from ..frame import Frame

    # positional back-compat: date_range(spark, start, 10) == periods=10
    if isinstance(end, int) and periods is None:
        periods, end = end, None
    f = freq.strip()
    anchor = None
    m = _WEEK_ANCHOR_RE.fullmatch(f.upper())
    if m:
        n = int(m.group(1) or 1)
        anchor = _WEEKDAYS.index(m.group(2) or "SUN")
        us = n * 7 * 86_400_000_000
        s0 = _dt.datetime.fromisoformat(start)
        # snap forward to the anchor weekday (Mon=0..Sun=6)
        s0 = s0 + _dt.timedelta(days=(anchor - s0.weekday()) % 7)
        start = s0.isoformat(sep=" ")
    else:
        us = offset_to_us(_norm_freq(freq))
    if periods is None:
        if end is None:
            raise ValueError("date_range needs end= or periods=")
        e0 = _dt.datetime.fromisoformat(str(end))
        s0 = _dt.datetime.fromisoformat(str(start))
        span_us = int((e0 - s0).total_seconds() * 1_000_000)
        periods = max(span_us // us + 1, 0) if span_us >= 0 else 0
    sdf = spark.range(periods).select(
        (F.unix_micros(F.to_timestamp(F.lit(start))) + F.col("id") * us).alias("__e__")
    ).select(F.timestamp_micros(F.col("__e__")).alias("ts"))
    return Frame(sdf)


_WEEKDAYS = ["MON", "TUE", "WED", "THU", "FRI", "SAT", "SUN"]
import re as _re  # noqa: E402

_WEEK_ANCHOR_RE = _re.compile(r"(\d+)?W(?:-(MON|TUE|WED|THU|FRI|SAT|SUN))?")


# ---------------- exotic calendar offsets (offsets.py §exotic) -------
# Every one is a CLOSED-FORM expression on calendar fields — no
# calendar table, no UDF; Catalyst folds the arithmetic into codegen.

def _months_since_epoch(c: Column) -> Column:
    return (F.year(c) - 1970) * 12 + F.month(c) - 1


def _month_from_index(mm: Column):
    yy = (F.lit(1970) + F.floor(mm / 12)).cast("int")
    mo = (F.pmod(mm, F.lit(12)) + 1).cast("int")
    return yy, mo


def semi_month_end_add(c: Column, n: int = 1) -> Column:
    """SemiMonthEnd (``offsets.py:1136``): anchors are the 15th and the
    last day of every month. Anchor arithmetic on the global anchor
    index g = 2·(months since epoch) + {0: day 15, 1: month end}."""
    d = F.dayofmonth(c)
    m = _months_since_epoch(c)
    at_end = F.to_date(c) == F.last_day(c)
    if n > 0:
        g = F.when(at_end, 2 * m + 1).when(d >= 15, 2 * m).otherwise(2 * m - 1)
    else:
        g = F.when(d < 15, 2 * m).when(at_end, 2 * m + 1).otherwise(2 * m + 1)
        # d == 15 exactly is its own anchor (covered by d < 15? no —
        # 15 is the anchor: first anchor ≥ t is itself)
        g = F.when(d <= 15, 2 * m).otherwise(g)
    tg = g + F.lit(n)
    mm = F.floor(tg / 2).cast("int")
    a = tg - 2 * mm
    yy, mo = _month_from_index(mm)
    first = F.make_date(yy, mo, F.lit(1))
    out = F.when(a == 0, F.make_date(yy, mo, F.lit(15))).otherwise(F.last_day(first))
    return out.cast("timestamp")


def week_of_month_add(c: Column, n: int = 1, week: int = 0, weekday: int = 0) -> Column:
    """WeekOfMonth (``offsets.py:1383``): the (week+1)-th ``weekday``
    of each month (Mon=0). One anchor per month → month-index
    arithmetic."""
    def anchor(mm: Column) -> Column:
        yy, mo = _month_from_index(mm)
        fd = F.make_date(yy, mo, F.lit(1))
        dow_fd = (F.dayofweek(fd) + 5) % 7
        off = F.pmod(F.lit(weekday) - dow_fd, F.lit(7)) + 7 * week
        return F.date_add(fd, off.cast("int"))

    m = _months_since_epoch(c)
    dt = F.to_date(c)
    if n > 0:
        last_le = F.when(anchor(m) <= dt, m).otherwise(m - 1)
        target = last_le + F.lit(n)
    else:
        first_ge = F.when(anchor(m) >= dt, m).otherwise(m + 1)
        target = first_ge + F.lit(n)
    return anchor(target).cast("timestamp")


def easter_add(c: Column, n: int = 1) -> Column:
    """Easter (``offsets.py:2098``): anonymous Gregorian computus as
    pure integer arithmetic on the year."""
    def easter(y: Column) -> Column:
        a = F.pmod(y, F.lit(19))
        b = F.floor(y / 100)
        cc = F.pmod(y, F.lit(100))
        d = F.floor(b / 4)
        e = F.pmod(b, F.lit(4))
        f = F.floor((b + 8) / 25)
        g = F.floor((b - f + 1) / 3)
        h = F.pmod(19 * a + b - d - g + 15, F.lit(30))
        i = F.floor(cc / 4)
        k = F.pmod(cc, F.lit(4))
        l = F.pmod(32 + 2 * e + 2 * i - h - k, F.lit(7))
        mzz = F.floor((a + 11 * h + 22 * l) / 451)
        month = F.floor((h + l - 7 * mzz + 114) / 31).cast("int")
        day = (F.pmod(h + l - 7 * mzz + 114, F.lit(31)) + 1).cast("int")
        return F.make_date(y.cast("int"), month, day)

    y = F.year(c)
    dt = F.to_date(c)
    if n > 0:
        last_le = F.when(easter(y) <= dt, y).otherwise(y - 1)
        return easter(last_le + F.lit(n)).cast("timestamp")
    first_ge = F.when(easter(y) >= dt, y).otherwise(y + 1)
    return easter(first_ge + F.lit(n)).cast("timestamp")


def business_hour_add(c: Column, n: int = 1) -> Column:
    """BusinessHour (``offsets.py:776``), 09:00–17:00 Mon–Fri, whole
    hours, all signs of ``n`` — closed-form expressions throughout.

    n > 0: snap forward to the next opening, then second-precision
    arithmetic over 8-hour business days (exactly-at-close stays on
    the same day; overflow carries to the next morning).
    n = 0: roll forward to the next opening iff outside business
    hours (pandas anchor semantics).
    n < 0: mirror — exactly-at-open counts as the PREVIOUS day's
    close (pandas steps 09:00 back a second before snapping), snap
    back to the latest close, subtract |n| business hours."""
    OPEN, CLOSE, DAY = 9 * 3600, 17 * 3600, 8 * 3600
    dow = (F.dayofweek(c) + 5) % 7
    secs = F.hour(c) * 3600 + F.minute(c) * 60 + F.second(c)
    dt = F.to_date(c)
    is_bd = dow <= 4
    within = is_bd & (secs >= OPEN) & (secs < CLOSE)

    if n >= 0:
        # next opening date when outside hours
        adv = (F.when(~is_bd & (dow == 5), 2)
               .when(~is_bd & (dow == 6), 1)
               .when(secs >= CLOSE, F.when(dow == 4, 3).otherwise(1))
               .otherwise(0))  # business day before open: same date
        snap_date = F.date_add(dt, adv.cast("int"))
        if n == 0:
            return F.when(within, c).otherwise(F.timestamp_seconds(
                F.unix_seconds(snap_date.cast("timestamp")) + F.lit(OPEN)))
        s0 = F.when(within, secs - OPEN).otherwise(F.lit(0))
        total = s0 + F.lit(n * 3600)
        df = F.floor((total - 1) / DAY).cast("int")
        rem = total - df * F.lit(DAY)
        # advance df business days from snap_date (column-valued count)
        swd = (F.dayofweek(snap_date) + 5) % 7
        weeks = F.floor(df / 5)
        extra = F.pmod(df, F.lit(5))
        cand = F.date_add(snap_date, (weeks * 7 + extra).cast("int"))
        target = F.when(swd + extra >= 5, F.date_add(cand, 2)).otherwise(cand)
        return F.timestamp_seconds(
            F.unix_seconds(target.cast("timestamp")) + F.lit(OPEN) + rem)

    # n < 0: reference point = latest business CLOSE at or before c
    # (09:00 exactly belongs to the previous day — pandas -1s step)
    back = (F.when(~is_bd & (dow == 5), 1)
            .when(~is_bd & (dow == 6), 2)
            .when(secs <= OPEN, F.when(dow == 0, 3).otherwise(1))
            .otherwise(0))  # business day after open: same date's close
    snap_date = F.date_sub(dt, back.cast("int"))
    # backward distance from the close: only strictly-inside-or-at-close
    # positions carry their offset
    b0 = F.when(is_bd & (secs > OPEN) & (secs <= CLOSE), F.lit(CLOSE) - secs) \
        .otherwise(F.lit(0))
    total = b0 + F.lit(-n * 3600)
    df = F.floor((total - 1) / DAY).cast("int")
    rem = total - df * F.lit(DAY)
    swd = (F.dayofweek(snap_date) + 5) % 7
    weeks = F.floor(df / 5)
    extra = F.pmod(df, F.lit(5))
    cand = F.date_sub(snap_date, (weeks * 7 + extra).cast("int"))
    target = F.when(swd - extra < 0, F.date_sub(cand, 2)).otherwise(cand)
    return F.timestamp_seconds(
        F.unix_seconds(target.cast("timestamp")) + F.lit(CLOSE) - rem)


def fy5253_add(c: Column, n: int = 1, weekday: int = 0,
               starting_month: int = 12, variation: str = "nearest") -> Column:
    """FY5253 / 52-53-week fiscal year (``offsets.py:1715``): the
    fiscal year ends on the ``weekday`` nearest to (or last before,
    ``variation='last'``) the last day of ``starting_month``."""
    def anchor(y: Column) -> Column:
        ld = F.last_day(F.make_date(y.cast("int"), F.lit(starting_month), F.lit(1)))
        dow_ld = (F.dayofweek(ld) + 5) % 7
        if variation == "nearest":
            delta = F.pmod(F.lit(weekday) - dow_ld + 3, F.lit(7)) - 3
        elif variation == "last":
            delta = -F.pmod(dow_ld - F.lit(weekday), F.lit(7))
        else:
            raise ValueError(f"variation={variation!r}")
        return F.date_add(ld, delta.cast("int"))

    y = F.year(c)
    dt = F.to_date(c)
    if n > 0:
        # nearest-variation anchors can slip ±3 days across New Year —
        # compare actual anchor dates, probing the adjacent year
        last_le = (F.when(anchor(y) <= dt, y)
                   .when(anchor(y - 1) <= dt, y - 1)
                   .otherwise(y - 2))
        return anchor(last_le + F.lit(n)).cast("timestamp")
    first_ge = (F.when(anchor(y - 1) >= dt, y - 1)
                .when(anchor(y) >= dt, y)
                .otherwise(y + 1))
    return anchor(first_ge + F.lit(n)).cast("timestamp")


_TD_UNIT_US = {
    "ns": 1e-3, "us": 1, "µs": 1, "ms": 1_000, "s": 1_000_000, "sec": 1_000_000,
    "m": 60_000_000, "min": 60_000_000, "h": 3_600_000_000, "hr": 3_600_000_000,
    "d": 86_400_000_000, "day": 86_400_000_000, "days": 86_400_000_000,
    "w": 604_800_000_000,
}

#: "1 days 03:04:05.123456", "03:04:05", "2 days", with optional sign
_TD_RE = (r"^\s*(-)?\s*(?:(\d+)\s*(?:days?|d)\s*,?\s*)?"
          r"(?:(\d{1,3}):(\d{2})(?::(\d{2}))?(?:\.(\d{1,6}))?)?\s*$")


def to_timedelta(col_or_series, unit: str = "us"):
    """``pandas.to_timedelta`` analog: numeric×unit or duration strings
    ("2 days 03:04:05.5", "03:04:05", "-1 days") → **microsecond
    bigint**, the engine's duration currency (SURVEY §1.3 maps
    timedelta64[ns] → DayTimeInterval / long µs; ns sub-precision
    truncates, the same deliberate delta as timestamps). Pure JVM
    expression — regexp parse, no UDF. Unparseable strings → null."""
    from ..series import Series

    s = col_or_series
    c = s._scol if isinstance(s, Series) else s
    dtype = None
    if isinstance(s, Series):
        dtype = s.dtype
    if dtype is None or dtype in ("string",):
        sign = F.when(F.regexp_extract(c, _TD_RE, 1) == "-", -1).otherwise(1)

        def part(i, scale):
            p = F.regexp_extract(c, _TD_RE, i)
            return F.when(p == "", F.lit(0)).otherwise(p.cast("long")) * scale

        frac = F.regexp_extract(c, _TD_RE, 6)
        frac_us = F.when(frac == "", F.lit(0)) \
            .otherwise(F.rpad(frac, 6, "0").cast("long"))
        total = (part(2, 86_400_000_000) + part(3, 3_600_000_000)
                 + part(4, 60_000_000) + part(5, 1_000_000) + frac_us)
        matched = c.rlike(_TD_RE) & (F.trim(c) != "")
        out = F.when(matched, (sign * total).cast("long")).otherwise(F.lit(None))
        if dtype is None:
            # plain Column: string parse if string-typed at runtime is
            # unknowable — callers pass numeric columns via unit math
            out = F.when(c.cast("string").rlike(r"^\s*-?\d+(\.\d+)?\s*$"),
                         (c.cast("double") * F.lit(_TD_UNIT_US[unit])).cast("long")) \
                .otherwise(out)
    else:
        out = (c.cast("double") * F.lit(_TD_UNIT_US[unit])).cast("long")
    if isinstance(s, Series):
        return s._with_scol(out)
    return out


def bdate_range(spark, start: str, periods: int):
    """Business-day spine (``bdate_range``): generate a padded daily
    spine, filter weekends, take the first ``periods`` — all
    distributed, the filter is a dayofweek expression."""
    from ..frame import Frame

    # 7/5 padding + slack guarantees enough weekdays
    pad = periods * 7 // 5 + 3
    daily = date_range(spark, start, periods=pad, freq="1d")._sdf
    wk = daily.filter(~F.dayofweek("ts").isin([1, 7]))  # 1=Sun, 7=Sat
    wk = wk.orderBy("ts").limit(periods) \
        .drop("__order__").withColumn("__order__", F.monotonically_increasing_id())
    return Frame(wk)


def timedelta_range(spark, periods: int, freq: str = "1d", start: str = "0s"):
    """Duration spine: µs longs (the engine's timedelta currency)."""
    from ..window import offset_to_us
    from ..frame import Frame

    step = offset_to_us(_norm_freq(freq))
    base = offset_to_us(_norm_freq(start)) if start not in ("0s", "0") else 0
    sdf = spark.range(periods).select((F.lit(base) + F.col("id") * step).alias("td_us"))
    return Frame(sdf)


def period_range(spark, start: str, periods: int, freq: str = "M"):
    """Period-label spine ('2024-01', '2024Q1', …) — the string-label
    period model (documented delta: periods are labels, not a dtype)."""
    from ..frame import Frame

    if freq not in ("M", "Q", "Y", "D"):
        raise ValueError(f"period_range freq {freq!r}")
    step = {"M": "1mo", "Q": "3mo", "Y": "12mo", "D": "1d"}[freq]
    n_months = {"M": 1, "Q": 3, "Y": 12}.get(freq)
    if n_months is not None:
        sdf = spark.range(periods).select(
            F.add_months(F.to_date(F.lit(start)), (F.col("id") * n_months).cast("int")).alias("__d__"))
    else:
        sdf = date_range(spark, start, periods=periods, freq=step)._sdf \
            .select(F.to_date("ts").alias("__d__"))
    if freq == "M":
        lab = F.date_format("__d__", "yyyy-MM")
    elif freq == "Q":
        lab = F.concat(F.year("__d__").cast("string"), F.lit("Q"), F.quarter("__d__").cast("string"))
    elif freq == "Y":
        lab = F.year("__d__").cast("string")
    else:
        lab = F.date_format("__d__", "yyyy-MM-dd")
    return Frame(sdf.select(lab.alias("period")))
