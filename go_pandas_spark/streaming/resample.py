"""resample: time-bin groupby (batch) — the tumbling-window mapping.

Reference parity: ``Resampler`` ``pandas/core/resample.py:38``,
``TimeGrouper:1245``, bin edges ``_get_time_bins:1359``. The
reference computes bin edges then runs a sorted-bin aggregation; here
the bin assignment is ``F.window(ts, freq)`` (or ``date_trunc``),
which groups-by-bucket in one shuffle — and the identical expression
works on a streaming DataFrame (SURVEY §2.10's mapping target).

Upsampling (``asfreq``/``ffill``) = a generated time spine
(``sequence`` + ``explode``) as-of joined against the data.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .. import _internal as I

_FREQ = {"s": "second", "sec": "second", "min": "minute", "t": "minute",
         "h": "hour", "d": "day", "w": "week", "m": "month", "q": "quarter", "y": "year"}


def freq_to_duration(freq: str) -> str:
    """'5min' → '5 minutes' (Spark window duration syntax)."""
    import re

    m = re.fullmatch(r"(\d*)\s*([a-zA-Z]+)", freq.strip())
    if not m:
        raise ValueError(freq)
    n = int(m.group(1) or 1)
    unit = _FREQ.get(m.group(2).lower(), m.group(2).lower())
    return f"{n} {unit}s" if n != 1 else f"{n} {unit}"


class Resampler:
    def __init__(self, frame, freq: str, on: str, label: str = "left",
                 extra_keys: list[str] | None = None):
        self._frame = frame
        self._freq = freq
        self._on = on
        self._label = label
        self._keys = list(extra_keys or [])

    def _bucket(self) -> Column:
        import re

        dur = freq_to_duration(self._freq)
        start = None
        m = re.fullmatch(r"(\d*)\s*([a-zA-Z]+)", self._freq.strip())
        n, unit = int(m.group(1) or 1), m.group(2).lower()
        if (unit in ("d", "day", "days") and n > 1
                and not self._frame._sdf.isStreaming):
            # pandas origin='start_day': multi-day bins anchor at the
            # EARLIEST day's midnight, not the epoch. One scalar min
            # job computes the startTime offset (epoch-aligned windows
            # would split [01-01,01-02] into [01-01],[01-02,01-03] for
            # odd epoch days). Streaming frames keep epoch alignment
            # (no action possible mid-plan — documented delta).
            import datetime

            lo = self._frame._sdf.agg(
                F.min(F.to_date(F.col(self._on))).alias("lo")).first()["lo"]
            if lo is not None:
                epoch_days = (lo - datetime.date(1970, 1, 1)).days
                off = epoch_days % n
                if off:
                    start = f"{off} days"
        w = (F.window(F.col(self._on), dur, dur, start) if start
             else F.window(F.col(self._on), dur))
        return w.start if self._label == "left" else w.end

    def agg(self, spec: dict[str, tuple[str, str] | str]):
        """spec: alias → (col, fn) named-agg or col → fn.

        first/last order by the TIME INSTANT within the bin (ties →
        frame order), matching pandas resample — groupby first/last
        order by frame position, which differs when rows arrive out of
        time order (fuzz-caught, resample_rand seed 210043)."""
        from ..operators.aggregates import resolve_agg_total
        from ..frame import Frame

        sdf = self._frame._sdf
        ts = "__resample_instant__"
        batch = not sdf.isStreaming
        needs_ts = batch and any(
            (v[1] if isinstance(v, tuple) else v) in ("first", "last")
            for v in spec.values())
        if needs_ts:
            tie = (F.col(I.ORDER_COL) if I.ORDER_COL in sdf.columns
                   else F.lit(0))
            sdf = sdf.withColumn(ts, F.struct(F.col(self._on), tie))
        aggs = []
        for alias, v in spec.items():
            col, fn = v if isinstance(v, tuple) else (alias, v)
            if needs_ts and fn in ("first", "last"):
                okey = F.when(F.col(col).isNotNull(), F.col(ts))
                pickfn = F.min_by if fn == "first" else F.max_by
                aggs.append(pickfn(F.col(col), okey).alias(alias))
            else:
                aggs.append(resolve_agg_total(fn, F.col(col), ordered=batch)
                            .alias(alias))
        sdf = (sdf.withColumn(self._on, self._bucket())
               .groupBy(*self._keys, self._on)
               .agg(*aggs)
               .orderBy(*self._keys, self._on))
        return Frame(sdf)

    def _simple(self, fn: str):
        from ..functions.dtypes import is_numeric

        dt = self._frame.dtypes
        cols = [c for c in self._frame.columns if c != self._on and is_numeric(dt[c])]
        return self.agg({c: (c, fn) for c in cols})

    def sum(self):
        return self._simple("sum")

    def mean(self):
        return self._simple("mean")

    def count(self):
        return self._simple("count")

    def min(self):
        return self._simple("min")

    def max(self):
        return self._simple("max")

    def first(self):
        return self._simple("first")

    def last(self):
        return self._simple("last")

    def median(self):
        return self._simple("median")

    def std(self):
        return self._simple("std")

    def var(self):
        return self._simple("var")

    def sem(self):
        return self._simple("sem")

    def prod(self):
        return self._simple("prod")

    def nunique(self):
        return self._simple("nunique")

    def quantile(self, q: float = 0.5):
        from ..frame import Frame
        from ..functions.dtypes import is_numeric

        dt = self._frame.dtypes
        cols = [c for c in self._frame.columns
                if c != self._on and is_numeric(dt[c])]
        sdf = (self._frame._sdf.withColumn(self._on, self._bucket())
               .groupBy(*self._keys, self._on)
               .agg(*[F.percentile(F.col(c), F.lit(q)).alias(c) for c in cols])
               .orderBy(*self._keys, self._on))
        return Frame(sdf)

    def apply(self, fn):
        """Per-bin pandas callable via applyInPandas (resample.apply) —
        the UDF escape hatch; prefer agg for named kernels. Output
        schema is inferred from a bounded limit(100) probe, like
        groupby.apply."""
        import pandas as pd

        on = self._on
        nkeys = len(self._keys)

        def run(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
            out = fn(pdf.drop(columns=[c for c in pdf.columns
                                       if c.startswith("__")]))
            if not isinstance(out, pd.DataFrame):
                out = pd.DataFrame([out])
            out = out.copy()
            out[on] = key[nkeys]
            return out

        binned = self._frame._sdf.withColumn(on, self._bucket())
        probe = fn(self._frame._sdf.limit(100).toPandas()
                   .drop(columns=[c for c in self._frame._sdf.columns
                                  if c.startswith("__")]))
        if not isinstance(probe, pd.DataFrame):
            probe = pd.DataFrame([probe])
        probe = probe.copy()
        probe[on] = pd.Timestamp("1970-01-01")
        from ..frame import Frame
        from .. import _internal as I2

        schema = Frame.from_pandas(self._frame._sdf.sparkSession, probe) \
            ._sdf.drop(I2.ORDER_COL).schema
        out = binned.groupBy(*self._keys, on).applyInPandas(run, schema)
        return Frame(out.orderBy(*self._keys, on))

    def ohlc(self, col: str):
        from ..frame import Frame

        # min_by/max_by on (time instant, order id), not first/last:
        # open/close are time-ordered within the bin like pandas, and
        # aggregate first() is order-undefined once a shuffle is
        # involved. The instant is materialized BEFORE the bucket
        # overwrites the `on` column.
        ts = "__resample_instant__"
        tie = (F.col(I.ORDER_COL) if I.ORDER_COL in self._frame._sdf.columns
               else F.lit(0))
        okey = F.when(F.col(col).isNotNull(), F.col(ts))
        sdf = (self._frame._sdf
               .withColumn(ts, F.struct(F.col(self._on), tie))
               .withColumn(self._on, self._bucket()).groupBy(self._on)
               .agg(F.min_by(F.col(col), okey).alias("open"), F.max(col).alias("high"),
                    F.min(col).alias("low"), F.max_by(F.col(col), okey).alias("close"))
               .orderBy(self._on))
        return Frame(sdf)

    def size(self):
        from ..frame import Frame

        sdf = (self._frame._sdf.withColumn(self._on, self._bucket()).groupBy(self._on)
               .agg(F.count(F.lit(1)).alias("size")).orderBy(self._on))
        return Frame(sdf)

    def asfreq(self, method: str | None = None):
        """Regrid to the frequency: value at each EXACT spine instant
        (pandas asfreq), optional spine-level fill."""
        fill = {"ffill": "ffill", "pad": "ffill",
                "bfill": "bfill", "backfill": "bfill"}.get(method)
        return self._upsample(fill=fill, exact=True)

    def ffill(self):
        return self._upsample(fill="ffill")

    def bfill(self):
        return self._upsample(fill="bfill")

    def nearest(self):
        return self._upsample(fill="nearest")

    pad = ffill
    backfill = bfill

    def interpolate(self, method: str = "linear"):
        """Upsample then linear-interpolate the gaps (resample
        interpolate) — rides the distributed interpolate kernel."""
        from ..operators.missing import interpolate as _interp

        return _interp(self._upsample(fill=None), method=method)

    def _upsample(self, fill: str | None, exact: bool = False):
        from ..frame import Frame
        from ..window import offset_to_us

        if self._keys:
            raise NotImplementedError(
                "grouped resample upsampling (groupby(...).resample(...)"
                f".{fill or 'asfreq'}) is not supported — upsample per "
                "group via groupby(...).apply, or resample the frame "
                "after filtering to one group")

        us = offset_to_us(self._freq if self._freq[0].isdigit() else "1" + self._freq)
        sdf = self._frame._sdf
        if exact:
            # asfreq semantics (pandas): a spine instant takes the
            # value AT that exact original timestamp — for true
            # upsampling (bucket holds <= 1 row, on-grid) this equals
            # the binned form, but regridding to a COARSER freq must
            # pick exact instants, not last-in-bucket.
            binned = sdf.withColumn(
                "__bucket__", F.unix_micros(F.col(self._on).cast("timestamp")))
            lo_hi = (sdf.select(F.unix_micros(self._bucket().cast("timestamp"))
                                .alias("__b0__"))
                     .agg(F.min("__b0__").alias("lo"),
                          F.max("__b0__").alias("hi")))
        else:
            # resample().ffill()/bfill(): bin + last-in-bucket, labeled
            # at the bucket start (documented delta from pandas' as-of
            # labeling — the driver-verified contract since r4)
            binned = sdf.withColumn(
                "__bucket__", F.unix_micros(self._bucket().cast("timestamp")))
            lo_hi = binned.agg(F.min("__bucket__").alias("lo"),
                               F.max("__bucket__").alias("hi"))
        spine = lo_hi.select(
            F.explode(F.sequence(F.col("lo"), F.col("hi"), F.lit(us))).alias("__bucket__"))
        cols = [c for c in self._frame.columns if c != self._on]
        # Row-ATOMIC bucket pick: the last ROW of each bucket as one
        # struct — per-column last-non-null picks would fill a NaN cell
        # of the bucket's last row from an OLDER row, which pandas'
        # resample fills do not (same fix as merge_asof's struct pick).
        vals = binned.groupBy("__bucket__").agg(
            F.max_by(F.struct(*[F.col(c) for c in cols]),
                     F.col(I.ORDER_COL)).alias("__rowst__"))
        out = spine.join(vals, "__bucket__", "left")
        out = out.withColumn(self._on, F.timestamp_micros(F.col("__bucket__")))
        out = out.orderBy(self._on).withColumn(I.ORDER_COL, F.monotonically_increasing_id())
        if fill in ("ffill", "bfill"):
            # one struct column through the blocked distributed fill —
            # empty buckets take the whole previous/next row
            f = Frame(out.drop("__bucket__"))
            f = f.ffill() if fill == "ffill" else f.bfill()
            out = f._sdf
        elif fill == "nearest":
            # nearest ROW by time distance, tie forward
            # (Index.get_indexer(method='nearest') rule) — two blocked
            # running picks, no global window
            from ..operators.distwindow import running_pick_blocked

            aug = out.withColumn("__pres__", F.when(
                F.col("__rowst__").isNotNull(),
                F.struct(F.col("__bucket__").alias("bt"),
                         F.col("__rowst__").alias("r"))))
            aug = running_pick_blocked(
                aug, [F.col("__bucket__").asc()],
                block_key=F.col("__bucket__"),
                picks=[(["__pres__"], True, "__pb_"),
                       (["__pres__"], False, "__pf_")],
                carry_order=F.col("__bucket__"))
            pb, pf = F.col("__pb___pres__"), F.col("__pf___pres__")
            db = F.col("__bucket__") - pb.getField("bt")
            df_ = pf.getField("bt") - F.col("__bucket__")
            use_b = pb.isNotNull() & (pf.isNull() | (db < df_))
            chosen = F.when(use_b, pb.getField("r")).otherwise(pf.getField("r"))
            out = (aug.withColumn("__rowst__", chosen)
                   .drop("__pb___pres__", "__pf___pres__", "__pres__", "__bucket__"))
        else:
            out = out.drop("__bucket__")
        out = out.select(F.col(I.ORDER_COL),
                         *[F.col("__rowst__").getField(c).alias(c) for c in cols],
                         F.col(self._on))
        return Frame(out)
