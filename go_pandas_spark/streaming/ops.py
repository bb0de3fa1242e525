"""Structured Streaming mirror of the time-series surface.

The reference is batch-only (SURVEY §2.10); its nearest analogies
define these mappings:

- ``resample('5min')``            → tumbling ``window(ts, freq)``
- time-based ``rolling('10s')``   → sliding ``window(ts, size, slide)``
- session gaps (diff+cumsum idiom)→ ``session_window(ts, gap)``
- chunked ingest (read_csv(chunksize)) → ``readStream`` micro-batches
- late data                       → ``withWatermark`` (new surface,
  no batch analog — the reference sees all data at once)
- ``drop_duplicates``             → stateful streaming dedup

Every aggregation expression here is the SAME expression the batch
``Resampler`` uses — a query written against the batch engine ports
to the stream by swapping the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDataFrame, SparkSession, functions as F

from .resample import freq_to_duration
from ..operators.aggregates import resolve_agg


def read_stream(spark: SparkSession, path: str, schema=None, fmt: str = "parquet",
                max_files_per_trigger: int = 1) -> SparkDataFrame:
    """File-based streaming source (micro-batch per file group)."""
    reader = spark.readStream.format(fmt).option("maxFilesPerTrigger", max_files_per_trigger)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def with_watermark(sdf: SparkDataFrame, ts_col: str, delay: str) -> SparkDataFrame:
    """Late-data bound: state for windows older than max(event time) -
    delay is finalized and freed (the 100 TB streaming-state story)."""
    return sdf.withWatermark(ts_col, freq_to_duration(delay))


def resample_stream(sdf: SparkDataFrame, freq: str, on: str,
                    spec: dict[str, tuple[str, str]],
                    watermark: str | None = None) -> SparkDataFrame:
    """Streaming resample: tumbling window + the batch agg table."""
    if watermark is not None:
        sdf = with_watermark(sdf, on, watermark)
    aggs = [resolve_agg(fn, F.col(col), ordered=False).alias(alias) for alias, (col, fn) in spec.items()]
    w = F.window(F.col(on), freq_to_duration(freq))
    return (sdf.groupBy(w.alias("__w__"))
            .agg(*aggs)
            .select(F.col("__w__.start").alias(on), *[F.col(a) for a in spec]))


def sliding_window_stream(sdf: SparkDataFrame, size: str, slide: str, on: str,
                          spec: dict[str, tuple[str, str]],
                          watermark: str | None = None) -> SparkDataFrame:
    """Time-based rolling analog: overlapping windows."""
    if watermark is not None:
        sdf = with_watermark(sdf, on, watermark)
    aggs = [resolve_agg(fn, F.col(col), ordered=False).alias(alias) for alias, (col, fn) in spec.items()]
    w = F.window(F.col(on), freq_to_duration(size), freq_to_duration(slide))
    return (sdf.groupBy(w.alias("__w__"))
            .agg(*aggs)
            .select(F.col("__w__.start").alias("window_start"),
                    F.col("__w__.end").alias("window_end"),
                    *[F.col(a) for a in spec]))


def sessionize(sdf: SparkDataFrame, gap: str, on: str, keys: list[str],
               spec: dict[str, tuple[str, str]] | None = None,
               watermark: str | None = None) -> SparkDataFrame:
    """Session windows: activity separated by > gap starts a new
    session (the reference's diff+cumsum idiom, SURVEY §2.10)."""
    if watermark is not None:
        sdf = with_watermark(sdf, on, watermark)
    spec = spec or {"n_events": (keys[0], "count")}
    aggs = [resolve_agg(fn, F.col(col), ordered=False).alias(alias) for alias, (col, fn) in spec.items()]
    w = F.session_window(F.col(on), freq_to_duration(gap))
    return (sdf.groupBy(*keys, w.alias("__s__"))
            .agg(*aggs)
            .select(*keys, F.col("__s__.start").alias("session_start"),
                    F.col("__s__.end").alias("session_end"),
                    *[F.col(a) for a in spec]))


def stateful_dedup(sdf: SparkDataFrame, keys: list[str], ts_col: str | None = None,
                   watermark: str | None = None) -> SparkDataFrame:
    """Streaming drop_duplicates. With a watermark, state is bounded:
    duplicates are only tracked within the watermark horizon
    (``dropDuplicatesWithinWatermark``)."""
    if watermark is not None and ts_col is not None:
        sdf = with_watermark(sdf, ts_col, watermark)
        return sdf.dropDuplicatesWithinWatermark(keys)
    return sdf.dropDuplicates(keys)


def stream_stream_join(left: SparkDataFrame, right: SparkDataFrame, keys: list[str],
                       left_ts: str, right_ts: str, watermark: str = "10min",
                       within: str = "1 hour", how: str = "inner") -> SparkDataFrame:
    """Watermarked stream-stream join: equality on ``keys`` plus the
    time-range condition ``left_ts <= right_ts <= left_ts + within``.

    The range condition is what bounds state on BOTH sides — without
    it Spark would buffer every row forever waiting for future
    matches; with watermark + range, rows age out once the other
    stream's watermark passes their join horizon. (New capability
    beyond the batch-only reference; the batch analog is a range
    merge, SURVEY §2.10.)"""
    from functools import reduce

    l = with_watermark(left, left_ts, watermark).alias("l")
    r = with_watermark(right, right_ts, watermark).alias("r")
    conds = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys]
    conds.append(F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
    conds.append(F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}"))
    return l.join(r, reduce(lambda a, b: a & b, conds), how)


def run_to_memory(sdf: SparkDataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming frame to completion against a memory sink
    (availableNow trigger = process everything then stop). Test/dev
    harness; production sinks are kafka/parquet/delta writeStream."""
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()
    return q


def sessionize_batch(sdf: SparkDataFrame, gap: str, on: str, keys: list[str]) -> SparkDataFrame:
    """Batch sessionization — the reference's diff+cumsum idiom
    (SURVEY §2.10 'session gaps') as windows: a session starts where
    the gap to the previous event exceeds ``gap``; session id =
    running count of starts. Identical semantics to the streaming
    ``session_window`` grouping."""
    from pyspark.sql import Window as W

    gap_us = 0
    from .resample import freq_to_duration  # noqa: F401  (validates the unit)
    from ..window import offset_to_us

    gap_us = offset_to_us(gap if gap[0].isdigit() else "1" + gap)
    ts = F.unix_micros(F.col(on).cast("timestamp"))
    w = W.partitionBy(*keys).orderBy(ts)
    prev = F.lag(ts).over(w)
    is_start = F.when(prev.isNull() | ((ts - prev) > gap_us), 1).otherwise(0)
    run = W.partitionBy(*keys).orderBy(ts).rowsBetween(W.unboundedPreceding, W.currentRow)
    return (sdf.withColumn("__start__", is_start)
            .withColumn("session_id", F.sum("__start__").over(run))
            .drop("__start__"))


def ewma_stream(sdf: SparkDataFrame, keys: list[str], value_col: str,
                alpha: float, ts_col: str):
    """Custom stateful streaming operator via ``applyInPandasWithState``
    (the escape hatch for operators Structured Streaming lacks): per-key
    exponentially-weighted mean that carries (num, den, n) across
    micro-batches. adjust=True recursion (reference kernel
    ``pandas/_libs/window.pyx:1732 ewma``):

        num_t = (1-α)·num_{t-1} + x_t,  den_t = (1-α)·den_{t-1} + 1

    Each update emits the key's current EWMA — downstream sinks see a
    running estimate, state is three scalars per key (bounded)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    w = 1.0 - alpha
    out_cols = keys + ["ewma", "n_seen"]
    key_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    out_schema = ", ".join([f"{k} {key_types[k]}" for k in keys]
                           + ["ewma double", "n_seen long"])

    def fn(key, pdf_iter, state):
        import pandas as pd

        num, den, n = state.get if state.exists else (0.0, 0.0, 0)
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_col, kind="stable")
            for v in pdf[value_col]:
                if v is None or v != v:     # skip nulls/NaNs
                    continue
                num = num * w + float(v)
                den = den * w + 1.0
                n += 1
        state.update((num, den, n))
        ew = num / den if den > 0 else None
        yield pd.DataFrame([tuple(key) + (ew, n)], columns=out_cols)

    return (sdf.groupBy(*keys)
            .applyInPandasWithState(fn, out_schema, "num double, den double, n long",
                                    "update", GroupStateTimeout.NoTimeout))


def corpus_filter_dedup_stream(sdf: SparkDataFrame, id_col: str, text_col: str,
                               min_quality: float = 0.5) -> SparkDataFrame:
    """The LLM training-data pipeline as a STREAM: stateless quality
    gate (pure JVM expressions) → stateful exact dedup on the content
    fingerprint. Mirrors the batch ``training_data_pipeline`` query —
    a corpus can be cleaned incrementally as it lands."""
    from ..operators import text as T

    scored = sdf.withColumn("quality", T.quality_score(F.col(text_col)))
    kept = scored.filter(F.col("quality") >= min_quality)
    kept = kept.withColumn("fingerprint", T.fingerprint(F.col(text_col)))
    return kept.select(id_col, "fingerprint", "quality").dropDuplicates(["fingerprint"])


def dedup_against_stream(stream: SparkDataFrame, reference: SparkDataFrame,
                         id_col: str, text_col: str,
                         ref_text_col: str | None = None,
                         dedup_within_stream: bool = True) -> SparkDataFrame:
    """Incremental snapshot dedup as a STREAM: drop arriving documents
    whose normalized content digest already exists in a STATIC
    reference shard (the previous crawl / already-trained data), then
    optionally dedup within the stream itself (stateful, exact).

    Scale shape: stream-static LEFT ANTI join on the md5 digest — the
    reference reduces to DISTINCT digests once (Spark re-plans the
    static side per micro-batch but never shuffles the stream on
    content), and within-stream state is one digest per surviving doc.
    Mirrors the batch ``operators/dedup.dedup_against``."""
    from ..operators.dedup import normalize_text

    digest = F.md5(normalize_text(F.col(text_col)))
    ref_digest = F.md5(normalize_text(F.col(ref_text_col or text_col)))
    # materialize the reference digests ONCE: (a) the static side would
    # otherwise be re-derived every micro-batch, and (b) engine-built
    # frames carry a monotonically_increasing_id projection in their
    # lineage, which streaming plans reject — checkpointing truncates it
    ref = (reference.select(ref_digest.alias("__digest__")).distinct()
           .localCheckpoint(eager=True))
    out = (stream.withColumn("__digest__", digest)
           .join(ref, "__digest__", "left_anti"))
    if dedup_within_stream:
        out = out.dropDuplicates(["__digest__"])
    return out.drop("__digest__")
