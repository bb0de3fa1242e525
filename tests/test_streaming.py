"""Structured Streaming mirror: the streaming result must equal the
batch result for the same expressions (stream-batch parity is the
whole point of the §2.10 mapping)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import go_pandas_spark as gp
from go_pandas_spark.streaming import ops


def _stage_dir(sf_dir: str, name: str) -> str:
    """File streaming sources read directories — stage the fixture
    parquet into a temp dir."""
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=f"stream_{name}_")
    shutil.copy(f"{sf_dir}/{name}.parquet", f"{d}/{name}.parquet")
    return d


@pytest.fixture(scope="module")
def event_stream(spark, sf_dir):
    batch = gp.read_parquet(spark, f"{sf_dir}/events.parquet").to_spark()
    # The fixture stores ts as timestamp[us]; declare it as such (a
    # streaming source requires an explicit schema — no inference).
    raw = ops.read_stream(spark, _stage_dir(sf_dir, "events"),
                          schema="event_id long, ts timestamp, user_id long, "
                                 "event_type string, value double, props string")
    return batch, raw


def test_streaming_resample_equals_batch(spark, event_stream):
    batch, stream = event_stream
    spec = {"v_sum": ("value", "sum"), "n": ("event_id", "count")}
    out = ops.resample_stream(stream, "1h", "ts", spec, watermark="10min")
    ops.run_to_memory(out, "resampled", output_mode="complete")
    got = spark.sql("SELECT * FROM resampled").orderBy("ts").collect()
    exp = (batch.groupBy(F.window("ts", "1 hour").alias("w"))
           .agg(F.sum("value").alias("v_sum"), F.count("event_id").alias("n"))
           .select(F.col("w.start").alias("ts"), "v_sum", "n").orderBy("ts").collect())
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g["ts"] == e["ts"] and g["n"] == e["n"]
        assert abs(g["v_sum"] - e["v_sum"]) < 1e-6


def test_streaming_sliding_window(spark, event_stream):
    _, stream = event_stream
    out = ops.sliding_window_stream(stream, "2h", "1h", "ts",
                                    {"v_mean": ("value", "mean")}, watermark="10min")
    ops.run_to_memory(out, "slid", output_mode="complete")
    rows = spark.sql("SELECT * FROM slid").collect()
    assert len(rows) > 0
    # overlapping windows: ~2 windows per hour bucket
    starts = {r["window_start"] for r in rows}
    assert len(starts) == len(rows)


def test_streaming_sessionize(spark, event_stream):
    _, stream = event_stream
    out = ops.sessionize(stream, "30min", "ts", ["user_id"],
                         {"n_events": ("event_id", "count"),
                          "v_sum": ("value", "sum")}, watermark="10min")
    ops.run_to_memory(out, "sessions", output_mode="complete")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert len(rows) > 0
    for r in rows:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1


def test_streaming_stateful_dedup(spark, event_stream):
    batch, stream = event_stream
    out = ops.stateful_dedup(stream, ["user_id", "event_type"], ts_col="ts", watermark="1h")
    ops.run_to_memory(out, "deduped", output_mode="append")
    n = spark.sql("SELECT count(*) AS n FROM deduped").first()["n"]
    exact = batch.dropDuplicates(["user_id", "event_type"]).count()
    # within-watermark dedup can keep more rows than global dedup but
    # never fewer, and never more than the input
    assert exact <= n <= batch.count()


def test_streaming_quality_filter_pipeline(spark, sf_dir):
    """LLM-pipeline shape on a stream: text stats + quality gate run
    unchanged on streaming micro-batches (pure expressions)."""
    from go_pandas_spark.operators import text

    raw = ops.read_stream(spark, _stage_dir(sf_dir, "documents"),
                          schema="doc_id long, text string, lang string, "
                                 "source string, n_chars long")
    scored = raw.select("doc_id", text.quality_score(F.col("text")).alias("q"))
    good = scored.filter(F.col("q") >= 0.5)
    ops.run_to_memory(good, "quality_stream", output_mode="append")
    n = spark.sql("SELECT count(*) AS n FROM quality_stream").first()["n"]
    batch = gp.read_parquet(spark, f"{sf_dir}/documents.parquet").to_spark()
    exp = batch.select(text.quality_score(F.col("text")).alias("q")).filter(F.col("q") >= 0.5).count()
    assert n == exp


def test_streaming_stream_stream_join_equals_batch(spark, event_stream):
    """view → purchase attribution within 1h per user: the streaming
    join (watermark-bounded state) must produce the batch join's rows."""
    batch, stream = event_stream
    views = (stream.filter(F.col("event_type") == "view")
             .select(F.col("user_id"), F.col("ts").alias("view_ts"),
                     F.col("event_id").alias("view_id")))
    buys = (stream.filter(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("b_user_id"), F.col("ts").alias("buy_ts"),
                    F.col("event_id").alias("buy_id"), F.col("value")))
    joined = ops.stream_stream_join(
        views, buys.withColumnRenamed("b_user_id", "user_id"), ["user_id"],
        "view_ts", "buy_ts", watermark="10min", within="1 hour")
    out = joined.select("l.user_id", "view_id", "buy_id")
    ops.run_to_memory(out, "attributed", output_mode="append")
    got = {(r["view_id"], r["buy_id"])
           for r in spark.sql("SELECT * FROM attributed").collect()}
    bv = batch.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts"), F.col("event_id").alias("view_id"))
    bb = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"))
    exp_df = bv.join(bb, (bv["user_id"] == bb["u2"])
                     & (bb["buy_ts"] >= bv["view_ts"])
                     & (bb["buy_ts"] <= bv["view_ts"] + F.expr("INTERVAL 1 hour")))
    exp = {(r["view_id"], r["buy_id"]) for r in exp_df.collect()}
    assert len(exp) > 0
    assert got == exp


def test_stateful_ewma_stream_matches_pandas(spark, event_stream, sf_dir):
    """applyInPandasWithState custom operator: the final per-user EWMA
    after draining the stream equals pandas ewm(adjust=True).mean()
    over the same per-user ts-ordered values."""
    batch, stream = event_stream
    out = ops.ewma_stream(stream, ["user_id"], "value", alpha=0.3, ts_col="ts")
    ops.run_to_memory(out, "ewmas", output_mode="update")
    rows = spark.sql(
        "SELECT user_id, ewma FROM (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY user_id ORDER BY n_seen DESC) rn FROM ewmas) WHERE rn = 1").collect()
    got = {r["user_id"]: r["ewma"] for r in rows}

    pdf = batch.select("user_id", "ts", "value").toPandas()
    exp = (pdf.sort_values("ts", kind="stable").groupby("user_id")["value"]
           .apply(lambda s: s.dropna().ewm(alpha=0.3, adjust=True).mean().iloc[-1]))
    assert len(got) == len(exp)
    for uid, e in exp.items():
        assert abs(got[uid] - e) < 1e-9, uid


def test_streaming_corpus_pipeline_parity(spark, sf_dir):
    """quality gate + stateful fingerprint dedup over a document
    stream keeps exactly the batch pipeline's surviving content."""
    from go_pandas_spark.operators import text as T

    batch = gp.read_parquet(spark, f"{sf_dir}/documents.parquet").to_spark()
    stream = ops.read_stream(spark, _stage_dir(sf_dir, "documents"),
                             schema="doc_id long, text string, lang string, "
                                    "source string, n_chars long")
    out = ops.corpus_filter_dedup_stream(stream, "doc_id", "text")
    ops.run_to_memory(out, "corpus_clean", output_mode="append")
    got = {r["fingerprint"] for r in spark.sql("SELECT fingerprint FROM corpus_clean").collect()}

    exp_rows = (batch.withColumn("q", T.quality_score(F.col("text")))
                .filter(F.col("q") >= 0.5)
                .select(T.fingerprint(F.col("text")).alias("fp")).distinct().collect())
    exp = {r["fp"] for r in exp_rows}
    assert got == exp and len(got) > 0


def test_streaming_chunk_and_strip_parity(spark, sf_dir):
    """Round-5 corpus ops on a document STREAM: strip_markup and
    chunk_documents are stateless narrow transforms, so they apply to
    a readStream unchanged and must emit exactly the batch rows."""
    from go_pandas_spark.operators import text as T

    batch = gp.read_parquet(spark, f"{sf_dir}/documents.parquet").to_spark()
    stream = ops.read_stream(spark, _stage_dir(sf_dir, "documents"),
                             schema="doc_id long, text string, lang string, "
                                    "source string, n_chars long")

    def pipe(sdf):
        cleaned = sdf.withColumn(
            "text", T.strip_markup(F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>"))))
        return (T.chunk_documents(cleaned, "doc_id", "text",
                                  chunk_size=40, overlap=8)
                .select("doc_id", "chunk_id", F.md5("chunk_text").alias("h")))

    ops.run_to_memory(pipe(stream), "stream_chunks", output_mode="append")
    got = {tuple(r) for r in spark.sql(
        "SELECT doc_id, chunk_id, h FROM stream_chunks").collect()}
    exp = {tuple(r) for r in pipe(batch).collect()}
    assert got == exp and len(got) > 0


def test_streaming_dedup_against_reference_parity(spark, sf_dir):
    """Stream-static anti-join dedup: the streamed corpus minus a
    static reference shard must keep exactly the batch
    dedup_against() survivors (plus within-stream exact dedup)."""
    from go_pandas_spark.operators import dedup

    batch = gp.read_parquet(spark, f"{sf_dir}/documents.parquet").to_spark()
    # reference = every doc with doc_id % 3 == 0 (simulates prior crawl)
    reference = batch.filter(F.col("doc_id") % 3 == 0).select("text")
    stream = ops.read_stream(spark, _stage_dir(sf_dir, "documents"),
                             schema="doc_id long, text string, lang string, "
                                    "source string, n_chars long")
    out = ops.dedup_against_stream(stream, reference, "doc_id", "text")
    ops.run_to_memory(out.select("doc_id"), "stream_snapdedup", output_mode="append")
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM stream_snapdedup").collect()}

    exp_ids = {r["doc_id"] for r in
               dedup.dedup_against(batch, reference, "doc_id", "text").collect()}
    # batch dedup_against doesn't dedup within the corpus; apply the
    # same exact-dedup-keep-min for parity with the stream's state
    survivors = batch.filter(F.col("doc_id").isin([int(i) for i in exp_ids]))
    kept = {r["doc_id"] for r in
            dedup.exact_dedup(survivors, "text", "doc_id").select("doc_id").collect()}
    # stream keep-first is arrival-order (one file => frame order = min id order
    # not guaranteed; compare digest SETS instead of ids)
    from go_pandas_spark.operators.dedup import normalize_text
    def digests(ids):
        return {r["d"] for r in batch.filter(F.col("doc_id").isin([int(i) for i in ids]))
                .select(F.md5(normalize_text(F.col("text"))).alias("d")).distinct().collect()}
    assert digests(got) == digests(kept) and len(got) > 0


def test_grouped_upsample_raises(spark):
    """groupby(...).resample(...).ffill() would silently merge all
    groups into one spine — must fail loudly until per-group spines
    exist."""
    import pandas as pd

    import go_pandas_spark as gp

    pdf = pd.DataFrame({"k": ["a", "a", "b"],
                        "t": pd.to_datetime(["2024-01-01 00:00",
                                             "2024-01-01 02:00",
                                             "2024-01-01 00:00"]),
                        "v": [1.0, 2.0, 3.0]})
    f = gp.Frame.from_pandas(spark, pdf)
    import pytest as _pytest
    with _pytest.raises(NotImplementedError, match="grouped resample upsampling"):
        f.groupby("k").resample("1h", on="t").ffill()


def test_streaming_splits_and_quantize_parity(spark, sf_dir):
    """Round-6 plumbing on a STREAM: assign_splits and shuffle-key
    derivation are stateless hash projections and quantize_int8 is a
    stateless array transform — all apply to a readStream unchanged
    and must emit exactly the batch rows."""
    from go_pandas_spark.operators import text as T

    batch = gp.read_parquet(spark, f"{sf_dir}/documents.parquet").to_spark()
    stream = ops.read_stream(spark, _stage_dir(sf_dir, "documents"),
                             schema="doc_id long, text string, lang string, "
                                    "source string, n_chars long")

    def pipe(sdf):
        return (T.assign_splits(sdf, "doc_id",
                                {"train": 0.9, "val": 0.05, "test": 0.05},
                                seed=3)
                .select("doc_id", "split"))

    ops.run_to_memory(pipe(stream), "stream_splits", output_mode="append")
    got = {tuple(r) for r in spark.sql(
        "SELECT doc_id, split FROM stream_splits").collect()}
    exp = {tuple(r) for r in pipe(batch).collect()}
    assert got == exp and len(got) > 0

    from go_pandas_spark.operators.similarity import quantize_int8

    ebatch = gp.read_parquet(spark, f"{sf_dir}/embeddings.parquet").to_spark()
    estream = ops.read_stream(spark, _stage_dir(sf_dir, "embeddings"),
                              schema="vec_id long, embedding array<float>, "
                                     "label int")

    def qpipe(sdf):
        q = quantize_int8(sdf)
        return q.select("vec_id", F.round("scale", 6).alias("s"),
                        F.md5(F.col("qvec").cast("string")).alias("h"))

    ops.run_to_memory(qpipe(estream), "stream_quant", output_mode="append")
    got = {tuple(r) for r in spark.sql(
        "SELECT vec_id, s, h FROM stream_quant").collect()}
    exp = {tuple(r) for r in qpipe(ebatch).collect()}
    assert got == exp and len(got) > 0
