"""Multimodal columns: image/audio/video as opaque binary + metadata.

Extension beyond the reference surface (SURVEY §7 phase 12). The
Spark-side plumbing is real and tested — schema contract, Arrow batch
shape, partition sizing. Codec kernels: PPM images and WAV audio are
decoded FOR REAL by the stdlib codecs in ``codecs.py`` (decode,
resize, frame-sample run on actual bytes end-to-end); formats that
need external libraries absent from this container (JPEG/PNG/MP3/
video) raise ``NotImplementedError`` unless ``deterministic_fake=True``,
which substitutes a seeded, content-hash-derived fake so the pipeline
shape can still be exercised.

Design notes for 100 TB:
- media bytes travel in a ``binary`` column next to a typed metadata
  struct; never explode frames/samples into rows before filtering on
  metadata (predicate pushdown happens on the struct fields).
- per-batch work runs in ``mapInPandas`` (Arrow batches); batch size
  is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` —
  set it low (e.g. 64) for MB-sized media so a batch fits in memory.
- decoded features are fixed-width ``array<float>`` columns ready for
  `operators.similarity`.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame as SparkDataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])


def make_media_frame(sdf: SparkDataFrame, id_col: str, bytes_col: str, mime: str) -> SparkDataFrame:
    """Wrap an existing binary column into the media contract."""
    return sdf.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(bytes_col).cast("binary").alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_features(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: dim floats derived
    from an md5 HEX-STRING chain over the content. Stable across runs
    and processes — and expressible in ANSI SQL (md5 of an ASCII hex
    string, 8-hex-digit windows as big-endian ints), so the suite's
    ``multimodal_features`` query can be oracle-verified end to end."""
    out = []
    h = hashlib.md5(content or b"").hexdigest()
    while len(out) < dim:
        h = hashlib.md5(h.encode("ascii")).hexdigest()
        for i in range(0, 32, 8):
            v = int(h[i:i + 8], 16)
            out.append((v % 2_000_000) / 1_000_000.0 - 1.0)
    return out[:dim]


# ---------------- decoder registry (THE codec story) ----------------
# The engine never bundles codecs. A deployment registers one decoder
# per mime type (a plain callable ``bytes -> list[float]``, e.g. a
# PIL/torchvision/librosa wrapper shipped to the executors with the
# job); the registry closure is serialized into the Arrow-batched map
# below. In codec-less environments (this container), the
# ``deterministic_fake`` kernel exercises the identical plumbing.

_DECODERS: dict[str, "object"] = {}


def register_decoder(mime: str, fn) -> None:
    """Install ``fn(content: bytes) -> list[float]`` for a mime type
    (e.g. ``register_decoder("image/png", pil_embed)``)."""
    _DECODERS[mime] = fn


def extract_features(media: SparkDataFrame, dim: int = 16,
                     deterministic_fake: bool = False,
                     batch_size: int = 64) -> SparkDataFrame:
    """media → (media_id, features: array<float>).

    Decoder resolution order: a ``register_decoder`` entry for the
    row's ``meta.mime`` → the deterministic fake (when requested) →
    ``NotImplementedError`` naming the registry. The distributed
    shape (Arrow batches, bounded batch size, fixed-width output) is
    identical whichever kernel runs.
    """
    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ])
    decoders = dict(_DECODERS)  # captured into the task closure

    def _run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = []
            for content, mime in zip(pdf["content"], pdf["mime"]):
                fn = decoders.get(mime)
                if fn is not None:
                    feats.append([float(v) for v in fn(content)])
                elif deterministic_fake:
                    feats.append(_fake_features(content, dim))
                else:
                    raise NotImplementedError(
                        f"no decoder registered for {mime!r} and codec "
                        "libraries are absent — register_decoder(mime, fn) "
                        "on a cluster with codecs, or pass "
                        "deterministic_fake=True for plumbing tests")
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    sel = media.select("media_id", "content", F.col("meta.mime").alias("mime"))
    return sel.mapInPandas(_run, schema=out_schema)


def resize_images(media: SparkDataFrame, width: int, height: int,
                  deterministic_fake: bool = False,
                  batch_size: int = 64) -> SparkDataFrame:
    """Image resize over the media contract. PPM rows get a REAL
    nearest-neighbor resample (``operators.codecs.resize_ppm`` —
    decode, resample, re-encode, stdlib only) in Arrow-batched
    ``mapInPandas``; other mimes need a library codec — pass
    ``deterministic_fake=True`` to keep the bytes and only update the
    metadata (plumbing tests)."""
    meta = F.struct(
        F.col("meta.mime").alias("mime"), F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"))
    if deterministic_fake:
        return media.withColumn("meta", meta)

    from . import codecs

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

    def _run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for content, mime in zip(pdf["content"], pdf["mime"]):
                if mime != "image/x-portable-pixmap":
                    raise NotImplementedError(
                        f"no resize codec for {mime!r}; PPM is built in — "
                        "other formats need a library codec on the cluster "
                        "(or deterministic_fake=True for plumbing tests)")
                out.append(codecs.resize_ppm(bytes(content), width, height))
            pdf["content"] = out
            yield pdf

    flat = media.select("media_id", "content", F.col("meta.mime").alias("mime"))
    resized = flat.mapInPandas(_run, schema=flat.schema)
    return (resized.withColumn(
        "meta", F.struct(
            F.col("mime"), F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(None).cast("long").alias("duration_ms")))
        .drop("mime"))


def sample_frames(media: SparkDataFrame, every_ms: int,
                  deterministic_fake: bool = False) -> SparkDataFrame:
    """Stubbed video frame sampling: one output row per sampled frame
    (media_id, frame_idx, ts_ms, frame: binary). The row-explosion
    shape (posexplode over a sequence of timestamps) is the real
    distributed pattern; frame bytes are fake."""
    if not deterministic_fake:
        raise NotImplementedError("video codecs unavailable; deterministic_fake=True for plumbing tests")
    n_frames = F.greatest((F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms).cast("int"), F.lit(1))
    idx = F.sequence(F.lit(0), n_frames - 1)
    ex = media.select("media_id", "content", F.posexplode(idx).alias("frame_idx", "__i__"))
    return ex.select(
        "media_id", "frame_idx",
        (F.col("frame_idx") * every_ms).cast("long").alias("ts_ms"),
        F.sha2(F.concat(F.coalesce(F.col("content"), F.lit(b"")),
                        F.col("frame_idx").cast("string").cast("binary")), 256).cast("binary").alias("frame"),
    )
