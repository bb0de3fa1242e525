"""Real media codecs (operators/codecs.py): genuine decode end-to-end
through the multimodal registry — no deterministic fake."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

import go_pandas_spark as gp
from go_pandas_spark.operators import codecs, multimodal, similarity


def test_ppm_roundtrip_and_features():
    # 2x2 image: red, green, blue, white
    pix = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    img = codecs.encode_ppm(2, 2, pix)
    w, h, maxval, out = codecs.decode_ppm(img)
    assert (w, h, maxval) == (2, 2, 255)
    assert out == pix
    f = codecs.ppm_features(img)
    assert len(f) == 16
    # quadrant means: each quadrant is exactly one pixel
    assert f[0:3] == [1.0, 0.0, 0.0]      # top-left red
    assert f[3:6] == [0.0, 1.0, 0.0]      # top-right green
    assert f[6:9] == [0.0, 0.0, 1.0]      # bottom-left blue
    assert f[9:12] == [1.0, 1.0, 1.0]     # bottom-right white
    lums = [1 / 3, 1 / 3, 1 / 3, 1.0]
    mean = sum(lums) / 4
    assert math.isclose(f[12], mean)
    assert math.isclose(f[13], 1 / 3) and math.isclose(f[14], 1.0)
    var = sum((v - mean) ** 2 for v in lums) / 4
    assert math.isclose(f[15], var ** 0.5)


def test_ppm_header_comments_and_errors():
    pix = bytes(range(27))
    img = b"P6\n# a comment\n3 3\n# another\n255\n" + pix
    w, h, maxval, out = codecs.decode_ppm(img)
    assert (w, h) == (3, 3) and out == pix
    with pytest.raises(ValueError):
        codecs.decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError):
        codecs.decode_ppm(codecs.encode_ppm(2, 2, bytes(12))[:-3])


def test_wav_roundtrip_and_features():
    samples = [int(20000 * math.sin(i / 5.0)) for i in range(800)]
    blob = codecs.encode_wav(samples, 8000)
    rate, back = codecs.decode_wav(blob)
    assert rate == 8000 and back == samples
    f = codecs.wav_features(blob)
    assert len(f) == 16
    # constant-ish sine: every segment has similar RMS ~ 20000/sqrt(2)/32768
    expect = 20000 / math.sqrt(2) / 32768.0
    assert all(abs(v - expect) < 0.05 for v in f[:8])
    # zero-crossing rate of sin(i/5): period ~31.4 samples -> ~2 crossings/period
    assert all(0.04 < v < 0.09 for v in f[8:])
    with pytest.raises(ValueError):
        codecs.decode_wav(b"RIFFgarbage")


def test_real_decode_through_registry(spark, sf_dir):
    """Genuine PPM bytes flow through make_media_frame →
    register_decoder → extract_features on executors; features match
    the driver-side decoder exactly (float32 cast tolerance)."""
    docs = gp.read_parquet(spark, f"{sf_dir}/documents.parquet").to_spark() \
        .select("doc_id", "text").orderBy("doc_id").limit(12)
    rows = docs.collect()

    def to_ppm(txt):
        raw = (txt or " ").encode("utf-8")
        return codecs.encode_ppm(8, 8, (raw * (192 // len(raw) + 1))[:192])

    pdf_bytes = {r["doc_id"]: to_ppm(r["text"]) for r in rows}
    enc = spark.createDataFrame(
        [(int(k), bytearray(v)) for k, v in pdf_bytes.items()], "doc_id long, b binary")
    media = multimodal.make_media_frame(enc, "doc_id", "b", "image/x-portable-pixmap")
    multimodal.register_decoder("image/x-portable-pixmap", codecs.ppm_features)
    try:
        got = {r["media_id"]: r["features"]
               for r in multimodal.extract_features(media, dim=16).collect()}
    finally:
        multimodal._DECODERS.pop("image/x-portable-pixmap", None)
    assert set(got) == set(pdf_bytes)
    for did, blob in pdf_bytes.items():
        exp = codecs.ppm_features(blob)
        assert np.allclose(got[did], exp, atol=1e-6)


def test_multimodal_decode_pipeline_query(spark, sf_dir):
    """r10: the pipeline emits REAL-decoded facts (header fields +
    per-channel pixel sums) recomputable from the closed-form pixel
    rule — checked here in pure Python, and by the DuckDB oracle in
    the driver's hash gate."""
    from go_pandas_spark.suite import QUERIES, register_all

    register_all()
    out = QUERIES["multimodal_decode_pipeline"](spark, sf_dir)
    pdf = out.toPandas().set_index("media_id").sort_index()
    assert list(pdf.columns) == ["width", "height", "maxval",
                                 "ch0_sum", "ch1_sum", "ch2_sum"]
    assert (pdf["width"] == 8).all() and (pdf["height"] == 8).all()
    assert (pdf["maxval"] == 255).all()
    for did, row in pdf.head(20).iterrows():
        sums = [0, 0, 0]
        for j in range(192):
            sums[j % 3] += (int(did) * 31 + j * 7) % 256
        assert [row["ch0_sum"], row["ch1_sum"], row["ch2_sum"]] == sums


def test_resize_ppm_exact_nearest_neighbor():
    # 2x2 → 4x4: each source pixel becomes a 2x2 block
    pix = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    img = codecs.encode_ppm(2, 2, pix)
    w, h, _, out = codecs.decode_ppm(codecs.resize_ppm(img, 4, 4))
    assert (w, h) == (4, 4)
    def px(x, y):
        i = 3 * (y * 4 + x)
        return tuple(out[i:i + 3])
    assert px(0, 0) == px(1, 1) == (255, 0, 0)
    assert px(2, 0) == px(3, 1) == (0, 255, 0)
    assert px(0, 2) == px(1, 3) == (0, 0, 255)
    assert px(2, 2) == px(3, 3) == (255, 255, 255)


def test_resize_images_real_ppm_distributed(spark):
    rows = [(i, bytearray(codecs.encode_ppm(
        2, 2, bytes([(i * 7 + j) % 256 for j in range(12)])))) for i in range(20)]
    enc = spark.createDataFrame(rows, "doc_id long, b binary")
    media = multimodal.make_media_frame(enc, "doc_id", "b",
                                        "image/x-portable-pixmap")
    out = multimodal.resize_images(media, 4, 4).toPandas()
    assert len(out) == 20
    for _, r in out.iterrows():
        w, h, _, pix = codecs.decode_ppm(bytes(r["content"]))
        assert (w, h) == (4, 4)
        exp = codecs.resize_ppm(codecs.encode_ppm(
            2, 2, bytes([(r["media_id"] * 7 + j) % 256 for j in range(12)])), 4, 4)
        assert bytes(r["content"]) == exp
        assert r["meta"]["width"] == 4 and r["meta"]["height"] == 4
