"""Dependency-free REAL media codecs for the multimodal registry.

Two formats whose full decode path is implementable with the standard
library alone — so the `operators.multimodal` registry can be proven
end-to-end on genuine bytes even in a container without PIL/librosa:

- **PPM (P6)**: the netpbm binary RGB image format — ASCII header
  (magic, width, height, maxval, ``#`` comments) + raw pixel triples.
- **WAV (PCM)**: RIFF/WAVE parsed with the stdlib ``wave`` module,
  16-bit little-endian samples.

Each format gets an ``encode_*`` (test-fixture construction), a
``decode_*`` (bytes → structured), and a ``*_features`` kernel
(bytes → fixed-width ``list[float]``) whose signature matches the
``multimodal.register_decoder`` contract.

These are real decoders, not fakes: malformed bytes raise ValueError.
"""

from __future__ import annotations

import io
import struct
import wave

# ------------------------------ PPM ------------------------------ #


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary P6 image. ``pixels`` = width*height RGB triples."""
    need = width * height * 3
    if len(pixels) != need:
        raise ValueError(f"need {need} pixel bytes, got {len(pixels)}")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def decode_ppm(content: bytes) -> tuple[int, int, int, bytes]:
    """Parse a binary PPM (P6): returns (width, height, maxval,
    pixel bytes). Handles arbitrary header whitespace and ``#``
    comments per the netpbm spec."""
    if content is None or not content.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) image")
    pos = 2
    fields: list[int] = []
    n = len(content)
    while len(fields) < 3:
        # skip whitespace and comment lines
        while pos < n and content[pos:pos + 1].isspace():
            pos += 1
        if pos < n and content[pos:pos + 1] == b"#":
            while pos < n and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not content[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(content[start:pos]))
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = fields
    need = w * h * 3
    pix = content[pos:pos + need]
    if len(pix) != need:
        raise ValueError(f"PPM pixel data truncated: {len(pix)}/{need}")
    return w, h, maxval, pix


def ppm_features(content: bytes, grid: int = 2) -> list[float]:
    """16-dim feature vector from a decoded PPM: per-quadrant mean
    R/G/B (grid², normalized by maxval) + global mean/min/max/stddev
    of brightness. Pure Python; vectorization happens at the Arrow
    batch level in ``multimodal.extract_features``."""
    w, h, maxval, pix = decode_ppm(content)
    cells = [[0.0, 0.0, 0.0, 0] for _ in range(grid * grid)]
    tot, tot2, mn, mx = 0.0, 0.0, 1.0, 0.0
    npx = w * h
    for i in range(npx):
        x, y = i % w, i // w
        cy, cx = min(y * grid // h, grid - 1), min(x * grid // w, grid - 1)
        cell = cells[cy * grid + cx]
        r = pix[3 * i] / maxval
        g = pix[3 * i + 1] / maxval
        b = pix[3 * i + 2] / maxval
        cell[0] += r
        cell[1] += g
        cell[2] += b
        cell[3] += 1
        lum = (r + g + b) / 3.0
        tot += lum
        tot2 += lum * lum
        mn, mx = min(mn, lum), max(mx, lum)
    out: list[float] = []
    for c in cells:
        k = max(c[3], 1)
        out.extend((c[0] / k, c[1] / k, c[2] / k))
    mean = tot / max(npx, 1)
    var = max(tot2 / max(npx, 1) - mean * mean, 0.0)
    out.extend((mean, mn if npx else 0.0, mx, var ** 0.5))
    return out


def ppm_facts(content: bytes) -> list[float]:
    """Decoded FACTS vector from a real PPM decode: [width, height,
    maxval, channel-0 sum, channel-1 sum, channel-2 sum]. Every entry
    is an exact small integer (≤ w·h·255), so it survives the
    float32 feature contract losslessly and an external oracle can
    recompute it from the pixel-generation rule — the hash-verifiable
    face of the decode pipeline (``suite.llm.multimodal_decode_
    pipeline``), while ``ppm_features`` stays the statistical kernel."""
    w, h, maxval, pix = decode_ppm(content)
    sums = [0, 0, 0]
    for i, b in enumerate(pix):
        sums[i % 3] += b
    return [float(w), float(h), float(maxval),
            float(sums[0]), float(sums[1]), float(sums[2])]


# ------------------------------ WAV ------------------------------ #


def encode_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Mono 16-bit PCM WAV from integer samples (clipped to int16)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        clipped = [max(-32768, min(32767, int(s))) for s in samples]
        wf.writeframes(struct.pack(f"<{len(clipped)}h", *clipped))
    return buf.getvalue()


def decode_wav(content: bytes) -> tuple[int, list[int]]:
    """Parse a PCM WAV: (sample_rate, samples of channel 0)."""
    if content is None:
        raise ValueError("empty WAV content")
    try:
        with wave.open(io.BytesIO(content), "rb") as wf:
            rate = wf.getframerate()
            nch = wf.getnchannels()
            width = wf.getsampwidth()
            raw = wf.readframes(wf.getnframes())
    except wave.Error as e:
        raise ValueError(f"not a PCM WAV: {e}") from e
    if width != 2:
        raise ValueError(f"only 16-bit PCM supported, got {8 * width}-bit")
    all_samples = struct.unpack(f"<{len(raw) // 2}h", raw)
    return rate, list(all_samples[::nch])


def wav_features(content: bytes, segments: int = 8) -> list[float]:
    """16-dim audio features: per-segment RMS energy (normalized to
    [0,1]) and per-segment zero-crossing rate."""
    _, samples = decode_wav(content)
    n = len(samples)
    rms = [0.0] * segments
    zcr = [0.0] * segments
    if n:
        seg_len = max(1, (n + segments - 1) // segments)
        for s in range(segments):
            chunk = samples[s * seg_len:(s + 1) * seg_len]
            if not chunk:
                continue
            acc = sum(v * v for v in chunk) / len(chunk)
            rms[s] = (acc ** 0.5) / 32768.0
            crossings = sum(1 for a, b in zip(chunk, chunk[1:])
                            if (a >= 0) != (b >= 0))
            zcr[s] = crossings / max(len(chunk) - 1, 1)
    return rms + zcr


def resize_ppm(content: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resample of a binary PPM — real pixels in,
    real pixels out, stdlib only."""
    w, h, maxval, pix = decode_ppm(content)
    if maxval != 255:
        raise ValueError("only maxval=255 PPMs supported for resize")
    out = bytearray(new_w * new_h * 3)
    for y in range(new_h):
        sy = min(y * h // new_h, h - 1)
        for x in range(new_w):
            sx = min(x * w // new_w, w - 1)
            si = 3 * (sy * w + sx)
            di = 3 * (y * new_w + x)
            out[di:di + 3] = pix[si:si + 3]
    return encode_ppm(new_w, new_h, bytes(out))
