"""Vendored minimal image codec: decode P6 PPM and uncompressed
24-bit BMP payloads to ``(h, w, 3) uint8`` RGB arrays, plus a numpy
bilinear resize — pure numpy, no external media libraries.

Why this exists: the container ships no codec libs (Pillow/ffmpeg),
so the REAL-pixels path of ``resize_images`` was only exercisable
where Pillow happened to be installed. These two formats are trivial,
fully public container specs (netpbm P6; Windows BITMAPINFOHEADER)
that cover the "actual image bytes in, actual pixels out" contract
without any dependency. Production swaps :func:`decode_image_rgb`
for a real decoder; the Spark-side plumbing is identical.
"""

from __future__ import annotations

import struct

import numpy as np


def _ppm_tokens(raw: bytes, count: int) -> tuple[list[int], int]:
    """Read ``count`` whitespace-separated integer header tokens after
    the P6 magic, honoring ``#`` comments; returns (tokens, offset of
    the first pixel byte)."""
    toks: list[int] = []
    i = 2  # past b"P6"
    n = len(raw)
    while len(toks) < count:
        while i < n and raw[i : i + 1].isspace():
            i += 1
        if i < n and raw[i : i + 1] == b"#":
            while i < n and raw[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and not raw[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        toks.append(int(raw[i:j]))
        i = j
    # exactly ONE whitespace byte separates the header from pixel data
    return toks, i + 1


def decode_ppm(raw: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → (h, w, 3) uint8 RGB."""
    if raw[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    (w, h, maxval), off = _ppm_tokens(raw, 3)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (need 1..255)")
    need = w * h * 3
    if len(raw) - off < need:
        raise ValueError("truncated PPM pixel data")
    px = np.frombuffer(raw, dtype=np.uint8, count=need, offset=off)
    return px.reshape(h, w, 3).copy()


def decode_bmp(raw: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) →
    (h, w, 3) uint8 RGB. Handles 4-byte row padding, bottom-up rows
    (positive height) and top-down rows (negative height)."""
    if raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (px_off,) = struct.unpack_from("<I", raw, 10)
    w, h_signed = struct.unpack_from("<ii", raw, 18)
    (bpp,) = struct.unpack_from("<H", raw, 28)
    (compression,) = struct.unpack_from("<I", raw, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (bpp={bpp}, compression={compression}); "
            f"only uncompressed 24-bit is vendored"
        )
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = row_bytes * h
    if len(raw) - px_off < need:
        raise ValueError("truncated BMP pixel data")
    data = np.frombuffer(raw, dtype=np.uint8, count=need, offset=px_off)
    rows = data.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def decode_image_rgb(raw: bytes) -> np.ndarray:
    """Sniff the container magic and decode to (h, w, 3) uint8 RGB."""
    if raw[:2] == b"P6":
        return decode_ppm(raw)
    if raw[:2] == b"BM":
        return decode_bmp(raw)
    raise ValueError(
        "unsupported image container (vendored codec reads P6 PPM and "
        "uncompressed 24-bit BMP; install a codec lib for others)"
    )


def resize_rgb(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Bilinear resize of an (h, w, 3) uint8 array to
    (height, width, 3), sampling at half-pixel centers (the standard
    convention: source x = (i + 0.5)·W/w − 0.5, edge-clamped) —
    vectorized gather + lerp, no per-pixel Python."""
    H, W = arr.shape[:2]
    if (W, H) == (width, height):
        return arr.copy()
    xs = (np.arange(width, dtype=np.float64) + 0.5) * (W / width) - 0.5
    ys = (np.arange(height, dtype=np.float64) + 0.5) * (H / height) - 0.5
    x0 = np.clip(np.floor(xs), 0, W - 1).astype(np.int64)
    y0 = np.clip(np.floor(ys), 0, H - 1).astype(np.int64)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    a = arr.astype(np.float64)
    top = a[y0][:, x0] * (1 - fx) + a[y0][:, x1] * fx
    bot = a[y1][:, x0] * (1 - fx) + a[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → binary P6 bytes (test/fixture helper)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def split_ppm_stream(raw: bytes) -> list[bytes]:
    """Concatenated P6 payloads → list of single-frame P6 payloads —
    the minimal multi-frame "video" container the vendored codec can
    carve without external libs. Each P6 frame is self-describing
    (header declares w, h), so the stream splits by walking
    header + w·h·3 pixel bytes per frame; any misaligned boundary
    fails loudly rather than resynchronizing."""
    frames: list[bytes] = []
    pos, n = 0, len(raw)
    while pos < n:
        if raw[pos : pos + 2] != b"P6":
            raise ValueError(
                f"frame boundary at byte {pos} is not a P6 magic"
            )
        (w, h, maxval), off = _ppm_tokens(raw[pos:], 3)
        if maxval <= 0 or maxval > 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        end = pos + off + w * h * 3
        if end > n:
            raise ValueError(f"truncated frame at byte {pos}")
        frames.append(raw[pos:end])
        pos = end
    return frames
