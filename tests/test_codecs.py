"""Vendored image codec (multimodal/codecs.py): P6 PPM and 24-bit BMP
decode against hand-built byte layouts, and bilinear resize against
closed-form expectations. Pure numpy — no Spark session needed."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from database_fragmentation_and_query_processor_spark.multimodal import (
    codecs as C,
)


def test_ppm_roundtrip():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert (C.decode_ppm(C.encode_ppm(img)) == img).all()


def test_ppm_header_comments_and_magic():
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    raw = b"P6\n# a comment\n2 2\n# another\n255\n" + img.tobytes()
    assert (C.decode_ppm(raw) == img).all()
    with pytest.raises(ValueError, match="P6"):
        C.decode_ppm(b"P5\n2 2\n255\n" + b"\x00" * 4)
    with pytest.raises(ValueError, match="truncated"):
        C.decode_ppm(b"P6\n2 2\n255\n" + b"\x00" * 5)


def _bmp_bytes(img: np.ndarray, top_down: bool = False) -> bytes:
    """Hand-built uncompressed 24-bit BMP: 14-byte file header +
    40-byte BITMAPINFOHEADER + BGR rows padded to 4 bytes, bottom-up
    unless top_down."""
    h, w = img.shape[:2]
    row = (w * 3 + 3) & ~3
    pad = row - w * 3
    px = bytearray()
    ys = range(h) if top_down else range(h - 1, -1, -1)
    for y in ys:
        for x in range(w):
            r, g, b = img[y, x]
            px += bytes([b, g, r])
        px += b"\x00" * pad
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(px), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, (-h if top_down else h), 1, 24, 0, len(px), 2835, 2835, 0, 0,
    )
    return header + info + bytes(px)


def test_bmp_bottom_up_and_top_down():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)  # w=5: padded rows
    assert (C.decode_bmp(_bmp_bytes(img)) == img).all()
    assert (C.decode_bmp(_bmp_bytes(img, top_down=True)) == img).all()


def test_bmp_rejects_unsupported():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    raw = bytearray(_bmp_bytes(img))
    raw[28] = 32  # bpp
    with pytest.raises(ValueError, match="24-bit"):
        C.decode_bmp(bytes(raw))


def test_sniffing():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    assert C.decode_image_rgb(C.encode_ppm(img)).shape == (2, 2, 3)
    assert C.decode_image_rgb(_bmp_bytes(img)).shape == (2, 2, 3)
    with pytest.raises(ValueError, match="container"):
        C.decode_image_rgb(b"\x89PNG....")


def test_resize_identity_and_average():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    assert (C.resize_rgb(img, 6, 4) == img).all()
    # 2x2 -> 1x1 at half-pixel centers samples (0.5, 0.5): the exact
    # mean of the four pixels
    quad = np.array(
        [[[10, 0, 0], [20, 0, 0]], [[30, 0, 0], [40, 0, 0]]], dtype=np.uint8
    )
    one = C.resize_rgb(quad, 1, 1)
    assert one[0, 0, 0] == 25


def test_resize_upscale_edges_clamped():
    img = np.zeros((1, 2, 3), dtype=np.uint8)
    img[0, 0] = [0, 0, 0]
    img[0, 1] = [200, 200, 200]
    up = C.resize_rgb(img, 4, 1).astype(int)
    # monotone ramp, clamped at the ends (no wraparound/overshoot)
    vals = up[0, :, 0].tolist()
    assert vals == sorted(vals)
    assert vals[0] == 0 and vals[-1] == 200


# ---------------------------------------------------------------------------
# property tests (hypothesis)
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


if HAVE_HYP:

    @st.composite
    def _images(draw):
        h = draw(st.integers(min_value=1, max_value=12))
        w = draw(st.integers(min_value=1, max_value=12))
        seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    @settings(max_examples=40, deadline=None)
    @given(_images())
    def test_ppm_roundtrip_property(img):
        assert (C.decode_ppm(C.encode_ppm(img)) == img).all()

    @settings(max_examples=40, deadline=None)
    @given(_images())
    def test_bmp_roundtrip_property(img):
        assert (C.decode_bmp(_bmp_bytes(img)) == img).all()
        assert (C.decode_bmp(_bmp_bytes(img, top_down=True)) == img).all()

    @settings(max_examples=30, deadline=None)
    @given(
        _images(),
        st.integers(min_value=1, max_value=9),
        st.integers(min_value=1, max_value=9),
    )
    def test_resize_bounds_property(img, w, h):
        """Resized pixels are always inside the source min/max per
        channel (bilinear interpolation cannot overshoot), and the
        output shape is exactly (h, w, 3)."""
        out = C.resize_rgb(img, w, h)
        assert out.shape == (h, w, 3)
        for ch in range(3):
            assert out[:, :, ch].min() >= img[:, :, ch].min()
            assert out[:, :, ch].max() <= img[:, :, ch].max()

    @settings(max_examples=20, deadline=None)
    @given(_images())
    def test_resize_constant_image_is_constant(img):
        flat = np.full_like(img, img[0, 0])
        out = C.resize_rgb(flat, 5, 3)
        assert (out == img[0, 0]).all()
