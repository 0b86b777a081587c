"""Pure-Python baseline JPEG codec (functions/jpeg.py, ITU-T T.81).

Correctness evidence, in order of strength:
1. INTEROP: decode two fixtures encoded by third-party codecs
   (libjpeg-family output shipped with the CPython / IPython test
   suites) — a 16×16 YCbCr 4:2:0 color image and a 2×2 grayscale —
   exercising subsampled MCU geometry, JFIF markers, and standard
   Huffman streams this repo's encoder never produces.
2. Roundtrip PSNR bounds over the synthetic generator distribution
   (the input_hint 40 dB gate at the payload quality default).
3. Structural properties: byte stuffing, restart intervals, loud
   failure on non-baseline processes.

Fixture provenance (public content, shipped for hermetic tests):
- interop_420_color.jpg  = Lib/test/test_email/data/python.jpg from
  CPython (PSF License 2.0).
- interop_gray_2x2.jpg   = IPython/core/tests/2x2.jpg from IPython
  (BSD 3-Clause).
"""

import numpy as np
import pytest

from gocrawler_spark.fixtures import fixture_path
from gocrawler_spark.functions import jpeg as J
from gocrawler_spark.sources import synthetic_images as SI


def test_roundtrip_clears_input_hint_psnr_floor():
    for w, h in [(24, 16), (33, 25), (8, 8), (64, 48)]:
        px = SI.render_pixels(f"jr-{w}x{h}", w, h, 42)
        data = J.encode_baseline_jpeg(px)  # PAYLOAD_QUALITY default
        dec = J.decode_baseline_jpeg(data)
        assert dec.shape == (h, w, 3)
        assert SI.psnr_db(px, dec) >= 40.0, (w, h)
        # real interchange format: JFIF APP0 + baseline SOF0
        assert data[:4] == b"\xff\xd8\xff\xe0" and data[6:10] == b"JFIF"
        assert b"\xff\xc0" in data and data.endswith(b"\xff\xd9")


def test_quality_trades_bytes_for_fidelity():
    px = SI.render_pixels("jq", 32, 24, 42)
    lo, hi = J.encode_baseline_jpeg(px, 70), J.encode_baseline_jpeg(px, 98)
    assert len(lo) < len(hi)
    p_lo = SI.psnr_db(px, J.decode_baseline_jpeg(lo))
    p_hi = SI.psnr_db(px, J.decode_baseline_jpeg(hi))
    assert p_lo < p_hi


def test_restart_intervals_roundtrip_exactly():
    """DRI/RSTn: same pixels as the unsegmented stream, markers
    actually present, predictors reset per interval (a decoder that
    ignored the reset would drift the DC plane)."""
    px = SI.render_pixels("jrst", 48, 32, 42)  # 24 MCUs at 4:4:4
    plain = J.encode_baseline_jpeg(px, 95)
    rst = J.encode_baseline_jpeg(px, 95, restart_interval=2)
    markers = [
        rst[i + 1]
        for i in range(len(rst) - 1)
        if rst[i] == 0xFF and 0xD0 <= rst[i + 1] <= 0xD7
    ]
    assert len(markers) == 11  # ceil(24/2) - 1 boundaries
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain
    assert np.array_equal(
        J.decode_baseline_jpeg(rst), J.decode_baseline_jpeg(plain)
    )


def test_byte_stuffing_is_exercised_and_reversed():
    stuffed = 0
    for i in range(16):
        px = SI.render_pixels(f"jst-{i}", 16, 16, 42)
        data = J.encode_baseline_jpeg(px, 100)
        sos = data.index(b"\xff\xda")
        if b"\xff\x00" in data[sos:]:
            stuffed += 1
        assert J.decode_baseline_jpeg(data).shape == (16, 16, 3)
    assert stuffed > 0  # an entropy 0xFF byte occurred and was stuffed


def test_interop_third_party_420_color():
    """Third-party-encoded 4:2:0 color JPEG: correct geometry, sane
    content, stable pixels (values pinned as a regression surface
    from the verified first decode — geometry/marker structure is the
    correctness claim, the pins catch silent drift)."""
    data = open(fixture_path("interop_420_color.jpg"), "rb").read()
    out = J.decode_baseline_jpeg(data)
    assert out.shape == (16, 16, 3) and out.dtype == np.uint8
    assert 80.0 < float(out.mean()) < 105.0  # a photo, not noise/flat
    assert np.array_equal(out[0, 0], [0, 2, 7])
    assert np.array_equal(out[15, 15], [0, 1, 6])


def test_interop_third_party_grayscale():
    """Single-component stream: grayscale decode replicated to RGB."""
    data = open(fixture_path("interop_gray_2x2.jpg"), "rb").read()
    out = J.decode_baseline_jpeg(data)
    assert out.shape == (2, 2, 3) and out.dtype == np.uint8
    assert np.array_equal(out[..., 0], out[..., 1])
    assert np.array_equal(out[..., 0], out[..., 2])
    assert np.array_equal(out, np.full((2, 2, 3), 128, dtype=np.uint8))


def test_non_baseline_fails_loudly():
    data = bytearray(open(fixture_path("interop_420_color.jpg"), "rb").read())
    i = bytes(data).index(b"\xff\xc0")
    data[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="SOF2"):
        J.decode_baseline_jpeg(bytes(data))
    with pytest.raises(ValueError):
        J.decode_baseline_jpeg(b"not a jpeg at all")


def test_seam_routes_fmt_jpg_to_real_codec():
    px = SI.render_pixels("jseam", 16, 16, 42)
    data = SI.encode_jpeg(px)
    out = SI.decode_image(data, "jpg")
    assert np.array_equal(out, J.decode_baseline_jpeg(data))
    assert SI.psnr_db(px, out) >= 40.0


def test_roundtrip_fixture_fresh():
    """The pinned (bytes_len, psnr_milli) oracle constants equal a
    fresh recompute from the codec — any DCT/quantization/Huffman/
    color-math drift fails here before it fails the driver gate."""
    from gocrawler_spark.fixtures import jpeg_roundtrip as JR

    assert JR.regenerate() == JR.ROUNDTRIP
