"""Deterministic synthetic images — the graft payload source.

BASELINE.json input_hint table shape (authoritative):

    (image_id string, bytes binary, w int, h int, fmt string,
     caption string, phash long)

An image is a PURE FUNCTION of (image_id, w, h, seed): a smooth 2-D
gradient field plus splitmix64 per-pixel noise — so the validator can
re-render the reference pixels from the id alone and check the
input_hint invariant (decoded-pixel allclose / PSNR >= 40 dB for
lossy, byte-equal captions) with NO stored golden files.

Codecs (this container has no PIL/libjpeg/ffmpeg — FIXTURES.md §3):

- ``png``  — real, spec-compliant lossless PNG (pure zlib + struct;
  8-bit RGB, filter 0). Decodable by any external PNG reader.
- ``qjpg`` — the LOSSY stand-in: uniform quantization (step q) of the
  pixels, then PNG-container packing. Max per-channel error q/2 ⇒
  PSNR >= 20*log10(255/(q/2/sqrt(3))) — q=4 gives ~47 dB, safely
  above the 40 dB gate, deterministically.
- ``jpg``  — REAL baseline JPEG (round 5): :func:`decode_jpeg`
  prefers PIL/libjpeg when importable and otherwise uses the in-repo
  pure-Python ITU-T T.81 baseline codec (functions/jpeg.py), whose
  decoder is interop-pinned against third-party-encoded fixtures
  (4:2:0 color + grayscale). :func:`encode_jpeg` emits 4:4:4 JFIF at
  quality 98 (measured ≥ ~43 dB over the generator distribution).
  Non-baseline streams (progressive, arithmetic) fail loudly.

The reference crawler *bans* image URLs (crawler.yaml:3
regexLinkBannedTokens: ``.png|.jpg|.gif``); images+captions are the
graft axis, so correctness here is defined by the input_hint
invariant, not by reference behavior (SURVEY.md §1.3).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from gocrawler_spark.sources.synthetic_web import h64

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)

LOSSY_Q = 4  # quantization step for the 'qjpg' lossy stand-in


# ---------------------------------------------------------------------------
# deterministic pixel field
# ---------------------------------------------------------------------------


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over a uint64 array."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M64
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M64
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M64
    return x ^ (x >> np.uint64(31))


def render_pixels(image_id: str, w: int, h: int, seed: int = 42) -> np.ndarray:
    """Reference pixels for an image id: (h, w, 3) uint8.

    Gradient base (smooth, so phash is meaningful) + bounded noise
    (so images differ). Pure function — re-renderable anywhere.
    """
    key = np.uint64(h64(image_id, "px", seed=seed))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    ux = xx / max(w - 1, 1)  # 0..1
    uy = yy / max(h - 1, 1)
    k = int(key)
    # per-image structure: rotated gradient + oriented sinusoid + blob
    theta = 2.0 * np.pi * ((k >> 3) % 1024) / 1024.0
    rot = ux * np.cos(theta) + uy * np.sin(theta)
    freq = 1.5 + ((k >> 13) % 40) / 8.0
    phase = 2.0 * np.pi * ((k >> 19) % 256) / 256.0
    cx, cy = ((k >> 27) % 97) / 96.0, ((k >> 34) % 89) / 88.0
    r2 = (0.12 + ((k >> 41) % 32) / 100.0) ** 2
    blob = ((ux - cx) ** 2 + (uy - cy) ** 2 < r2) * 90.0
    base = np.stack(
        [
            255.0 * rot.clip(-1, 2) % 256.0 * 0.5 + blob,
            255.0 * (0.5 + 0.5 * np.sin(2 * np.pi * freq * rot + phase)),
            255.0 * (0.5 + 0.5 * np.cos(2 * np.pi * freq * (ux - uy) + phase)) - blob,
        ],
        axis=-1,
    ).clip(0.0, 255.0)
    idx = np.arange(h * w * 3, dtype=np.uint64) + key
    noise = (_splitmix64(idx) % np.uint64(33)).astype(np.float64) - 16.0
    px = base + noise.reshape(h, w, 3)
    return np.clip(np.rint(px), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# PNG codec (pure python/numpy; 8-bit RGB, filter 0)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → PNG bytes (colortype 2, bitdepth 8, filter 0)."""
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), px.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Supports what encode_png emits
    (8-bit RGB, filter 0 scanlines) — raises on anything else."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = 0
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("unsupported PNG flavor")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    if not (raw[:, 0] == 0).all():
        raise ValueError("unsupported PNG filter")
    return raw[:, 1:].reshape(h, w, 3).copy()


_IHDR_END = 8 + 12 + 13  # signature + IHDR chunk (fixed 13-byte body)


def png_with_text(px: np.ndarray, pairs: dict[str, str]) -> bytes:
    """PNG with caption/provenance metadata carried IN the payload:
    one ``iTXt`` chunk per (keyword, value) pair spliced between IHDR
    and IDAT (iTXt because its text field is UTF-8 — captions aren't
    latin-1; flags: uncompressed, no language tag / translation).
    decode_png skips unknown chunks, so pixels round-trip unchanged."""
    base = encode_png(px)
    chunks = b"".join(
        _chunk(
            b"iTXt",
            k.encode("latin-1") + b"\x00\x00\x00\x00\x00"
            + v.encode("utf-8"),
        )
        for k, v in pairs.items()
    )
    return base[:_IHDR_END] + chunks + base[_IHDR_END:]


def read_png_text(data: bytes) -> dict[str, str]:
    """Parse ``tEXt`` (latin-1) and ``iTXt`` (UTF-8) chunks back to a
    dict. CRC-verified: a corrupted text chunk is DROPPED (metadata
    must never be trusted past its checksum), other chunks ignored."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    out: dict[str, str] = {}
    pos = 8
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        crc_ok = (
            pos + 12 + ln <= len(data)
            and struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])[0]
            == (zlib.crc32(tag + body) & 0xFFFFFFFF)
        )
        if tag == b"IEND":
            break
        if crc_ok and tag == b"tEXt":
            k, _, v = body.partition(b"\x00")
            out[k.decode("latin-1")] = v.decode("latin-1")
        elif crc_ok and tag == b"iTXt":
            k, _, rest = body.partition(b"\x00")
            rest = rest[2:]  # compression flag + method
            _lang, _, rest = rest.partition(b"\x00")
            _trans, _, txt = rest.partition(b"\x00")
            out[k.decode("latin-1")] = txt.decode("utf-8", "replace")
        pos += 12 + ln
    return out


# ---------------------------------------------------------------------------
# lossy stand-in + stubbed real JPEG
# ---------------------------------------------------------------------------


def encode_qjpg(px: np.ndarray, q: int = LOSSY_Q) -> bytes:
    """Deterministic lossy codec: quantize channels to step q, pack as
    PNG with a 'qJPG' marker chunk carrying q."""
    quant = ((px.astype(np.int32) + q // 2) // q * q).clip(0, 255).astype(np.uint8)
    png = encode_png(quant)
    return png[:8] + _chunk(b"qJPG", struct.pack(">I", q)) + png[8:]


def decode_qjpg(data: bytes) -> np.ndarray:
    if data[8:16][4:] != b"qJPG":
        raise ValueError("not a qjpg payload")
    (ln,) = struct.unpack(">I", data[8:12])
    rest = data[: 8] + data[8 + 12 + ln :]
    return decode_png(rest)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Real JPEG decode. Prefers PIL/libjpeg when importable (the
    native fast path a deployment would use); otherwise falls back to
    the in-repo pure-Python baseline decoder
    (functions/jpeg.py, ITU-T T.81 from the public spec — interop
    pinned against third-party-encoded fixtures). Either way fmt='jpg'
    payloads run the same decode → PSNR → phash chain; a
    non-baseline stream (progressive etc.) fails loudly in the
    fallback rather than decoding wrong."""
    try:
        import io

        from PIL import Image  # type: ignore

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    except ImportError:
        from gocrawler_spark.functions.jpeg import decode_baseline_jpeg

        return decode_baseline_jpeg(data)


def encode_jpeg(px: np.ndarray, quality: int | None = None) -> bytes:
    """Real baseline JFIF encode (functions/jpeg.py). Default quality
    is PAYLOAD_QUALITY=98: measured worst-case roundtrip PSNR over the
    synthetic generator distribution is ~43.7 dB — above the
    input_hint 40 dB gate with margin (q95 is NOT: ~36 dB against the
    generator's ±16 high-frequency noise)."""
    from gocrawler_spark.functions import jpeg as J

    return J.encode_baseline_jpeg(
        px, J.PAYLOAD_QUALITY if quality is None else quality
    )


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "qjpg":
        return decode_qjpg(data)
    if fmt in ("jpg", "jpeg"):
        return decode_jpeg(data)
    raise ValueError(f"unknown image format {fmt!r}")


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical pixels."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0.0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def ahash64(px: np.ndarray) -> int:
    """64-bit average hash: grayscale → 8x8 box mean → mean-threshold
    bits, MSB-first row-major → signed int64 (Spark LongType).

    Perceptual: small pixel noise flips few bits, so near-duplicate
    images land within a small Hamming distance.
    """
    gray = px.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    cells = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = gray[ys[i] : max(ys[i + 1], ys[i] + 1),
                               xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    bits = (cells > cells.mean()).flatten()
    v = np.uint64(0)
    for b in bits:
        v = (v << np.uint64(1)) | np.uint64(bool(b))
    return int(np.int64(v))


# ---------------------------------------------------------------------------
# per-page image synthesis (the crawl-side source)
# ---------------------------------------------------------------------------


def images_of_page(url: str, seed: int = 42) -> list[dict]:
    """0-3 deterministic images for a page, with captions derived from
    the page's vocabulary (pure function of url+seed)."""
    from gocrawler_spark.sources.synthetic_web import _sentence

    hv = h64(url, "imgs", seed=seed)
    n = hv % 4
    out = []
    for i in range(n):
        iv = h64(url, "img", i, seed=seed)
        image_id = f"{iv:016x}"
        w = 16 + iv % 49  # 16..64 keeps test payloads small
        hgt = 16 + (iv >> 8) % 49
        fmt = "png" if iv % 3 else "qjpg"
        caption = _sentence(h64(image_id, "cap", seed=seed), 12, 4, 3)
        out.append(
            {
                "image_id": image_id,
                "w": int(w),
                "h": int(hgt),
                "fmt": fmt,
                "caption": caption,
                "src_url": url,
            }
        )
    return out


def materialize(meta: dict, seed: int = 42) -> dict:
    """meta → full input_hint row (bytes + phash computed)."""
    px = render_pixels(meta["image_id"], meta["w"], meta["h"], seed)
    data = encode_png(px) if meta["fmt"] == "png" else encode_qjpg(px)
    return {
        "image_id": meta["image_id"],
        "bytes": data,
        "w": meta["w"],
        "h": meta["h"],
        "fmt": meta["fmt"],
        "caption": meta["caption"],
        "phash": ahash64(decode_image(data, meta["fmt"])),
    }


def strip_png_text(data: bytes) -> bytes:
    """Remove every text chunk (tEXt / iTXt / zTXt) from a PNG — the
    EXIF-strip privacy pass for the payload table. Walks the chunk
    stream once and reassembles signature + non-text chunks byte-for-
    byte, so pixels and all other metadata are untouched."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    out = [data[:8]]
    pos = 8
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        end = pos + 12 + ln
        if tag not in (b"tEXt", b"iTXt", b"zTXt"):
            out.append(data[pos:end])
        if tag == b"IEND":
            break
        pos = end
    return b"".join(out)
