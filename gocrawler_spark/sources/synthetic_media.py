"""Deterministic synthetic audio/video — multimodal payload sources.

Multimodal columns follow the image pattern (SURVEY.md §1.3 /
operators/images.py): payloads are opaque BINARY cells with typed
metadata columns, and every payload is a PURE FUNCTION of its id, so
validators re-render the reference signal from the id alone — no
stored golden files.

Containers (this sandbox has no ffmpeg/soundfile — the REAL codecs
here are lib-free, the compressed ones are stubbed):

- ``wav``  — real, spec-compliant RIFF/WAVE PCM s16le (struct-built
  44-byte header + little-endian int16 samples). Any external WAV
  reader decodes it; :func:`decode_wav` parses the header properly
  (chunk walk) rather than assuming offsets.
- ``rawv`` — uncompressed video container: 24-byte header
  ``RAWV | w | h | fps | n_frames`` (uint32 LE each) followed by
  n_frames RGB24 frames. Decode = frombuffer + reshape.
- ``mp3`` / ``h264`` — compressed codecs need external libs; the
  decode entry points are STUBS behind an import-try and raise
  NotImplementedError with the Spark-side plumbing (schema, batching,
  UDF signatures) identical to the real path.

Signals:

- audio: sum of two id-keyed sinusoids + bounded splitmix64 noise,
  int16 — deterministic, so `reference_samples(id) == decode_wav(bytes)`
  exactly.
- video: id-keyed animated gradient (the image field translated per
  frame), uint8 RGB — frame f is a pure function of (video_id, f).
"""

from __future__ import annotations

import struct

import numpy as np

from gocrawler_spark.sources.synthetic_web import h64

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _M64
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M64
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M64
    return x ^ (x >> np.uint64(31))


# ---------------------------------------------------------------------------
# audio
# ---------------------------------------------------------------------------


def reference_samples(audio_id: str, n_samples: int, sample_rate: int,
                      seed: int = 42) -> np.ndarray:
    """Reference PCM for an audio id: (n_samples,) int16."""
    k = int(np.uint64(h64(audio_id, "pcm", seed=seed)))
    t = np.arange(n_samples, dtype=np.float64) / float(sample_rate)
    f1 = 110.0 + (k % 1000)  # 110..1109 Hz
    f2 = 200.0 + ((k >> 10) % 2000)
    a2 = ((k >> 21) % 100) / 300.0
    sig = np.sin(2 * np.pi * f1 * t) + a2 * np.sin(2 * np.pi * f2 * t)
    noise_keys = np.uint64(k) + np.arange(n_samples, dtype=np.uint64)
    noise = (_splitmix64(noise_keys) % np.uint64(401)).astype(np.float64) - 200.0
    pcm = sig / (1.0 + a2) * 12000.0 + noise
    return np.clip(np.round(pcm), -32768, 32767).astype(np.int16)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """RIFF/WAVE PCM s16le mono."""
    data = samples.astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Parse RIFF chunks -> (samples int16, sample_rate). Real parser:
    walks chunks, so extra chunks before 'data' are handled."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, sample_rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack("<HHI", body[:8])
            if audio_fmt != 1 or channels != 1:
                raise ValueError("only PCM mono supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + clen + (clen & 1)
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, sample_rate


def decode_mp3(data: bytes) -> tuple[np.ndarray, int]:
    """STUB — compressed audio needs an external decoder."""
    try:
        import audioread  # noqa: F401  (not present in this container)
    except ImportError:
        raise NotImplementedError(
            "mp3 decode requires an external audio library; the Spark "
            "plumbing (schema/batching/UDF signature) is identical to wav"
        )
    raise NotImplementedError("unreachable in this container")


# ---------------------------------------------------------------------------
# video
# ---------------------------------------------------------------------------

_RAWV_MAGIC = b"RAWV"


def reference_frame(video_id: str, f: int, w: int, h: int,
                    seed: int = 42) -> np.ndarray:
    """Reference frame f of a video: (h, w, 3) uint8 — an id-keyed
    gradient that translates with f (so motion scores are non-zero and
    deterministic)."""
    k = int(np.uint64(h64(video_id, "vid", seed=seed)))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    ux = xx / max(w - 1, 1) + 0.07 * f  # per-frame translation
    uy = yy / max(h - 1, 1) + 0.03 * f
    theta = 2.0 * np.pi * ((k >> 3) % 512) / 512.0
    rot = ux * np.cos(theta) + uy * np.sin(theta)
    base = np.stack(
        [
            127.5 + 100.0 * np.sin(2 * np.pi * (rot + c / 3.0))
            for c in range(3)
        ],
        axis=-1,
    )
    return np.clip(np.round(base), 0, 255).astype(np.uint8)


def encode_rawv(frames: np.ndarray, fps: int) -> bytes:
    """frames: (n, h, w, 3) uint8 -> RAWV container bytes."""
    n, h, w, _ = frames.shape
    hdr = _RAWV_MAGIC + struct.pack("<IIII", w, h, fps, n)
    return hdr + frames.astype(np.uint8).tobytes()


def decode_rawv(data: bytes) -> tuple[np.ndarray, int]:
    """RAWV container -> ((n, h, w, 3) uint8 frames, fps)."""
    if data[:4] != _RAWV_MAGIC:
        raise ValueError("not a RAWV stream")
    w, h, fps, n = struct.unpack("<IIII", data[4:20])
    body = np.frombuffer(data, dtype=np.uint8, count=n * h * w * 3, offset=20)
    return body.reshape(n, h, w, 3), fps


def decode_h264(data: bytes) -> tuple[np.ndarray, int]:
    """STUB — compressed video needs an external decoder."""
    try:
        import av  # noqa: F401  (not present in this container)
    except ImportError:
        raise NotImplementedError(
            "h264 decode requires an external video library; the Spark "
            "plumbing (schema/batching/UDF signature) is identical to rawv"
        )
    raise NotImplementedError("unreachable in this container")
