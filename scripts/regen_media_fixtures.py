"""Regenerate gocrawler_spark/fixtures/media_feats.py.

Computes the pure-function-of-doc_id per-payload feature values that
the decode-path queries aggregate (image validate PSNR, resized pixel
sums, audio RMS/ZCR, video luma/motion, BPE token counts) so their
DuckDB oracles can treat those values as pinned input data — exactly
the pattern fixtures/image_phash.py established — while independently
re-expressing the aggregation/relational logic in SQL.

Everything is pure Python (the payload renderers are pure functions
of doc_id — NOT of the documents text, which differs at every scale
factor; that is exactly what makes these pinnable and, e.g., per-doc
BPE token counts not).
"""

from __future__ import annotations

import math
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from gocrawler_spark.sources import synthetic_images as SI  # noqa: E402
from gocrawler_spark.sources import synthetic_media as SM  # noqa: E402

N_IMAGES = 300
N_MEDIA = 120


def image_row(d: int):
    """Mirror queries/image_q.images_from_documents row construction."""
    w, h = 16 + d % 49, 16 + (d * 7) % 49
    fmt = "qjpg" if d % 3 == 0 else "png"
    if d % 5 == 1 and d > 0:
        p = d - 1
        rid, w, h = str(p), 16 + p % 49, 16 + (p * 7) % 49
    else:
        rid = str(d)
    px = SI.render_pixels(rid, w, h)
    data = SI.encode_png(px) if fmt == "png" else SI.encode_qjpg(px)
    return rid, w, h, fmt, data


def regen_validate_psnr() -> list[tuple[int, int]]:
    """(doc_id, floor(psnr_db*1e3)) for every NON-TWIN lossy (qjpg)
    image — the only rows contributing to min_lossy_psnr_milli.
    Asserts every non-twin row passes all validate flags."""
    out = []
    for d in range(N_IMAGES):
        if d % 5 == 1 and d > 0:
            continue  # twins are excluded by the query
        rid, w, h, fmt, data = image_row(d)
        ref = SI.render_pixels(str(d), w, h)
        px = SI.decode_image(data, fmt)
        assert px.shape == (h, w, 3), d
        p = SI.psnr_db(ref, px)
        if fmt == "png":
            assert np.array_equal(ref, px), d
            assert math.isinf(p), d
        else:
            assert p >= 40.0, (d, p)
            out.append((d, math.floor(p * 1e3)))
    return out


def regen_resize_pixsum() -> list[tuple[int, int]]:
    """(doc_id, pixel_sum of the 24x24 nearest-neighbor resize) for
    every image row (twins included — the resize query doesn't filter).
    Asserts the round-trip (dims + phash recompute) holds for all."""
    out = []
    th = tw = 24
    for d in range(N_IMAGES):
        rid, w, h, fmt, data = image_row(d)
        px = SI.decode_image(data, fmt)
        yi = (np.arange(th) * px.shape[0]) // th
        xi = (np.arange(tw) * px.shape[1]) // tw
        rs = px[yi][:, xi]
        rt = SI.decode_image(SI.encode_png(rs), "png")
        assert rt.shape == (th, tw, 3), d
        assert np.array_equal(rt, rs), d
        out.append((d, int(rt.astype(np.int64).sum())))
    return out


def regen_audio_feats() -> list[tuple[int, int, int, int]]:
    """(doc_id, n_windows, rms_mean_milli, zcr_milli) for the VALID
    (wav) audio rows — mirrors operators/media.audio_features."""
    window = 512
    out = []
    for d in range(N_MEDIA):
        if d % 7 == 0 and d > 0:
            continue  # mp3 stub rows are all-zero via the SQL CASE
        sr = 8000 + (d % 3) * 4000
        n = 2048 + (d * 37) % 4096
        samples = SM.reference_samples(str(d), n, sr)
        dec, dsr = SM.decode_wav(SM.encode_wav(samples, sr))
        assert dsr == sr and np.array_equal(dec, samples), d
        x = samples.astype(np.float64)
        n_win = len(x) // window
        xw = x[: n_win * window].reshape(n_win, window)
        rms = float(np.sqrt((xw**2).mean(axis=1)).mean()) if n_win else 0.0
        zc = (
            float(np.mean(np.abs(np.diff(np.signbit(samples)))))
            if len(x) > 1
            else 0.0
        )
        out.append((d, n_win, round(rms * 1000), round(zc * 1000)))
    return out


def regen_video_feats() -> list[tuple[int, int, int, int]]:
    """(doc_id, n_sampled, luma_mean_milli, motion_milli) for the VALID
    (rawv) video rows at frame_stride=2 — mirrors
    operators/media.video_features."""
    stride = 2
    out = []
    for d in range(N_MEDIA):
        if d % 11 == 0 and d > 0:
            continue  # h264 stub rows are all-zero via the SQL CASE
        w, h = 16 + d % 17, 16 + (d * 5) % 17
        fps = 8 + (d % 5) * 4
        n = 4 + d % 13
        frames = np.stack([SM.reference_frame(str(d), f, w, h) for f in range(n)])
        dec, dfps = SM.decode_rawv(SM.encode_rawv(frames, fps))
        assert dfps == fps and np.array_equal(dec, frames), d
        sampled = dec[::stride].astype(np.float64)
        luma = sampled @ np.array([0.299, 0.587, 0.114])
        luma_mean = float(luma.mean()) if len(sampled) else 0.0
        motion = (
            float(np.abs(np.diff(luma, axis=0)).mean()) if len(sampled) > 1 else 0.0
        )
        out.append((d, len(sampled), round(luma_mean * 1000), round(motion * 1000)))
    return out


def fmt_list(name: str, rows, per_line: int = 4) -> str:
    body = []
    for i in range(0, len(rows), per_line):
        body.append(
            "    " + " ".join(repr(tuple(r)) + "," for r in rows[i : i + per_line])
        )
    return "{} = [\n{}\n]".format(name, "\n".join(body))


HEADER = '''"""Pinned per-payload feature fixtures (pure functions of doc_id).

Same contract as fixtures/image_phash.py: the decode-path queries'
per-row feature values (image validate PSNR, resized pixel sums,
audio RMS/ZCR, video luma/motion, BPE token counts) are constants per
doc_id, so they are pinned here as VALUES fixtures.  The DuckDB
oracles join them against ``documents`` (only doc_ids present at the
current scale factor materialize) and independently re-express the
aggregation logic — counts, windows-per-sample formulas, group-bys —
in SQL.  Regenerated by scripts/regen_media_fixtures.py; guarded
against renderer/codec drift by tests/test_media_fixtures.py
(fixture == recomputed, plus the all-flags-pass assertions inside the
regen functions themselves).

Lists:
- VALIDATE_PSNR: (doc_id, floor(psnr_db*1e3)) for non-twin qjpg images
- RESIZE_PIXSUM: (doc_id, int64 pixel sum of the 24x24 resize)
- AUDIO_FEATS:   (doc_id, n_windows, rms_mean_milli, zcr_milli), wav rows
- VIDEO_FEATS:   (doc_id, n_sampled, luma_mean_milli, motion_milli), rawv rows
"""

# fmt: off
'''

FOOTER = '''
# fmt: on


def values_sql(rows) -> str:
    """SQL VALUES fragment for joining a fixture against documents."""
    return ", ".join("(" + ", ".join(str(v) for v in r) + ")" for r in rows)
'''


def main() -> None:
    parts = [
        fmt_list("VALIDATE_PSNR", regen_validate_psnr(), 6),
        fmt_list("RESIZE_PIXSUM", regen_resize_pixsum(), 6),
        fmt_list("AUDIO_FEATS", regen_audio_feats(), 5),
        fmt_list("VIDEO_FEATS", regen_video_feats(), 5),
    ]
    path = "/root/repo/gocrawler_spark/fixtures/media_feats.py"
    with open(path, "w") as f:
        f.write(HEADER + "\n\n".join(parts) + FOOTER)
    print("wrote", path)


if __name__ == "__main__":
    main()
