"""Drift guards for fixtures/media_feats.py (the pinned pure-function
per-payload feature values behind the decode-path DuckDB oracles).

Recomputes every pinned list from the renderers/codecs via the regen
module (whose functions also assert the all-flags-pass invariants the
oracles rely on) and cross-checks the metadata formulas the SQL side
re-derives instead of pinning. Pure Python — no Spark session.
"""

import importlib.util
import os

from gocrawler_spark.fixtures import media_feats as MF

_SPEC = importlib.util.spec_from_file_location(
    "regen_media_fixtures",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "regen_media_fixtures.py"),
)
regen = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(regen)


def test_validate_psnr_fixture_matches_renderer():
    assert regen.regen_validate_psnr() == list(MF.VALIDATE_PSNR)


def test_resize_pixsum_fixture_matches_renderer():
    assert regen.regen_resize_pixsum() == list(MF.RESIZE_PIXSUM)


def test_audio_feats_fixture_matches_codec():
    assert regen.regen_audio_feats() == list(MF.AUDIO_FEATS)
    # the SQL oracle re-derives n_windows from the metadata formula
    # instead of the pinned value — prove they agree
    for d, n_win, _rms, _zcr in MF.AUDIO_FEATS:
        assert n_win == (2048 + (d * 37) % 4096) // 512


def test_video_feats_fixture_matches_codec():
    assert regen.regen_video_feats() == list(MF.VIDEO_FEATS)
    # SQL re-derives the stride-2 sample count as (n_frames + 1) // 2
    for d, n_sampled, _luma, _motion in MF.VIDEO_FEATS:
        assert n_sampled == (4 + d % 13 + 1) // 2
