"""End-to-end golden parity against the reference's analysis oracles
(reference: tests/test_analyze.c:30-35,63-68; same epsilon semantics)."""

import numpy as np
import pytest

from bliss_tpu.config import AnalysisConfig
from bliss_tpu.features import (
    PCMBatch,
    analyze_batch_hybrid,
    analyze_batch_jit,
    force_and_class,
)

# (tempo, amplitude, frequency, attack), force
GOLDEN = {
    "song.flac": (
        np.array([-8.945454, -10.641844, -10.136086, -15.560563]),
        -20.777929,
    ),
    "song_s32.flac": (
        np.array([-8.218182, -10.641695, -10.179875, -15.561186]),
        -20.821571,
    ),
}

REFERENCE_EPS = 1e-5  # reference: tests/test_analyze.c:6
F32_EPS = 5e-4  # documented tolerance of the float32 fast path


@pytest.fixture(scope="module")
def batch(decoded_song, decoded_s32):
    return PCMBatch.from_arrays(
        [np.asarray(decoded_song.samples), np.asarray(decoded_s32.samples)],
        [decoded_song.duration, decoded_s32.duration],
    )


def _expected():
    feats = np.stack([GOLDEN["song.flac"][0], GOLDEN["song_s32.flac"][0]])
    force = np.array([GOLDEN["song.flac"][1], GOLDEN["song_s32.flac"][1]])
    return feats, force


def test_parity_mode_matches_reference_eps(batch):
    feats = np.asarray(analyze_batch_jit(batch, AnalysisConfig.for_parity()))
    exp_feats, exp_force = _expected()
    assert np.abs(feats - exp_feats).max() < REFERENCE_EPS
    force, cls = force_and_class(feats)
    assert np.abs(np.asarray(force) - exp_force).max() < REFERENCE_EPS * 4
    assert np.asarray(cls).tolist() == [1, 1]  # BL_CALM


def test_hybrid_f32_mode_tolerance_and_exact_beats(batch):
    feats = np.asarray(analyze_batch_hybrid(batch, AnalysisConfig.for_tpu()))
    exp_feats, _ = _expected()
    assert np.abs(feats - exp_feats).max() < F32_EPS
    # The hybrid float64 envelope finish must reproduce the exact beat
    # counts, i.e. tempo to ~float32 resolution.
    assert np.abs(feats[:, 0] - exp_feats[:, 0]).max() < 1e-5


def test_device_f32_mode_close(batch):
    # Fully on-device float32: tempo may differ by a couple of beats
    # (documented); the other three features stay within F32_EPS.
    feats = np.asarray(analyze_batch_jit(batch, AnalysisConfig()))
    exp_feats, _ = _expected()
    assert np.abs(feats[:, 1:] - exp_feats[:, 1:]).max() < F32_EPS
    assert np.abs(feats[:, 0] - exp_feats[:, 0]).max() < 1.5  # +-4 beats @11s


def test_song_api_end_to_end(fixture_dir):
    import bliss_tpu

    s = bliss_tpu.Song(fixture_dir + "/song.flac")
    exp = GOLDEN["song.flac"][0]
    got = s.force_vector.as_array()
    assert np.abs(got - exp).max() < REFERENCE_EPS
    assert abs(s.force - GOLDEN["song.flac"][1]) < REFERENCE_EPS * 4
    assert s.calm_or_loud == bliss_tpu.BL_CALM
    assert s["artist"] == "David TMX"
    assert s["force_vector"]["tempo"] == pytest.approx(exp[0], abs=1e-5)
    assert s.nSamples == 488138
    assert s.duration == 11
    with s:
        pass
    assert s.sample_array is None  # freed by context exit
