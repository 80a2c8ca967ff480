"""device_exact tempo finish: the double-single on-device chain must agree
with the float64 host finish (the validated beat-exact oracle) to float32
output resolution, with IDENTICAL beat counts."""

import numpy as np
import pytest

import jax

from bliss_tpu import constants as C
from bliss_tpu.config import AnalysisConfig
from bliss_tpu.features import PCMBatch, analyze_batch_jit
from bliss_tpu.features.tempo import (
    band_energies,
    envelope_finish_device,
    envelope_finish_host,
)

CFG = AnalysisConfig(
    dtype="float32", amplitude_mode="poly", tempo_finish="device_exact"
)


def _beats(tempo, durations):
    return np.round((tempo - C.TEMPO_BIAS) * durations / C.TEMPO_SCALE)


@pytest.fixture(scope="module")
def fixture_batch(decoded_song):
    base = np.asarray(decoded_song.samples)
    arrays = [np.roll(base, 1013 * i) for i in range(4)]
    return PCMBatch.from_arrays(arrays, [decoded_song.duration] * 4)


def test_device_exact_matches_host_f64_on_fixture(fixture_batch):
    fa = jax.jit(lambda b: band_energies(b, CFG))(fixture_batch)
    n = np.asarray(fixture_batch.n_samples)
    dur = np.asarray(fixture_batch.durations)
    th, ah = envelope_finish_host(np.asarray(fa), n, dur)
    td, ad = jax.jit(
        lambda fa, n, d: envelope_finish_device(fa, n, d, CFG)
    )(fa, fixture_batch.n_samples, fixture_batch.durations)
    td, ad = np.asarray(td), np.asarray(ad)
    assert (_beats(td, dur) == _beats(th, dur)).all()
    assert np.abs(td - th).max() < 2e-6
    assert np.abs(ad - ah).max() < 1e-4


def test_device_exact_matches_host_f64_on_synthetic_envelopes():
    """Random band-energy tensors (incl. multi-band) straight into both
    finishes — covers magnitudes and band counts the fixture does not."""
    rng = np.random.RandomState(5)
    B, NB, NBF = 6, 5, 700
    fa = (rng.rand(B, NB, NBF).astype(np.float32) ** 3) * rng.choice(
        [1e-3, 1.0, 1e4], (B, 1, 1)
    ).astype(np.float32)
    n = np.full(B, NBF * C.TEMPO_HOP, np.int32)
    n[1] -= 13337  # a shorter song: exercises the n2 masks
    dur = (n / 44100.0).astype(np.float32)
    cfg = AnalysisConfig(
        dtype="float32",
        amplitude_mode="poly",
        tempo_finish="device_exact",
        filterbank="reference5",
    )
    th, ah = envelope_finish_host(fa, n, dur)
    td, ad = jax.jit(
        lambda fa, n, d: envelope_finish_device(fa, n, d, cfg)
    )(fa, n, dur)
    td, ad = np.asarray(td), np.asarray(ad)
    assert (_beats(td, dur) == _beats(th, dur)).all()
    assert np.abs(td - th).max() < 2e-6
    assert np.abs((ad - ah) / np.abs(ah).clip(1e-3)).max() < 1e-5


def test_degenerate_rows_match_pinned_behavior():
    """Zero-length / zero-duration rows keep the reference's inf pinning."""
    fa = np.zeros((2, 1, 64), np.float32)
    n = np.array([0, 64 * C.TEMPO_HOP], np.int32)
    dur = np.array([0.0, 0.743], np.float32)
    td, ad = jax.jit(
        lambda fa, n, d: envelope_finish_device(fa, n, d, CFG)
    )(fa, n, dur)
    assert not np.isfinite(np.asarray(ad)[0])  # n=0 -> division by zero
    assert np.isfinite(np.asarray(td)[1])


def test_full_analyze_device_exact_hits_goldens(decoded_song, decoded_s32):
    """analyze_batch with tempo_finish='device_exact' (no host stage) must
    match the reference tempo golden to float32 resolution — the round-3
    capability the hybrid existed to provide."""
    batch = PCMBatch.from_arrays(
        [np.asarray(decoded_song.samples), np.asarray(decoded_s32.samples)],
        [decoded_song.duration, decoded_s32.duration],
    )
    feats = np.asarray(analyze_batch_jit(batch, CFG))
    exp = np.stack(
        [
            np.array([-8.945454, -10.641844, -10.136086, -15.560563]),
            np.array([-8.218182, -10.641695, -10.179875, -15.561186]),
        ]
    )
    assert np.abs(feats[:, 0] - exp[:, 0]).max() < 1e-5  # beat-exact tempo
    assert np.abs(feats - exp).max() < 5e-4
