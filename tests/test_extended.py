"""Extended (ROADMAP) feature set: checks against direct NumPy formulas and
known signal properties."""

import numpy as np
import pytest

from bliss_tpu.config import AnalysisConfig
from bliss_tpu.features import PCMBatch
from bliss_tpu.features.extended import (
    EXTENDED_FEATURE_NAMES,
    extended_features_jit,
    mel_filterbank,
    dct_ii_matrix,
)

CFG = AnalysisConfig(dtype="float64")
IDX = {name: i for i, name in enumerate(EXTENDED_FEATURE_NAMES)}


def _tone(freq, seconds=3, amp=12000, sr=22050):
    t = np.arange(sr * seconds)
    mono = (amp * np.sin(2 * np.pi * freq * t / sr)).astype(np.int16)
    return np.stack([mono, mono], 1).reshape(-1)


def test_feature_names_shape():
    batch = PCMBatch.from_arrays([_tone(440)], [3])
    out = np.asarray(extended_features_jit(batch, CFG))
    assert out.shape == (1, len(EXTENDED_FEATURE_NAMES))
    assert np.isfinite(out).all()


def test_pure_tone_properties():
    batch = PCMBatch.from_arrays([_tone(440), _tone(2000)], [3, 3])
    out = np.asarray(extended_features_jit(batch, CFG))
    # zero-crossing rate of a sine at f is ~2f/sr crossings per sample
    zcr = out[:, IDX["zero_crossing_rate"]]
    np.testing.assert_allclose(zcr[0], 2 * 440 / 22050, rtol=0.02)
    np.testing.assert_allclose(zcr[1], 2 * 2000 / 22050, rtol=0.02)
    # spectral centroid sits at the tone frequency
    cent = out[:, IDX["spectral_centroid_hz"]]
    assert abs(cent[0] - 440) < 45  # within one bin (43 Hz)
    assert abs(cent[1] - 2000) < 45
    # a pure tone is maximally peaked: flatness near 0
    assert (out[:, IDX["spectral_flatness"]] < 0.01).all()
    # loudness of a 12000-amp sine: 20log10(12000/32768/sqrt(2)) ~ -11.7 dB
    np.testing.assert_allclose(out[:, IDX["loudness_db"]], -11.73, atol=0.2)


def test_noise_is_flat_and_loud_rolloff():
    rng = np.random.RandomState(0)
    noise = rng.randint(-15000, 15000, size=22050 * 3 * 2).astype(np.int16)
    batch = PCMBatch.from_arrays([noise], [3])
    out = np.asarray(extended_features_jit(batch, CFG))[0]
    assert out[IDX["spectral_flatness"]] > 0.5  # white noise ~ flat
    # white-noise rolloff(95%) ~ 95% of Nyquist
    assert out[IDX["spectral_rolloff_hz"]] > 0.85 * 11025


def test_mfcc_against_numpy_reference():
    rng = np.random.RandomState(1)
    pcm = (
        8000 * np.sin(2 * np.pi * 300 * np.arange(22050 * 2) / 22050)
        + rng.randn(22050 * 2) * 1000
    )
    stereo = np.stack([pcm, pcm], 1)
    stereo = np.clip(stereo, -32768, 32767).astype(np.int16)
    batch = PCMBatch.from_arrays([stereo.reshape(-1)], [2])
    out = np.asarray(extended_features_jit(batch, CFG))[0]

    # direct NumPy computation of the same definition
    mono = stereo.astype(np.int64).sum(1)
    mono = np.where((mono < 0) & (mono % 2 != 0), mono // 2 + 1, mono // 2)
    nfr = len(mono) // 512
    frames = mono[: nfr * 512].reshape(nfr, 512).astype(np.float64)
    hann = 0.5 * (1 - np.cos(2 * np.pi * np.arange(512) / 511))
    spec = np.abs(np.fft.rfft(frames * hann, axis=1)) ** 2
    mel = spec @ mel_filterbank()
    mfcc = np.log(mel + 1e-12) @ dct_ii_matrix()
    np.testing.assert_allclose(
        out[IDX["mfcc_0"] : IDX["mfcc_0"] + 13], mfcc.mean(0), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        out[IDX["mfcc_std_0"] : IDX["mfcc_std_0"] + 13],
        mfcc.std(0),
        rtol=1e-3,
        atol=1e-3,
    )


def test_padding_invariance_extended():
    pcm = _tone(880, 2)
    a = np.asarray(
        extended_features_jit(PCMBatch.from_arrays([pcm], [2]), CFG)
    )
    b = np.asarray(
        extended_features_jit(
            PCMBatch.from_arrays([pcm], [2], pad_multiple=1024 * 32), CFG
        )
    )
    np.testing.assert_allclose(a, b, atol=1e-9)


def _click_track(rate_hz, seconds=5, sr=22050):
    """Sharp clicks at rate_hz over low noise (a beat-like signal)."""
    rng = np.random.RandomState(5)
    n = sr * seconds
    mono = (rng.randn(n) * 300).astype(np.int16)
    period = sr // rate_hz
    for p in range(0, n, period):
        mono[p : p + 220] = 24000
    return np.stack([mono, mono], 1).reshape(-1)


def test_bpm_of_click_track():
    batch = PCMBatch.from_arrays([_click_track(4)], [5])
    out = np.asarray(extended_features_jit(batch, CFG))[0]
    # 4 clicks/s = 240 bpm; the envelope peak detector should land near it
    assert 180 < out[IDX["bpm"]] < 300, out[IDX["bpm"]]


def test_beat_loudness_orders_clicky_vs_flat():
    rng = np.random.RandomState(8)
    flat = rng.randint(-12000, 12000, size=22050 * 5 * 2).astype(np.int16)
    batch = PCMBatch.from_arrays([_click_track(2), flat], [5, 5])
    out = np.asarray(extended_features_jit(batch, CFG))
    clicky, flat_l = out[:, IDX["beat_loudness"]]
    # the mu-law log compression squashes envelope dynamics, so even a
    # hard click track lands just ~20% above the mean envelope
    assert clicky > 1.1  # beats stand out of the envelope
    assert clicky > flat_l + 0.05  # ...more than in stationary noise


def test_chroma_pitch_classes():
    # 440 Hz = A (pitch class 9 with C=0); 261.6 Hz = C (class 0)
    batch = PCMBatch.from_arrays([_tone(440), _tone(261.6)], [3, 3])
    out = np.asarray(extended_features_jit(batch, CFG))
    ch = out[:, IDX["chroma_00"] : IDX["chroma_00"] + 12]
    np.testing.assert_allclose(ch.sum(1), 1.0, atol=1e-6)
    assert ch[0].argmax() == 9
    assert ch[1].argmax() == 0


def test_precomputed_fa_matches_recompute():
    """extended_features(fa=...) (the fused pipeline path) == recomputing."""
    import jax

    from bliss_tpu.features.extended import extended_features
    from bliss_tpu.features.tempo import band_energies

    batch = PCMBatch.from_arrays([_click_track(3)], [5])
    fa = band_energies(batch, CFG)
    with_fa = np.asarray(
        jax.jit(
            lambda b, f: extended_features(b, CFG, fa=f)
        )(batch, fa)
    )
    without = np.asarray(extended_features_jit(batch, CFG))
    np.testing.assert_allclose(with_fa, without, atol=1e-12)


def _fuzz_songs(n_cases=6, seed=4321):
    """Fuzz-style random songs (tones + beat train + noise + silence gap)
    — the content class on which the round-4 extended differential fuzz
    caught plain-f32 beat_metrics flipping beats vs the core tempo."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
    )
    from fuzz_differential import random_song

    rng = np.random.RandomState(seed)
    arrays, durs = [], []
    for _ in range(n_cases):
        sec = int(rng.randint(3, 9))
        arrays.append(random_song(rng, sec).reshape(-1))
        durs.append(sec)
    return PCMBatch.from_arrays(arrays, durs)


def _beats_from_tempo(tempo, durations):
    # tempo = 4*beats/duration - 30.4  (reference affine)
    return np.rint((np.asarray(tempo) + 30.4) * np.asarray(durations) / 4.0)


def test_extended_bpm_consistent_with_core_tempo_device_exact():
    """Within ONE production program (analyze_batch_ext_jit, for_tpu), the
    extended bpm column must count exactly the beats the core tempo score
    counted. Regression: beat_metrics used the plain-f32 envelope pipeline
    regardless of tempo_finish, losing the <1e-6 envelope precision the
    epsilon peak detector needs — on these fuzz songs the bpm column
    disagreed with the (beat-exact, double-single) core tempo by 1-2 beats
    (caught by `fuzz_differential.py N extended`, round 4)."""
    from bliss_tpu.features.analyze import analyze_batch_ext_jit

    batch = _fuzz_songs()
    durs = np.asarray(batch.durations)
    out = np.asarray(analyze_batch_ext_jit(batch, AnalysisConfig.for_tpu()))
    beats_core = _beats_from_tempo(out[:, 0], durs)
    beats_ext = np.asarray(out[:, 4 + IDX["bpm"]]) * durs / 60.0
    np.testing.assert_allclose(beats_ext, beats_core, atol=1e-4)


def test_extended_bpm_consistent_with_core_tempo_hybrid():
    """Same invariant through the hybrid dispatch (device f32 stage + host
    float64 finish): the finish overwrites the device beat columns from the
    same float64 envelope chain that produced the core tempo."""
    from bliss_tpu.pipeline import _dispatch_analysis

    batch = _fuzz_songs(seed=97)
    durs = np.asarray(batch.durations)
    out = _dispatch_analysis(
        batch, AnalysisConfig.for_tpu_hybrid(), mesh=None, extended=True
    )()
    beats_core = _beats_from_tempo(out[:, 0], durs)
    beats_ext = np.asarray(out[:, 4 + IDX["bpm"]]) * durs / 60.0
    np.testing.assert_allclose(beats_ext, beats_core, atol=1e-4)


def test_extended_features_silent_song_contained():
    """Silence must produce contained (finite or documented) values, not
    crashes: loudness floors at -200 dB, chroma normalizes safely, bpm=0."""
    silent = np.zeros(22050 * 2 * 2, np.int16)
    batch = PCMBatch.from_arrays([silent], [2])
    out = np.asarray(extended_features_jit(batch, CFG))[0]
    assert np.isfinite(out).all()
    assert out[IDX["loudness_db"]] <= -190.0
    assert out[IDX["bpm"]] == 0.0
    assert out[IDX["zero_crossing_rate"]] == 0.0
