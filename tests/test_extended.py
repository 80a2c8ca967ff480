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
