"""Edge-case behavior: tiny clips, silence, extreme values.

The reference has undefined behavior on several of these (e.g. an all-zero
song spins forever in the amplitude zero-trim, src/amplitude_sort.c:26-31;
sub-window clips index out of bounds). bliss-tpu's behavior is defined and
pinned here: failures stay contained to NaN components, nothing crashes.
"""

import numpy as np
import pytest

from bliss_tpu.config import AnalysisConfig
from bliss_tpu.features import PCMBatch, analyze_batch_jit, analyze_batch_hybrid

CFG = AnalysisConfig(dtype="float64")


def _one(a, dur=1):
    return PCMBatch.from_arrays([np.asarray(a, np.int16)], [dur])


def test_tiny_clip_does_not_crash():
    rng = np.random.RandomState(0)
    a = rng.randint(-1000, 1000, size=700).astype(np.int16)
    feats = np.asarray(analyze_batch_jit(_one(a), CFG))[0]
    # amplitude well-defined; frequency has zero full windows -> NaN;
    # tempo/attack degrade to their affine offsets.
    assert np.isfinite(feats[1])
    assert np.isnan(feats[2])
    assert np.isfinite(feats[0]) and np.isfinite(feats[3])


def test_silent_song_contained():
    a = np.zeros(50_000, np.int16)
    feats = np.asarray(analyze_batch_jit(_one(a, 2), CFG))[0]
    # silence is degenerate everywhere in the reference's math; we require
    # "no crash, no bogus huge numbers" — components are NaN or finite.
    assert feats.shape == (4,)
    assert not np.isinf(feats).any()


def test_full_scale_samples():
    rng = np.random.RandomState(1)
    a = rng.choice(
        np.array([-32768, -32767, 32767], np.int16), size=80_000
    ).astype(np.int16)
    feats = np.asarray(analyze_batch_jit(_one(a, 3), CFG))[0]
    assert np.isfinite(feats).all()


def test_fused_guard_falls_back_for_short_clips():
    # A short clip with fused_kernel=True must route to the XLA path (the
    # kernels need >= 65536 samples) and produce identical results.
    rng = np.random.RandomState(2)
    a = rng.randint(-9000, 9000, size=30_000).astype(np.int16)
    batch = _one(a, 2)
    fused_cfg = AnalysisConfig(
        dtype="float32", amplitude_mode="poly", fused_kernel=True
    )
    plain_cfg = AnalysisConfig(dtype="float32", amplitude_mode="poly")
    f1 = np.asarray(analyze_batch_jit(batch, fused_cfg))
    f2 = np.asarray(analyze_batch_jit(batch, plain_cfg))
    np.testing.assert_array_equal(f1, f2)


def test_hybrid_handles_short_clip():
    rng = np.random.RandomState(3)
    a = rng.randint(-9000, 9000, size=20_000).astype(np.int16)
    feats = np.asarray(
        analyze_batch_hybrid(_one(a, 1), AnalysisConfig.for_tpu())
    )
    assert feats.shape == (1, 4)
    assert np.isfinite(feats[0, 0])
