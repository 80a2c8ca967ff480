"""Differential testing against the actual reference implementation.

Beyond the two golden fixtures, this generates synthetic songs, runs the
REFERENCE C library on them (built in baseline/ against the validated FFT
shim), and compares its force vectors with bliss-tpu's float64 parity mode.
This catches divergences the fixtures can't reach (different spectral
shapes, silence patterns, beat structures).
"""

import os
import re
import subprocess

import numpy as np
import pytest

from bliss_tpu.config import AnalysisConfig
from bliss_tpu.features import PCMBatch, analyze_batch_jit
from bliss_tpu.io import decode
from bliss_tpu.io.flac_writer import write_flac

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = os.path.join(REPO, "baseline", "build")
PARITY = AnalysisConfig.for_parity()


@pytest.fixture(scope="module")
def ref_analyze_bin():
    binary = os.path.join(BUILD, "analyze")
    if not os.path.exists(binary):
        if not os.path.isdir("/root/reference"):
            pytest.skip("reference checkout unavailable")
        r = subprocess.run(
            ["bash", os.path.join(REPO, "baseline", "build_baseline.sh")],
            capture_output=True,
            text=True,
        )
        if r.returncode != 0:
            pytest.skip(f"baseline build unavailable: {r.stderr[-300:]}")
        subprocess.run(
            ["make", "-C", BUILD, "analyze"], check=True, capture_output=True
        )
    return binary


def _run_reference(binary, path):
    env = dict(
        os.environ,
        LD_LIBRARY_PATH=f"{BUILD}:{os.path.join(REPO, 'baseline', 'fftw_shim', 'lib')}",
    )
    out = subprocess.run(
        [binary, path], capture_output=True, text=True, env=env, timeout=120
    ).stdout
    m = re.search(
        r"Force vector: \(([-\d.]+), ([-\d.]+), ([-\d.]+), ([-\d.]+)\)", out
    )
    assert m, f"unparseable reference output: {out!r}"
    return np.array([float(m.group(i)) for i in range(1, 5)])


def _synth_song(rng, seconds, kind):
    """Stereo 22.05 kHz s16 with audible structure (strong beats so the
    epsilon-peak counter is not knife-edge)."""
    sr = 22050
    n = sr * seconds
    t = np.arange(n)
    if kind == "beats":
        env = (np.sin(2 * np.pi * t * 2.0 / sr) > 0.4).astype(float)
        sig = env * 14000 * np.sin(2 * np.pi * 220 * t / sr)
    elif kind == "noisy":
        sig = rng.randn(n) * 6000 + 8000 * np.sin(2 * np.pi * 440 * t / sr)
    else:  # sweep
        f = 100 + 4000 * t / n
        sig = 11000 * np.sin(2 * np.pi * np.cumsum(f) / sr)
    sig = sig * np.clip(t / (0.05 * sr), 0, 1) * np.clip((n - t) / (0.05 * sr), 0, 1)
    left = np.clip(sig, -32767, 32767).astype(np.int16)
    right = np.clip(sig * 0.8, -32767, 32767).astype(np.int16)
    return np.stack([left, right], axis=1)


@pytest.mark.parametrize("kind", ["beats", "noisy", "sweep"])
def test_reference_vs_bliss_tpu_on_synthetic(ref_analyze_bin, tmp_path, kind):
    rng = np.random.RandomState({"beats": 101, "noisy": 202, "sweep": 303}[kind])
    seconds = 5
    frames = _synth_song(rng, seconds, kind)
    # FLAC rather than WAV: the reference decode path never copies codec
    # parameters from the container, so raw-PCM formats fail under modern
    # ffmpeg; FLAC carries parameters in-band.
    path = tmp_path / f"{kind}.flac"
    write_flac(str(path), frames, 22050)

    ref = _run_reference(ref_analyze_bin, str(path))

    d = decode(str(path))  # identical PCM + container duration on both sides
    batch = PCMBatch.from_arrays([np.asarray(d.samples)], [d.duration])
    ours = np.asarray(analyze_batch_jit(batch, PARITY))[0]

    # amplitude / frequency / attack: tight float tolerance
    np.testing.assert_allclose(ours[1], ref[1], atol=5e-4)
    np.testing.assert_allclose(ours[2], ref[2], atol=5e-4)
    np.testing.assert_allclose(ours[3], ref[3], atol=5e-4)
    # tempo is quantized in beats of 4/duration; require the same count
    np.testing.assert_allclose(ours[0], ref[0], atol=1e-4)


@pytest.mark.parametrize("kind", ["beats", "noisy"])
def test_reference_vs_production_hybrid_mode(ref_analyze_bin, tmp_path, kind):
    """The PRODUCTION for_tpu configuration (fused split-conv kernels,
    interpret on CPU, host float64 finish) vs the reference binary: beats
    must match exactly; other features within the float32 gate."""
    from bliss_tpu.config import AnalysisConfig
    from bliss_tpu.features.analyze import analyze_batch_hybrid

    rng = np.random.RandomState({"beats": 404, "noisy": 505}[kind])
    frames = _synth_song(rng, 5, kind)
    path = tmp_path / f"h_{kind}.flac"
    write_flac(str(path), frames, 22050)

    ref = _run_reference(ref_analyze_bin, str(path))
    d = decode(str(path))
    batch = PCMBatch.from_arrays([np.asarray(d.samples)], [d.duration])
    cfg = AnalysisConfig(
        dtype="float32", amplitude_mode="poly", fused_kernel=True,
        tempo_finish="host",
    )
    ours = np.asarray(analyze_batch_hybrid(batch, cfg))[0]

    # tempo: beat counts exact (deviation far below one 4/duration quantum)
    assert abs(ours[0] - ref[0]) < 1e-4
    np.testing.assert_allclose(ours[1], ref[1], atol=5e-4)
    np.testing.assert_allclose(ours[2], ref[2], atol=1e-3)
    np.testing.assert_allclose(ours[3], ref[3], atol=5e-4)
