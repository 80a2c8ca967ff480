"""Chunked long-song streaming vs the whole-shape program and the
reference binary. The reference streams any length in O(1) state
(reference: src/tempo_atk_sort.c:117-154); the chunked path must agree
with the whole-shape result — beats exactly — while compiling only
fixed chunk shapes."""

import os
import re
import subprocess

import numpy as np
import pytest

from conftest import synth_pcm
from bliss_tpu import constants as C
from bliss_tpu.config import AnalysisConfig
from bliss_tpu.features import PCMBatch
from bliss_tpu.features.analyze import analyze_batch_hybrid
from bliss_tpu.features.streaming import analyze_song_streaming

CFG = AnalysisConfig(dtype="float32", amplitude_mode="poly", tempo_finish="host")


@pytest.fixture(scope="module")
def song():
    rng = np.random.RandomState(21)
    # ~40 s of structured audio (beats + tones + noise + silence gaps)
    sr = 22050
    n = sr * 40
    t = np.arange(n)
    sig = (
        6000 * np.sin(2 * np.pi * 220 * t / sr)
        + 2500 * np.sin(2 * np.pi * 1300 * t / sr)
        + rng.randn(n) * 800
    )
    phase = (t * 120 / 60 / sr) % 1.0
    sig *= 0.35 + 0.65 * (phase < 0.3)
    sig[: sr // 5] = 0  # leading zeros: exercises the trim correction
    sig[5 * sr : 5 * sr + sr // 3] = 0
    left = np.clip(sig, -32767, 32767).astype(np.int16)
    right = np.clip(sig * 0.8, -32767, 32767).astype(np.int16)
    inter = np.empty(2 * n, np.int16)
    inter[0::2] = left
    inter[1::2] = right
    return inter, n // sr


def _beats(tempo, duration):
    return np.round((tempo - C.TEMPO_BIAS) * duration / C.TEMPO_SCALE)


def test_streaming_matches_whole_shape(song):
    samples, dur = song
    whole = np.asarray(
        analyze_batch_hybrid(PCMBatch.from_arrays([samples], [dur]), CFG)
    )[0]
    streamed = analyze_song_streaming(samples, dur, CFG, chunk_samples=1 << 18)
    assert _beats(streamed[0], dur) == _beats(whole[0], dur)  # exact beats
    assert abs(streamed[1] - whole[1]) < 1e-3  # amplitude (trim-corrected)
    assert abs(streamed[2] - whole[2]) < 1e-3  # frequency
    assert abs(streamed[3] - whole[3]) < 1e-3  # attack


def test_streaming_chunk_size_invariant(song):
    samples, dur = song
    a = analyze_song_streaming(samples, dur, CFG, chunk_samples=1 << 18)
    b = analyze_song_streaming(samples, dur, CFG, chunk_samples=1 << 20)
    assert _beats(a[0], dur) == _beats(b[0], dur)
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_streaming_vs_reference_binary(song, tmp_path):
    """The strongest oracle: the reference's own analyze binary on the same
    audio. Beats must match exactly."""
    build = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "baseline",
        "build",
    )
    analyze_bin = os.path.join(build, "analyze")
    if not os.path.exists(analyze_bin):
        pytest.skip("reference baseline binary not built")
    from bliss_tpu.io.flac_writer import write_flac

    samples, dur = song
    frames = np.stack([samples[0::2], samples[1::2]], axis=1)
    path = str(tmp_path / "long.flac")
    write_flac(path, frames, 22050)
    env = dict(
        os.environ,
        LD_LIBRARY_PATH=f"{build}:{os.path.join(os.path.dirname(build), 'fftw_shim', 'lib')}",
    )
    out = subprocess.run(
        [analyze_bin, path], capture_output=True, text=True, env=env,
        timeout=600,
    ).stdout
    m = re.search(
        r"Force vector: \(([-\d.]+), ([-\d.]+), ([-\d.]+), ([-\d.]+)\)", out
    )
    assert m, f"reference analyze failed: {out[:400]}"
    ref = np.array([float(m.group(k)) for k in range(1, 5)])

    # analyze the SAME decoded PCM the reference saw (the FLAC pads the
    # tail to a whole block, which shifts the final windows)
    from bliss_tpu.io import decode

    d = decode(path)
    streamed = analyze_song_streaming(
        np.asarray(d.samples), d.duration, CFG, chunk_samples=1 << 19
    )
    assert _beats(streamed[0], dur) == _beats(ref[0], dur)
    assert np.abs(streamed[1:] - ref[1:]).max() < 2e-3


def test_streaming_extended_matches_whole_shape(song):
    """The ROADMAP feature set streams too: partials reassemble to the
    whole-shape extended vector (beat features from the float64 envelope,
    so bpm may differ from the float32 whole-shape one by marginal
    beats)."""
    from bliss_tpu.features import EXTENDED_FEATURE_NAMES
    from bliss_tpu.features.extended import extended_features_jit

    samples, dur = song
    batch = PCMBatch.from_arrays([samples], [dur])
    whole = np.asarray(extended_features_jit(batch, CFG))[0]
    row = analyze_song_streaming(
        samples, dur, CFG, chunk_samples=1 << 18, extended=True
    )
    ext = row[4:]
    assert ext.shape[0] == len(EXTENDED_FEATURE_NAMES)
    names = list(EXTENDED_FEATURE_NAMES)
    for i, name in enumerate(names):
        a, b = float(ext[i]), float(whole[i])
        if name == "bpm":
            assert abs(a - b) <= 60.0 * 2 / dur + 1e-6, (name, a, b)
        elif name == "beat_loudness":
            assert abs(a - b) < 0.05, (name, a, b)
        else:
            assert abs(a - b) <= 2e-3 * max(1.0, abs(b)), (name, a, b)


def test_streaming_extended_bpm_consistent_with_core_tempo(song):
    """Within ONE streamed row, the extended bpm column must count exactly
    the beats the core tempo score counted — both now derive from the same
    float64 host envelope chain (regression: beat_metrics recomputed the
    envelope in plain f32 and drifted 1-2 beats on fuzz content, round 4).
    Same invariant as the batched-path tests in test_extended.py."""
    from bliss_tpu.features import EXTENDED_FEATURE_NAMES

    samples, dur = song
    row = analyze_song_streaming(
        samples, dur, CFG, chunk_samples=1 << 18, extended=True
    )
    beats_core = _beats(row[0], dur)
    idx_bpm = list(EXTENDED_FEATURE_NAMES).index("bpm")
    beats_ext = row[4 + idx_bpm] * dur / 60.0
    np.testing.assert_allclose(beats_ext, beats_core, atol=1e-4)


def test_song_api_routes_long_songs(song, tmp_path, monkeypatch):
    """bliss_tpu.analyze() streams songs past the cap too (no giant-shape
    compile through the Song API)."""
    import bliss_tpu
    from bliss_tpu import api

    from bliss_tpu.io.flac_writer import write_flac

    samples, dur = song
    frames = np.stack([samples[0::2], samples[1::2]], axis=1)
    path = str(tmp_path / "api_long.flac")
    write_flac(path, frames, 22050)

    monkeypatch.setattr(api, "LONG_SONG_SAMPLES", 1 << 18)
    called = {}
    from bliss_tpu.features import streaming as streaming_mod

    real = streaming_mod.analyze_song_streaming

    def spy(*a, **k):
        called["yes"] = True
        return real(*a, **k)

    monkeypatch.setattr(streaming_mod, "analyze_song_streaming", spy)
    s = bliss_tpu.analyze(path, cfg=CFG)
    assert called.get("yes"), "long song did not take the streaming path"
    whole = np.asarray(
        analyze_batch_hybrid(
            PCMBatch.from_arrays(
                [np.asarray(s.sample_array)], [s.duration]
            ),
            CFG,
        )
    )[0]
    assert _beats(s.force_vector.tempo, s.duration) == _beats(
        whole[0], s.duration
    )


def test_pipeline_routes_long_songs(tmp_path, monkeypatch):
    """analyze_library sends songs past the cap through the streaming path
    (observable via stats) and the result matches the whole-shape scan."""
    from bliss_tpu.io.flac_writer import write_flac
    from bliss_tpu.pipeline import analyze_library

    rng = np.random.RandomState(3)
    paths = []
    for i, secs in enumerate((2, 14)):  # one short, one "long"
        pcm = np.asarray(synth_pcm(rng, secs * 44100))
        frames = np.stack([pcm[0::2], pcm[1::2]], axis=1)
        p = str(tmp_path / f"s{i}.flac")
        write_flac(p, frames, 22050)
        paths.append(p)

    r_stream = analyze_library(
        paths, cfg=CFG, batch_size=2, long_song_samples=1 << 18
    )
    assert r_stream.ok.all()
    assert "streaming" in r_stream.stats  # the long path actually ran
    r_whole = analyze_library(paths, cfg=CFG, batch_size=2, long_song_samples=None)
    assert _beats(r_stream.features[1, 0], 14) == _beats(
        r_whole.features[1, 0], 14
    )
    np.testing.assert_allclose(
        r_stream.features, r_whole.features, atol=2e-3
    )

    # meshed scans route long songs the same way (round 3): the mesh keeps
    # serving the normal-length batches, the long song streams single-device
    import jax

    from bliss_tpu.parallel import analysis_mesh

    mesh = analysis_mesh(2, 1, devices=jax.devices()[:2])
    r_mesh = analyze_library(
        paths, cfg=CFG, batch_size=2, long_song_samples=1 << 18, mesh=mesh
    )
    assert r_mesh.ok.all()
    assert "streaming" in r_mesh.stats
    np.testing.assert_allclose(
        r_mesh.features, r_stream.features, atol=2e-3
    )


# --- strict / parity / literal-op modes (round 3: every mode streams) ----

PARITY = AnalysisConfig.for_parity()


def test_streaming_parity_mode_matches_whole_shape(song):
    """The float64 strict-parity config (iterative amplitude + fft_strict
    tempo + strict frequency accumulation) streamed vs whole-shape: the
    sequential accumulation orders decompose over in-order chunks, so the
    agreement should be near-bitwise (the envelope finish runs as the
    jitted f64 program whole-shape vs the host f64 finish streamed)."""
    from bliss_tpu.features import analyze_batch_jit

    samples, dur = song
    whole = np.asarray(
        analyze_batch_jit(PCMBatch.from_arrays([samples], [dur]), PARITY)
    )[0]
    streamed = analyze_song_streaming(
        samples, dur, PARITY, chunk_samples=1 << 18
    )
    assert _beats(streamed[0], dur) == _beats(whole[0], dur)
    np.testing.assert_allclose(streamed, whole, atol=2e-6, rtol=0)


def test_streaming_parity_mode_chunk_size_invariant(song):
    """Strict-mode streamed results must be BITWISE chunk-size invariant:
    the histogram is exact counts, the strict frequency sum sees the same
    frames in the same order, and fft_strict windows are chunk-local."""
    samples, dur = song
    a = analyze_song_streaming(samples, dur, PARITY, chunk_samples=1 << 18)
    b = analyze_song_streaming(samples, dur, PARITY, chunk_samples=1 << 20)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize(
    "cfg",
    [
        AnalysisConfig(dtype="float32", tempo_energy_mode="parseval_framed",
                       tempo_finish="host"),
        AnalysisConfig(dtype="float32", tempo_energy_mode="fft",
                       spectrum_mode="fft", tempo_finish="host"),
        AnalysisConfig(dtype="float32", amplitude_mode="iterative",
                       tempo_finish="host"),
    ],
    ids=["parseval_framed", "literal_fft", "iterative_amp"],
)
def test_streaming_literal_modes_match_whole_shape(song, cfg):
    # hybrid = whole-shape device stage + the same host f64 envelope
    # finish streaming uses (the fully-jitted f32 finish may flip
    # epsilon-marginal beats — that's its documented contract)
    samples, dur = song
    whole = np.asarray(
        analyze_batch_hybrid(PCMBatch.from_arrays([samples], [dur]), cfg)
    )[0]
    streamed = analyze_song_streaming(samples, dur, cfg, chunk_samples=1 << 18)
    assert _beats(streamed[0], dur) == _beats(whole[0], dur)
    assert abs(streamed[1] - whole[1]) < 1e-3
    assert abs(streamed[2] - whole[2]) < 1e-3
    assert abs(streamed[3] - whole[3]) < 1e-3


def test_pipeline_routes_long_songs_in_parity_mode(tmp_path):
    """Since every mode streams, a strict-parity library scan also routes
    long songs through the chunked path — and matches the whole-shape
    parity scan beat-exactly."""
    from bliss_tpu.io.flac_writer import write_flac
    from bliss_tpu.pipeline import analyze_library

    rng = np.random.RandomState(7)
    pcm = np.asarray(synth_pcm(rng, 12 * 44100))
    frames = np.stack([pcm[0::2], pcm[1::2]], axis=1)
    p = str(tmp_path / "long.flac")
    write_flac(p, frames, 22050)

    r_stream = analyze_library(
        [p], cfg=PARITY, batch_size=1, long_song_samples=1 << 18
    )
    assert r_stream.ok.all() and "streaming" in r_stream.stats
    r_whole = analyze_library(
        [p], cfg=PARITY, batch_size=1, long_song_samples=None
    )
    assert _beats(r_stream.features[0, 0], 12) == _beats(
        r_whole.features[0, 0], 12
    )
    np.testing.assert_allclose(
        r_stream.features, r_whole.features, atol=2e-6, rtol=0
    )


def test_streaming_multiband_matches_whole_shape(song):
    """The 5-band Klapuri front-end streams too: chunk-local FIR bands +
    the multi-band envelope finish on the assembled energies."""
    cfg = AnalysisConfig(
        dtype="float32", amplitude_mode="poly", tempo_finish="host",
        filterbank="reference5",
    )
    samples, dur = song
    whole = np.asarray(
        analyze_batch_hybrid(PCMBatch.from_arrays([samples], [dur]), cfg)
    )[0]
    streamed = analyze_song_streaming(samples, dur, cfg, chunk_samples=1 << 18)
    assert _beats(streamed[0], dur) == _beats(whole[0], dur)
    np.testing.assert_allclose(streamed, whole, atol=2e-3)
