"""Per-stage unit tests of each analyzer against the NumPy/SciPy oracle on
synthetic signals — coverage the reference lacks entirely (SURVEY.md §4)."""

import numpy as np
import pytest

import oracle as O
from conftest import synth_pcm
from bliss_tpu.config import AnalysisConfig
from bliss_tpu.features import (
    PCMBatch,
    amplitude_scores,
    envelope_finish_host,
    envelope_energies,
    envelope_scores,
    frequency_scores,
)

PARITY = AnalysisConfig.for_parity()


def _batch(arrays, durations=None):
    durations = durations or [max(1, len(a) // 44100) for a in arrays]
    return PCMBatch.from_arrays([np.asarray(a) for a in arrays], durations)


@pytest.fixture(scope="module")
def signals():
    rng = np.random.RandomState(42)
    return [
        synth_pcm(rng, 60_000),
        synth_pcm(rng, 100_352, amp=25000),
        (rng.randint(-20000, 20000, size=80_000)).astype(np.int16),
    ]


def test_amplitude_vs_oracle(signals):
    batch = _batch(signals)
    got = np.asarray(amplitude_scores(batch, PARITY))
    want = [O.amplitude_oracle(s) for s in signals]
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_amplitude_table_vs_iterative(signals):
    batch = _batch(signals)
    it = np.asarray(amplitude_scores(batch, PARITY))
    tb = np.asarray(
        amplitude_scores(batch, AnalysisConfig(dtype="float64", amplitude_mode="table"))
    )
    np.testing.assert_allclose(it, tb, atol=5e-5)


def test_frequency_vs_oracle(signals):
    batch = _batch(signals)
    got = np.asarray(frequency_scores(batch, PARITY))
    want = [O.frequency_oracle(s) for s in signals]
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_frequency_nyquist_dominated_vs_oracle():
    # The reference never accumulates power_spectrum[256] (av_rdft packing,
    # frequency_sort.c:86-93): its peak runs over bins 1..255 only. A signal
    # dominated by the Nyquist frequency diverged by ~2 dB-score before the
    # zero_nyquist fix; keep all paths anchored to the oracle here.
    from bliss_tpu.kernels.pallas_stft import frequency_scores_fused

    L = 64 * 1024
    rng = np.random.RandomState(1)
    mono = (
        np.cos(np.pi * np.arange(L // 2)) * 20000 + rng.randn(L // 2) * 100
    ).clip(-32768, 32767).astype(np.int16)
    st = np.empty(L, np.int16)
    st[0::2] = mono
    st[1::2] = mono
    batch = PCMBatch.from_arrays([st], [3])
    want = O.frequency_oracle(st)
    for mode in ("matmul", "fft"):
        got = float(
            frequency_scores(
                batch, AnalysisConfig(dtype="float64", spectrum_mode=mode)
            )[0]
        )
        assert abs(got - want) < 1e-5, (mode, got, want)
    got_fused = float(frequency_scores_fused(batch, AnalysisConfig())[0])
    assert abs(got_fused - want) < 1e-4


def test_frequency_fft_vs_matmul(signals):
    batch = _batch(signals)
    mm = np.asarray(frequency_scores(batch, PARITY))
    ff = np.asarray(
        frequency_scores(batch, AnalysisConfig(dtype="float64", spectrum_mode="fft"))
    )
    np.testing.assert_allclose(mm, ff, atol=1e-6)


def test_envelope_vs_oracle(signals):
    durations = [3, 5, 4]
    batch = _batch(signals, durations)
    t, a = (np.asarray(x) for x in envelope_scores(batch, PARITY))
    want = [O.envelope_oracle(s, d) for s, d in zip(signals, durations)]
    want_t = [w[0] for w in want]
    want_a = [w[1] for w in want]
    np.testing.assert_allclose(t, want_t, atol=1e-5)
    np.testing.assert_allclose(a, want_a, atol=1e-5)


def test_envelope_parseval_vs_fft(signals):
    batch = _batch(signals)
    pv = envelope_scores(batch, AnalysisConfig(dtype="float64"))  # blocked
    fr = envelope_scores(
        batch,
        AnalysisConfig(dtype="float64", tempo_energy_mode="parseval_framed"),
    )
    ff = envelope_scores(
        batch, AnalysisConfig(dtype="float64", tempo_energy_mode="fft")
    )
    for other in (fr, ff):
        np.testing.assert_allclose(np.asarray(pv[0]), np.asarray(other[0]), atol=1e-9)
        np.testing.assert_allclose(np.asarray(pv[1]), np.asarray(other[1]), atol=1e-9)
    # fft_strict (float32 accumulator replay) agrees within float32 noise
    st = envelope_scores(
        batch, AnalysisConfig(dtype="float64", tempo_energy_mode="fft_strict")
    )
    np.testing.assert_allclose(np.asarray(pv[0]), np.asarray(st[0]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(pv[1]), np.asarray(st[1]), atol=1e-3)


def test_envelope_blocked_iir_vs_scan(signals):
    batch = _batch(signals)
    bl = envelope_scores(batch, AnalysisConfig(dtype="float64"))
    sc = envelope_scores(batch, AnalysisConfig(dtype="float64", iir_mode="scan"))
    np.testing.assert_allclose(np.asarray(bl[0]), np.asarray(sc[0]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(bl[1]), np.asarray(sc[1]), atol=1e-9)


def test_host_finish_matches_device_finish(signals):
    durations = [3, 5, 4]
    batch = _batch(signals, durations)
    t_dev, a_dev = (np.asarray(x) for x in envelope_scores(batch, PARITY))
    fa = np.asarray(envelope_energies(batch, PARITY))
    t_host, a_host = envelope_finish_host(
        fa, np.asarray(batch.n_samples), np.asarray(batch.durations)
    )
    np.testing.assert_allclose(t_dev, t_host, atol=1e-6)
    np.testing.assert_allclose(a_dev, a_host, atol=1e-5)


def test_batch_equals_individual(signals):
    batch_all = _batch(signals, [3, 5, 4])
    from bliss_tpu.features import analyze_batch_jit

    together = np.asarray(analyze_batch_jit(batch_all, PARITY))
    for i, s in enumerate(signals):
        alone = np.asarray(analyze_batch_jit(_batch([s], [[3, 5, 4][i]]), PARITY))
        np.testing.assert_allclose(together[i], alone[0], atol=1e-9)


def test_padding_invariance(signals):
    # The same song padded to very different lengths must produce identical
    # features (mask correctness).
    s = signals[0]
    a = np.asarray(
        amplitude_scores(_batch([s]), PARITY)
    )
    long = PCMBatch.from_arrays([s], [3], pad_multiple=1024 * 64)
    b = np.asarray(amplitude_scores(long, PARITY))
    np.testing.assert_allclose(a, b, atol=1e-9)
    from bliss_tpu.features import analyze_batch_jit

    fa = np.asarray(analyze_batch_jit(_batch([s], [3]), PARITY))
    fb = np.asarray(analyze_batch_jit(PCMBatch.from_arrays([s], [3], pad_multiple=1024 * 64), PARITY))
    np.testing.assert_allclose(fa, fb, atol=1e-9)


def test_envelope_finish_host_chunked_is_bitwise_identical():
    """Multi-worker host finish (real TPU-VM hosts) == single-threaded."""
    rng = np.random.RandomState(77)
    fa = np.abs(rng.randn(24, 1, 256)).astype(np.float32) * 50
    n = rng.randint(30000, 65000, size=24).astype(np.int64)
    dur = rng.randint(1, 4, size=24).astype(np.int64)
    t1, a1 = envelope_finish_host(fa, n, dur, workers=1)
    t4, a4 = envelope_finish_host(fa, n, dur, workers=4)
    np.testing.assert_array_equal(t1, t4)
    np.testing.assert_array_equal(a1, a4)
    # return_aux must ALSO split across workers (the hybrid extended
    # finish depends on it) and concatenate bitwise-identically.
    t1x, a1x, aux1 = envelope_finish_host(
        fa, n, dur, workers=1, return_aux=True
    )
    t4x, a4x, aux4 = envelope_finish_host(
        fa, n, dur, workers=4, return_aux=True
    )
    np.testing.assert_array_equal(t1, t1x)
    np.testing.assert_array_equal(t1x, t4x)
    np.testing.assert_array_equal(a1x, a4x)
    for c1, c4 in zip(aux1, aux4):
        np.testing.assert_array_equal(c1, c4)


def test_beat_metrics_nonpositive_duration_reports_zero_bpm():
    """duration<=0 (zero OR negative container metadata) must yield bpm 0
    from BOTH the device and host implementations — a negative finite bpm
    would poison z-scored clustering and diverge from the streamed path."""
    import jax.numpy as jnp

    from bliss_tpu import constants as C
    from bliss_tpu.features.tempo import beat_metrics, beat_metrics_host

    rng = np.random.RandomState(9)
    fa = np.abs(rng.randn(3, 1, 256)).astype(np.float32) * 50
    n = np.full(3, 256 * C.TEMPO_HOP, np.int64)
    dur = np.array([2.0, 0.0, -3.0])
    bpm_d, _ = beat_metrics(
        jnp.asarray(fa), jnp.asarray(n), jnp.asarray(dur, jnp.float32),
        AnalysisConfig(),
    )
    bpm_h, _ = beat_metrics_host(fa, n, dur)
    assert float(bpm_d[0]) > 0 and float(bpm_h[0]) > 0
    assert float(bpm_d[1]) == float(bpm_h[1]) == 0.0
    assert float(bpm_d[2]) == float(bpm_h[2]) == 0.0
