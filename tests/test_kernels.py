"""Fused Pallas kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import synth_pcm
from bliss_tpu import constants as C
from bliss_tpu.config import AnalysisConfig
from bliss_tpu.features import PCMBatch
from bliss_tpu.features.amplitude import amplitude_scores
from bliss_tpu.features.analyze import analyze_batch
from bliss_tpu.features.tempo import band_energies
from bliss_tpu.kernels import fused_sample_stats

CFG = AnalysisConfig(dtype="float32", amplitude_mode="poly")


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(11)
    a = synth_pcm(rng, 70_000)
    b = rng.randint(-15000, 15000, size=66_000).astype(np.int16)
    b[:100] = 0
    return PCMBatch.from_arrays([a, b], [3, 3])


def test_fused_kernel_matches_xla(batch):
    amp_i, energies = fused_sample_stats(
        batch.samples, batch.n_samples, interpret=True
    )
    amp_kernel = (
        np.float32(C.AMPLITUDE_SCALE) * np.asarray(amp_i)
        + np.float32(C.AMPLITUDE_BIAS)
    )
    amp_ref = np.asarray(amplitude_scores(batch, CFG))
    np.testing.assert_allclose(amp_kernel, amp_ref, atol=2e-5)

    fa_ref = np.asarray(band_energies(batch, CFG))[:, 0]
    n = np.asarray(batch.n_samples)
    energies = np.asarray(energies)[:, 0]  # single band
    NW = energies.shape[1]
    trunc = n - n % C.WINDOW_SIZE
    nwin = -(-(trunc - C.WINDOW_SIZE) // C.TEMPO_HOP)
    wmask = np.arange(NW)[None, :] < nwin[:, None]
    fa_k = np.asarray(energies) * wmask
    ref = fa_ref[:, :NW] if NW <= fa_ref.shape[1] else np.pad(
        fa_ref, ((0, 0), (0, NW - fa_ref.shape[1]))
    )
    rel = np.abs(fa_k - ref) / (np.abs(ref) + 1e-3)
    assert rel.max() < 1e-4


def test_fused_analyze_matches_xla(batch):
    fused = np.asarray(
        jax.jit(lambda b: analyze_batch(b, AnalysisConfig(
            dtype="float32", amplitude_mode="poly", fused_kernel=True)))(batch)
    )
    ref = np.asarray(
        jax.jit(lambda b: analyze_batch(b, CFG))(batch)
    )
    # tempo is quantized (beat counts); others must agree to float32 noise
    np.testing.assert_allclose(fused[:, 1:], ref[:, 1:], atol=1e-3)
    assert np.abs(fused[:, 0] - ref[:, 0]).max() < 1.0


def test_multiband_mode_runs_and_differs(batch):
    from bliss_tpu.features import envelope_scores

    one = envelope_scores(batch, AnalysisConfig(dtype="float64"))
    five = envelope_scores(
        batch, AnalysisConfig(dtype="float64", nb_bands=5)
    )
    t1, a1 = (np.asarray(x) for x in one)
    t5, a5 = (np.asarray(x) for x in five)
    assert np.isfinite(t5).all() and np.isfinite(a5).all()
    # 5 bands integrate more energy: attack sums must differ
    assert np.abs(a5 - a1).max() > 1e-3


def test_multiband_blocked_vs_framed(batch):
    from bliss_tpu.features import envelope_scores

    cfg_b = AnalysisConfig(dtype="float64", nb_bands=3)
    cfg_f = AnalysisConfig(
        dtype="float64", nb_bands=3, tempo_energy_mode="parseval_framed"
    )
    tb, ab = (np.asarray(x) for x in envelope_scores(batch, cfg_b))
    tf, af = (np.asarray(x) for x in envelope_scores(batch, cfg_f))
    np.testing.assert_allclose(tb, tf, atol=1e-9)
    np.testing.assert_allclose(ab, af, atol=1e-9)


# ---- reference filterbanks (the author's own multi-band designs) ----------


def _multiband_energy_oracle(samples, fb):
    """Literal NumPy oracle: per-window zero-state FIR per band + rfft power
    sum over the normalized signal (the straightforward reading of
    reference src/tempo_atk_sort.c:117-154 generalized to NB bands)."""
    from scipy.signal import lfilter
    from oracle import c_trunc_div

    n = samples.shape[0]
    s = samples.astype(np.int64)
    mean = c_trunc_div(int(s.sum()), n)
    var = c_trunc_div(int(((s - mean) ** 2).sum()), n)
    normalized = (s / 32768.0 - mean / 32768.0) / (var / 32768.0 / 32768.0)

    W, half = 512, 256
    trunc_n = n - n % W
    n_windows = -(-(trunc_n - W) // half)
    out = np.zeros((fb.shape[0], n_windows))
    for w in range(n_windows):
        win = normalized[w * half : w * half + W]
        for b in range(fb.shape[0]):
            X = np.fft.rfft(lfilter(fb[b], [1.0], win))
            out[b, w] = np.sum(X.real**2 + X.imag**2)
    return out


def test_reference5_band_energies_match_oracle():
    from bliss_tpu.constants_filterbanks import REFERENCE5

    rng = np.random.RandomState(33)
    samples = np.asarray(synth_pcm(rng, 30_000))
    cfg = AnalysisConfig(dtype="float64", filterbank="reference5")
    assert (cfg.nb_bands, cfg.band_taps) == (5, 17)  # autofilled
    b = PCMBatch.from_arrays([samples], [2])
    fa = np.asarray(band_energies(b, cfg))[0]  # [5, NBF]
    oracle = _multiband_energy_oracle(samples, REFERENCE5)
    nw = oracle.shape[1]
    np.testing.assert_allclose(fa[:, :nw], oracle, rtol=1e-9, atol=1e-9)
    assert np.all(fa[:, nw:] == 0.0)


def test_reference36_band_energies_match_oracle():
    from bliss_tpu.constants_filterbanks import REFERENCE36

    rng = np.random.RandomState(34)
    samples = np.asarray(synth_pcm(rng, 12_000))
    cfg = AnalysisConfig(dtype="float64", filterbank="reference36")
    assert (cfg.nb_bands, cfg.band_taps) == (36, 33)
    b = PCMBatch.from_arrays([samples], [1])
    fa = np.asarray(band_energies(b, cfg))[0]
    oracle = _multiband_energy_oracle(samples, REFERENCE36)
    nw = oracle.shape[1]
    np.testing.assert_allclose(fa[:, :nw], oracle, rtol=1e-9, atol=1e-9)


def test_filterbank_config_validation():
    with pytest.raises(ValueError):
        AnalysisConfig(filterbank="reference5", nb_bands=3)
    with pytest.raises(ValueError):
        AnalysisConfig(filterbank="nope")
    # an EXPLICIT 1-band request with a fixed reference filterbank is a
    # conflict, not a silent override (None-sentinel defaults make it
    # detectable)
    with pytest.raises(ValueError):
        AnalysisConfig(filterbank="reference5", nb_bands=1, band_taps=17)
    assert (AnalysisConfig().nb_bands, AnalysisConfig().band_taps) == (1, 17)


def test_reference5_full_scores_blocked_vs_framed(batch):
    """End-to-end multi-band scores: blocked Parseval == framed FFT."""
    from bliss_tpu.features import analyze_batch_jit

    cfg_b = AnalysisConfig(dtype="float64", filterbank="reference5")
    cfg_f = AnalysisConfig(
        dtype="float64", filterbank="reference5",
        tempo_energy_mode="parseval_framed",
    )
    fb = np.asarray(analyze_batch_jit(batch, cfg_b))
    ff = np.asarray(analyze_batch_jit(batch, cfg_f))
    np.testing.assert_allclose(fb, ff, atol=1e-6)


def test_fused_multiband_matches_xla(batch):
    """Fused kernel with the band grid dimension vs the float64 XLA truth,
    for the firwin 3-band design and the reference's own 5x17 filterbank.

    Sharp bandpass filters cancel catastrophically in float32 (the FIR
    output is a small residual of +-0.2-tap products), so BOTH float32
    implementations carry per-window noise up to ~1e-2 relative on the
    attenuated bands; the fused path must be no noisier than the XLA
    float32 path."""
    for kwargs in (
        dict(nb_bands=3),
        dict(filterbank="reference5"),
    ):
        cfg_f = AnalysisConfig(
            dtype="float32", amplitude_mode="poly", fused_kernel=True,
            **kwargs,
        )
        cfg64 = AnalysisConfig(dtype="float64", **kwargs)
        cfg32 = AnalysisConfig(dtype="float32", amplitude_mode="poly",
                               **kwargs)
        _, energies = fused_sample_stats(
            batch.samples, batch.n_samples, interpret=True,
            nb_bands=cfg_f.nb_bands, band_taps=cfg_f.band_taps,
            filterbank=cfg_f.filterbank,
        )
        truth = np.asarray(band_energies(batch, cfg64))  # [B, NB, NBF]
        xla32 = np.asarray(band_energies(batch, cfg32))
        n = np.asarray(batch.n_samples)
        en = np.asarray(energies)
        NW = en.shape[-1]
        trunc = n - n % C.WINDOW_SIZE
        nwin = -(-(trunc - C.WINDOW_SIZE) // C.TEMPO_HOP)
        wmask = np.arange(NW)[None, None, :] < nwin[:, None, None]
        fa_k = en * wmask

        def rel_err(x):
            return np.abs(x - truth[..., :NW]) / (np.abs(truth[..., :NW]) + 1e-3)

        r_fused = rel_err(fa_k)
        r_xla = rel_err(xla32[..., :NW])
        assert np.median(r_fused) < 1e-5, kwargs
        assert r_fused.max() < 3e-2, (kwargs, r_fused.max())
        assert r_fused.max() < 10 * max(r_xla.max(), 1e-5), (
            kwargs, r_fused.max(), r_xla.max(),
        )


def test_fused_multiband_full_scores(batch):
    """End-to-end analyze_batch: fused multi-band == XLA multi-band."""
    cfg_f = AnalysisConfig(
        dtype="float32", amplitude_mode="poly", fused_kernel=True,
        filterbank="reference5",
    )
    cfg_x = AnalysisConfig(
        dtype="float32", amplitude_mode="poly", filterbank="reference5"
    )
    fused = np.asarray(jax.jit(lambda b: analyze_batch(b, cfg_f))(batch))
    ref = np.asarray(jax.jit(lambda b: analyze_batch(b, cfg_x))(batch))
    np.testing.assert_allclose(fused[:, 1:], ref[:, 1:], atol=1e-3)
    assert np.abs(fused[:, 0] - ref[:, 0]).max() < 1.0


def test_multiband_envelope_scores_match_literal_oracle():
    """Full multi-band tempo+attack vs a literal NumPy transcription of the
    reference's NB_BANDS code path (incl. the pass-1 smoothing buffer
    aliasing band 0's envelope), using the reference's own 5x17 table."""
    from oracle import multiband_envelope_oracle
    from bliss_tpu.constants_filterbanks import REFERENCE5
    from bliss_tpu.features import envelope_scores

    rng = np.random.RandomState(41)
    samples = np.asarray(synth_pcm(rng, 40_000))
    dur = 2
    cfg = AnalysisConfig(dtype="float64", filterbank="reference5")
    b = PCMBatch.from_arrays([samples], [dur])
    t_dev, a_dev = (np.asarray(x)[0] for x in envelope_scores(b, cfg))
    t_or, a_or = multiband_envelope_oracle(samples, dur, REFERENCE5)
    np.testing.assert_allclose(t_dev, t_or, atol=1e-5)
    np.testing.assert_allclose(a_dev, a_or, atol=1e-5)


def test_single_pass_kernel_matches_two_kernel_path(batch):
    """kernels/fused_all (one HBM pass) == fused_stats + pallas_stft."""
    cfg2 = AnalysisConfig(
        dtype="float32", amplitude_mode="poly", fused_kernel=True
    )
    cfg1 = AnalysisConfig(
        dtype="float32", amplitude_mode="poly", fused_kernel=True,
        single_pass=True,
    )
    two = np.asarray(jax.jit(lambda b: analyze_batch(b, cfg2))(batch))
    one = np.asarray(jax.jit(lambda b: analyze_batch(b, cfg1))(batch))
    # identical kernels' math, different tiling: tiny f32 reorder noise
    np.testing.assert_allclose(one[:, 1:], two[:, 1:], atol=1e-4)
    assert np.abs(one[:, 0] - two[:, 0]).max() < 1.0


def _stft_power_oracle(samples: np.ndarray) -> np.ndarray:
    """float64 literal: c_div stereo downmix, hann, rfft power summed over
    non-overlapping 512-sample windows, Nyquist dropped (the reference's
    frequency loop, src/frequency_sort.c:60-93, in exact arithmetic)."""
    from oracle import c_trunc_div
    from bliss_tpu import tables

    W = C.WINDOW_SIZE
    fr = samples.astype(np.int64).reshape(-1, W, 2)
    mono = np.array(
        [[c_trunc_div(int(l + r), 2) for l, r in f] for f in fr], np.float64
    )
    x = mono * tables.hann_window()[None, :]
    X = np.fft.rfft(x, axis=-1)
    p = (X.real**2 + X.imag**2).sum(axis=0)
    p[-1] = 0.0
    return p


def test_stft_precise_vs_fast_accuracy():
    """The 5-matmul "precise" spectrum must sit at the f32-FFT noise floor
    on pathological near-silent-band content where the 3-matmul "fast" form
    visibly deviates through the peak-relative dB (round-3 fuzz: ~0.1 score
    error on 6/200 such cases)."""
    from bliss_tpu.kernels.pallas_stft import (
        frequency_scores_from_power, stft_power,
    )

    # Loud low tone + near-silent highs: quiet bins are ~1e-5 of peak, so
    # a 2^-16-absolute spectrum error is ~their own magnitude.
    n = 2048 * C.WINDOW_SIZE * 2
    t = np.arange(n // 2)
    sig = 24000 * np.sin(2 * np.pi * t / 256.0) + 0.4 * np.sin(
        2 * np.pi * t / 3.1
    )
    samples = np.clip(np.repeat(sig, 2), -32768, 32767).astype(np.int16)
    b = samples[None, :]
    nsamp = jnp.asarray([n], jnp.int32)

    truth = _stft_power_oracle(samples)[None, :]
    fast = np.asarray(stft_power(b, nsamp, precise=False))
    precise = np.asarray(stft_power(b, nsamp, precise=True))

    cfg = AnalysisConfig(dtype="float64")
    s_t = float(frequency_scores_from_power(jnp.asarray(truth), cfg)[0])
    s_f = float(frequency_scores_from_power(jnp.asarray(fast), cfg)[0])
    s_p = float(frequency_scores_from_power(jnp.asarray(precise), cfg)[0])

    assert abs(s_p - s_t) < 2e-3, (s_p, s_t)
    assert abs(s_p - s_t) <= abs(s_f - s_t) + 1e-9
    # amplitude-domain (sqrt power) error on the quiet bins: precise must
    # gain well over a decade vs fast (measured ~89x here; the residual is
    # the kernel's own f32 power accumulation, shared with the reference)
    at, af, ap = (np.sqrt(np.maximum(x, 0.0)) for x in (truth, fast, precise))
    quiet = at < 1e-2 * at.max()
    assert quiet.any()
    e_f = np.abs(af - at)[quiet].max()
    e_p = np.abs(ap - at)[quiet].max()
    assert e_p < e_f / 50.0, (e_p, e_f)


def test_stft_conv_config_threads_through_analyze(batch):
    """stft_conv="fast" and "precise" both run end-to-end (fused two-kernel
    and single-pass) and agree to normal f32 tolerance on ordinary music."""
    outs = {}
    for sp in (False, True):
        for mode in ("precise", "fast"):
            cfg = AnalysisConfig(
                dtype="float32", amplitude_mode="poly", fused_kernel=True,
                single_pass=sp, stft_conv=mode,
            )
            outs[(sp, mode)] = np.asarray(
                jax.jit(lambda b, c=cfg: analyze_batch(b, c))(batch)
            )
    base = outs[(False, "precise")]
    for k, v in outs.items():
        np.testing.assert_allclose(v[:, 1:], base[:, 1:], atol=1e-3, err_msg=str(k))
    with pytest.raises(ValueError):
        AnalysisConfig(stft_conv="nope")


def test_single_pass_multiband(batch):
    cfg2 = AnalysisConfig(
        dtype="float32", amplitude_mode="poly", fused_kernel=True,
        filterbank="reference5",
    )
    cfg1 = AnalysisConfig(
        dtype="float32", amplitude_mode="poly", fused_kernel=True,
        filterbank="reference5", single_pass=True,
    )
    two = np.asarray(jax.jit(lambda b: analyze_batch(b, cfg2))(batch))
    one = np.asarray(jax.jit(lambda b: analyze_batch(b, cfg1))(batch))
    np.testing.assert_allclose(one[:, 1:], two[:, 1:], atol=1e-3)
    assert np.abs(one[:, 0] - two[:, 0]).max() < 1.0


def _collect_dot_generals(jx, out):
    for eq in jx.eqns:
        if eq.primitive.name == "dot_general":
            out.append(eq)
        for v in eq.params.values():
            if hasattr(v, "eqns"):
                _collect_dot_generals(v, out)
            elif hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns"):
                _collect_dot_generals(v.jaxpr, out)


@pytest.mark.parametrize(
    "cfg",
    [
        AnalysisConfig.for_tpu(),
        AnalysisConfig(
            dtype="float32", amplitude_mode="poly", fused_kernel=True,
            single_pass=False,
        ),
        AnalysisConfig(dtype="float32", fused_kernel=False),
    ],
    ids=["single_pass", "two_kernel", "no_kernel"],
)
def test_no_low_precision_f32_contractions(cfg, batch):
    """Every f32xf32 dot_general in the traced analysis program must run
    at Precision.HIGHEST: on TPU the default f32 matmul truncates to bf16
    passes (~2^-11), and the FIR warm-up delta must cancel the conv's
    history tail to f32 accuracy — at default precision a loud->silence
    window boundary keeps ~0.7 spurious energy that log-compression turns
    into a phantom envelope peak (±1-beat flips, found by the real-device
    differential fuzz). bf16-split matmuls are exempt: their operand
    split makes DEFAULT exact by construction."""
    jaxpr = jax.make_jaxpr(lambda b: analyze_batch(b, cfg))(batch)
    eqs = []
    _collect_dot_generals(jaxpr.jaxpr, eqs)
    assert eqs, "expected contractions in the traced program"
    offenders = []
    for eq in eqs:
        dts = {x.aval.dtype for x in eq.invars}
        if dts == {np.dtype("float32")}:
            prec = eq.params.get("precision")
            if prec != (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST):
                offenders.append(
                    ([x.aval.shape for x in eq.invars], prec)
                )
    assert not offenders, f"f32 dots below HIGHEST: {offenders}"


def test_extended_no_low_precision_f32_contractions(batch):
    """Same invariant over the extended-features program (mel/MFCC/chroma
    matmuls must stay at HIGHEST — the dB/log stages downstream amplify
    low-precision spectra)."""
    from bliss_tpu.features.analyze import analyze_batch_ext_jit

    cfg = AnalysisConfig.for_tpu()
    jaxpr = jax.make_jaxpr(lambda b: analyze_batch_ext_jit(b, cfg))(batch)
    eqs = []
    _collect_dot_generals(jaxpr.jaxpr, eqs)
    assert eqs
    for eq in eqs:
        dts = {x.aval.dtype for x in eq.invars}
        if dts == {np.dtype("float32")}:
            assert eq.params.get("precision") == (
                jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST
            ), ([x.aval.shape for x in eq.invars], eq.params.get("precision"))


def test_streaming_no_low_precision_f32_contractions():
    """Same invariant over the streaming pass-2 chunk program (its FIR
    warm-up delta einsum is a separate code path from the batch one)."""
    from bliss_tpu.features.streaming import _pass2_chunk

    cfg = AnalysisConfig(dtype="float32")
    K = cfg.band_taps - 1
    CH = 8192
    seg = jnp.zeros((K + CH + C.TEMPO_HOP,), jnp.int16)
    jaxpr = jax.make_jaxpr(
        lambda s, b, n, m, v: _pass2_chunk(s, b, n, m, v, cfg)
    )(
        seg, jnp.int32(0), jnp.int32(CH),
        jnp.float32(0.0), jnp.float32(1.0),
    )
    eqs = []
    _collect_dot_generals(jaxpr.jaxpr, eqs)
    assert eqs, "expected the warm-up delta contraction in the chunk"
    for eq in eqs:
        dts = {x.aval.dtype for x in eq.invars}
        if dts == {np.dtype("float32")}:
            assert eq.params.get("precision") == (
                jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST
            ), eq
