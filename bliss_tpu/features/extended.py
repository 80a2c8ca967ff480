"""Extended timbral/loudness features (the reference's ROADMAP set).

The reference's ROADMAP.md lists the features it intended to grow into
(zero-crossing rate, spectral centroid/rolloff/flatness, MFCC, loudness) —
the set that ultimately became bliss-rs. They all reduce to the framing /
power-spectrum / matmul machinery this framework already has, so they run
in the same batched jitted program as the core force vector:

- zero-crossing rate: sign-change reduction over the mono signal
- loudness: RMS in dBFS
- spectral centroid / rolloff / flatness: moments of the per-frame power
  spectra (energy-weighted across frames)
- MFCC: mel filterbank and DCT-II as two more MXU matmuls over the same
  spectra; per-song mean and std of the first 13 coefficients

All features are length-masked like the core analyzers (padding-invariant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bliss_tpu import constants as C
from bliss_tpu import tables
from bliss_tpu.config import AnalysisConfig, DEFAULT
from bliss_tpu.dsp.intops import c_div
from bliss_tpu.features.types import PCMBatch

N_MELS = 40
N_MFCC = 13
N_CHROMA = 12

EXTENDED_FEATURE_NAMES = (
    "zero_crossing_rate",
    "loudness_db",
    "spectral_centroid_hz",
    "spectral_rolloff_hz",
    "spectral_flatness",
    "bpm",
    "beat_loudness",
) + tuple(f"mfcc_{i}" for i in range(N_MFCC)) + tuple(
    f"mfcc_std_{i}" for i in range(N_MFCC)
) + tuple(f"chroma_{i:02d}" for i in range(N_CHROMA))


@functools.lru_cache(maxsize=None)
def mel_filterbank(n_mels: int = N_MELS) -> np.ndarray:
    """[n_bins, n_mels] triangular mel filterbank (HTK mel scale)."""
    n_bins = C.WINDOW_SIZE // 2 + 1
    f_max = C.SAMPLE_RATE / 2.0

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(f_max), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    bin_hz = np.arange(n_bins) * C.SAMPLE_RATE / C.WINDOW_SIZE
    fb = np.zeros((n_bins, n_mels))
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (bin_hz - lo) / max(ctr - lo, 1e-9)
        down = (hi - bin_hz) / max(hi - ctr, 1e-9)
        fb[:, m] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


@functools.lru_cache(maxsize=None)
def chroma_matrix() -> np.ndarray:
    """[n_bins, 12] hard pitch-class assignment matrix (A440 tuning,
    column 0 = C). The chromagram/HPCP is one more matmul over the same
    per-frame power spectra the analyzers already compute (reference
    ROADMAP.md "Chromagram / HPCP")."""
    n_bins = C.WINDOW_SIZE // 2 + 1
    f = np.arange(n_bins) * C.SAMPLE_RATE / C.WINDOW_SIZE
    M = np.zeros((n_bins, N_CHROMA))
    for k in range(1, n_bins):
        pc = (int(round(12.0 * np.log2(f[k] / 440.0))) + 9) % 12
        M[k, pc] = 1.0
    return M


@functools.lru_cache(maxsize=None)
def dct_ii_matrix(n_in: int = N_MELS, n_out: int = N_MFCC) -> np.ndarray:
    """[n_in, n_out] orthonormal DCT-II."""
    k = np.arange(n_out)[None, :]
    n = np.arange(n_in)[:, None]
    mat = np.cos(np.pi * k * (2 * n + 1) / (2.0 * n_in))
    mat *= np.sqrt(2.0 / n_in)
    mat[:, 0] *= 1.0 / np.sqrt(2.0)
    return mat


def extended_features(
    batch: PCMBatch, cfg: AnalysisConfig = DEFAULT,
    fa: jnp.ndarray | None = None, beat_aux=None,
) -> jnp.ndarray:
    """[B, len(EXTENDED_FEATURE_NAMES)] float32 feature matrix.

    ``fa``: optional precomputed tempo band energies [B, NB, NBF] (from the
    core analysis) so the FLOP-heavy front-end isn't run twice when core +
    extended features are computed together.

    ``beat_aux``: optional ``(beat, r2, peaks, mid)`` from the core
    envelope finish (envelope_scores_from_energies(return_aux=True)) so
    bpm/beat_loudness derive from the exact same beat detection as the
    core tempo score instead of re-running the envelope chain. The string
    sentinel ``"skip"`` emits zero bpm/beat_loudness columns instead —
    for host-finish (hybrid) callers that overwrite both columns from the
    float64 host aux anyway, so the device program doesn't burn a whole
    second envelope chain whose outputs are discarded."""
    dtype = cfg.jnp_dtype
    W = C.WINDOW_SIZE
    B, L = batch.samples.shape
    n = batch.n_samples
    s = batch.samples.astype(jnp.int32)
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < n[:, None]
    nf = jnp.maximum(n.astype(dtype), 1.0)

    # ---- time-domain features over the interleaved stream ------------------
    sv = jnp.where(valid, s, 0)
    rms = jnp.sqrt(jnp.sum((sv.astype(dtype) / 32768.0) ** 2, axis=1) / nf)
    loudness_db = 20.0 * jnp.log10(jnp.maximum(rms, 1e-10))

    # zero-crossing rate on the mono downmix, per second of audio
    fr_all = s.reshape(B, L // 2, 2)
    mono_all = c_div(fr_all[..., 0] + fr_all[..., 1], 2)
    mvalid = jnp.arange(L // 2, dtype=jnp.int32)[None, :] < (n // 2)[:, None]
    mono_m = jnp.where(mvalid, mono_all, 0)
    sign = jnp.where(mono_m >= 0, 1, -1)
    flips = (sign[:, 1:] != sign[:, :-1]) & mvalid[:, 1:] & mvalid[:, :-1]
    zcr = jnp.sum(flips, axis=1).astype(dtype) / jnp.maximum(
        (n // 2).astype(dtype) - 1.0, 1.0
    )

    # ---- per-frame power spectra (same framing as the frequency analyzer) --
    slots = L // (W * C.CHANNELS)
    fr = s.reshape(B, slots, W, C.CHANNELS)
    mono = c_div(fr[..., 0] + fr[..., 1], 2)
    hann = jnp.asarray(tables.hann_window(), dtype)
    x = mono.astype(dtype) * hann
    n_frames = (n // C.CHANNELS) // W
    fmask = jnp.arange(slots, dtype=jnp.int32)[None, :] < n_frames[:, None]
    x = x * fmask[..., None].astype(dtype)
    dre, dim = tables.rdft_matrices()
    hp = jax.lax.Precision.HIGHEST
    re = jnp.matmul(x, jnp.asarray(dre, dtype), precision=hp)
    im = jnp.matmul(x, jnp.asarray(dim, dtype), precision=hp)
    power = re * re + im * im  # [B, F, bins]

    bin_hz = jnp.asarray(
        np.arange(W // 2 + 1) * C.SAMPLE_RATE / W, dtype
    )
    frame_energy = jnp.sum(power, axis=-1)  # [B, F]
    total_energy = jnp.maximum(jnp.sum(frame_energy, axis=-1), 1e-12)

    # spectral centroid: energy-weighted over all frames
    centroid = jnp.sum(jnp.sum(power * bin_hz, axis=-1), axis=-1) / total_energy

    # spectral rolloff (95% of energy), per frame then energy-weighted
    csum = jnp.cumsum(power, axis=-1)
    fe = jnp.maximum(frame_energy, 1e-12)[..., None]
    reached = csum >= 0.95 * fe
    roll_idx = jnp.argmax(reached, axis=-1)  # first bin reaching 95%
    roll_hz = jnp.take(bin_hz, roll_idx)
    rolloff = jnp.sum(roll_hz * frame_energy, axis=-1) / total_energy

    # spectral flatness: geometric/arithmetic mean per frame, energy-weighted
    eps = jnp.asarray(1e-12, dtype)
    nb = power.shape[-1]
    log_gm = jnp.sum(jnp.log(power + eps), axis=-1) / nb
    am = frame_energy / nb
    flatness_f = jnp.exp(log_gm) / jnp.maximum(am, 1e-12)
    flatness = jnp.sum(flatness_f * frame_energy, axis=-1) / total_energy

    # MFCC: mel matmul -> log -> DCT-II; masked mean + std over frames
    mel = jnp.matmul(
        power, jnp.asarray(mel_filterbank(), dtype), precision=hp
    )  # [B, F, n_mels]
    logmel = jnp.log(mel + eps)
    mfcc = jnp.matmul(
        logmel, jnp.asarray(dct_ii_matrix(), dtype), precision=hp
    )  # [B, F, N_MFCC]
    fm = fmask.astype(dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(fm, axis=1), 1.0)
    mfcc_mean = jnp.sum(mfcc * fm, axis=1) / cnt
    mfcc_var = (
        jnp.sum((mfcc - mfcc_mean[:, None, :]) ** 2 * fm, axis=1) / cnt
    )
    mfcc_std = jnp.sqrt(mfcc_var)

    # beat features: same envelope machinery as the tempo score
    from bliss_tpu.features.tempo import band_energies, beat_metrics

    if isinstance(beat_aux, str) and beat_aux == "skip":
        bpm = jnp.zeros((B,), dtype)
        beat_loud = jnp.zeros((B,), dtype)
    else:
        if fa is None:
            fa = band_energies(batch, cfg)
        bpm, beat_loud = beat_metrics(
            fa, n, batch.durations, cfg, aux=beat_aux
        )

    # chromagram: pitch-class projection of the accumulated power spectrum,
    # normalized to sum 1 per song
    spec = jnp.sum(power, axis=1)  # [B, bins]
    chroma = jnp.matmul(
        spec, jnp.asarray(chroma_matrix(), dtype), precision=hp
    )
    chroma = chroma / jnp.maximum(
        jnp.sum(chroma, axis=1, keepdims=True), 1e-12
    )

    cols = [zcr, loudness_db, centroid, rolloff, flatness, bpm, beat_loud]
    out = jnp.stack(cols, axis=1)
    out = jnp.concatenate([out, mfcc_mean, mfcc_std, chroma], axis=1)
    return out.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def extended_features_jit(batch: PCMBatch, cfg: AnalysisConfig = DEFAULT):
    return extended_features(batch, cfg)
