"""Frequency-balance analyzer.

Behavioral model (reference: src/frequency_sort.c:20-140): non-overlapping
512-sample windows per channel, stereo downmixed by C-truncated integer
average, Hann-windowed, 512-point real DFT, power accumulated across all
windows, converted to peak-relative dB with -3 dB attenuation, then averaged
over 5 fixed bands; score = (high+mid_high+mid - low - mid_low)/3 + 68/3.

TPU-first: all windows of all songs form one [B, F, 512] tensor; the DFT is
a dense matmul on the MXU (spectrum_mode="matmul") so the whole analyzer is
two matmuls + reductions. Absolute DFT scaling cancels in the peak-relative
normalization, which is why matching ffmpeg's RDFT scaling is unnecessary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bliss_tpu import constants as C
from bliss_tpu import tables
from bliss_tpu.config import AnalysisConfig
from bliss_tpu.dsp.intops import c_div
from bliss_tpu.features.types import PCMBatch


def frequency_scores(batch: PCMBatch, cfg: AnalysisConfig) -> jnp.ndarray:
    """[B] frequency scores (float32)."""
    dtype = cfg.jnp_dtype
    W = C.WINDOW_SIZE
    B, L = batch.samples.shape
    slots = L // (W * C.CHANNELS)

    fr = batch.samples.reshape(B, slots, W, C.CHANNELS).astype(jnp.int32)
    mono = c_div(fr[..., 0] + fr[..., 1], 2)

    hann = jnp.asarray(tables.hann_window(), dtype)
    x = mono.astype(dtype) * hann

    # Mask out frame slots past each song's frame count; zeroed frames add
    # zero power, matching the reference's n_frames loop bound.
    n_frames = (batch.n_samples // C.CHANNELS) // W
    fmask = jnp.arange(slots, dtype=jnp.int32)[None, :] < n_frames[:, None]
    x = x * fmask[..., None].astype(dtype)

    power = _power_spectrum(x, cfg)  # [B, W//2 + 1]

    # Peak-relative dB over bins 1..256 (bin 0 is excluded throughout,
    # mirroring the reference's d>=1 loops).
    p = jnp.sqrt(power[:, 1:] / jnp.asarray(float(W), dtype))  # [B, 256]
    peak = jnp.max(p, axis=1, keepdims=True)
    db = 20.0 * jnp.log10(p / peak) - jnp.asarray(-C.DB_ATTENUATION, dtype)

    d = lambda k: db[:, k - 1]  # bin index -> column (offset by the dropped bin 0)
    b0 = (d(2) + d(4)) / 2.0
    b1 = (d(6) + d(8)) / 2.0
    lo, ls, hi, hs = C.FREQ_LOW_INF, C.FREQ_LOW_SUP, C.FREQ_HIGH_INF, C.FREQ_HIGH_SUP
    b2 = jnp.sum(db[:, lo - 1 : ls], axis=1) / (ls - lo)
    b3 = jnp.sum(db[:, ls : hi], axis=1) / (hi - (ls + 1))
    b4 = jnp.sum(db[:, hi : hs], axis=1) / (hs - (hi + 1))

    score = b4 + b3 + b2 - b0 - b1
    score = jnp.asarray(C.FREQUENCY_SCALE, dtype) * score + jnp.asarray(
        C.FREQUENCY_BIAS, dtype
    )
    return score.astype(jnp.float32)


def _power_spectrum(x: jnp.ndarray, cfg: AnalysisConfig) -> jnp.ndarray:
    """Sum over windows of |DFT(window)|^2: [B, F, W] -> [B, W//2+1]."""
    dtype = cfg.jnp_dtype
    if cfg.spectrum_mode == "fft":
        X = jnp.fft.rfft(x, axis=-1)
        re = jnp.real(X)
        im = jnp.imag(X)
        # The reference never accumulates the Nyquist bin (av_rdft packing;
        # src/frequency_sort.c:86-93) — its peak is over bins 1..255 only.
        re = re.at[..., -1].set(0.0)
        im = im.at[..., -1].set(0.0)
    elif cfg.spectrum_mode == "matmul":
        dre, dim = tables.rdft_matrices(zero_nyquist=True)
        hp = jax.lax.Precision.HIGHEST
        re = jnp.matmul(x, jnp.asarray(dre, dtype), precision=hp)
        im = jnp.matmul(x, jnp.asarray(dim, dtype), precision=hp)
    else:
        raise ValueError(f"unknown spectrum_mode {cfg.spectrum_mode}")
    if cfg.strict_accumulation:
        # Replicate the reference's float32 per-frame accumulation
        # (`power_spectrum[d] += re*re + im*im` in float,
        # reference src/frequency_sort.c:86-93): float32 products and a
        # float32 running sum over frames, rounding after every add.
        re32 = re.astype(jnp.float32)
        im32 = im.astype(jnp.float32)
        raw = re32 * re32 + im32 * im32  # [B, F, bins] float32

        def add(acc, frame):
            return acc + frame, None

        acc0 = jnp.zeros((raw.shape[0], raw.shape[2]), jnp.float32)
        total, _ = jax.lax.scan(add, acc0, jnp.moveaxis(raw, 1, 0))
        return total.astype(dtype)
    return jnp.sum((re * re + im * im).astype(dtype), axis=1)
