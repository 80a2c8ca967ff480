"""Pallas STFT-power kernel for the frequency analyzer.

Computes sum over non-overlapping 512-sample windows of |DFT(hann * w)|^2
entirely on the MXU: the Hann window is folded into the DFT matrices
(diag(hann) @ D), each grid step multiplies a [128, 512] tile of mono
frames against the windowed DFT matrices and accumulates the squared
magnitudes into a per-song power row. The stereo downmix (C-truncated
integer average, reference: src/frequency_sort.c:71-73) runs as a cheap XLA
prepass so the kernel sees mono int16 frames.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bliss_tpu import constants as C
from bliss_tpu import tables
from bliss_tpu.dsp.intops import c_div

FCHUNK = 128             # frames per grid step
NBINS = C.WINDOW_SIZE // 2 + 1  # 257
NPAD = 384               # bins padded to a lane multiple


@functools.lru_cache(maxsize=None)
def _windowed_dft() -> tuple[np.ndarray, np.ndarray]:
    # zero_nyquist: the reference's accumulation never writes bin 256
    # (src/frequency_sort.c:86-93), so the peak runs over bins 1..255.
    dre, dim = tables.rdft_matrices(zero_nyquist=True)
    h = tables.hann_window()[:, None]
    re = np.zeros((C.WINDOW_SIZE, NPAD))
    im = np.zeros((C.WINDOW_SIZE, NPAD))
    re[:, :NBINS] = h * dre
    im[:, :NBINS] = h * dim
    return re, im


def _kernel(nf_ref, x_ref, dre_ref, dim_ref, out_ref):
    # nf_ref: SMEM [1, 1, 2] int32 (n_frames, unused)
    # x_ref: VMEM [1, FCHUNK, 512] int16 mono frames
    # dre/dim: VMEM [512, NPAD] float32 hann-folded DFT matrices
    # out_ref: VMEM [1, 8, NPAD] float32 accumulator (row 0 used)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    frame_ix = j * FCHUNK + jax.lax.broadcasted_iota(
        jnp.int32, (FCHUNK, 1), 0
    )
    mask = (frame_ix < nf_ref[0, 0, 0]).astype(jnp.float32)
    x = x_ref[0].astype(jnp.float32) * mask  # [FCHUNK, 512]
    hp = jax.lax.Precision.HIGHEST
    re = jnp.dot(
        x, dre_ref[:, :], preferred_element_type=jnp.float32, precision=hp
    )
    im = jnp.dot(
        x, dim_ref[:, :], preferred_element_type=jnp.float32, precision=hp
    )
    partial = jnp.sum(re * re + im * im, axis=0)  # [NPAD]
    row = jax.lax.broadcasted_iota(jnp.int32, (8, NPAD), 0)
    out_ref[0] = out_ref[0] + jnp.where(row == 0, partial, 0.0)


@jax.jit
def stft_power(samples, n_samples):
    """samples: int16 [B, L] interleaved stereo; returns [B, 257] float32
    power spectra summed over the song's non-overlapping windows."""
    B, L = samples.shape
    fr = samples.reshape(B, L // 2, 2).astype(jnp.int32)
    mono = c_div(fr[..., 0] + fr[..., 1], 2).astype(jnp.int16)  # [B, L//2]

    NF = L // (2 * C.WINDOW_SIZE)
    mono = mono[:, : NF * C.WINDOW_SIZE]
    pad_f = (-NF) % FCHUNK
    if pad_f:
        mono = jnp.pad(mono, ((0, 0), (0, pad_f * C.WINDOW_SIZE)))
    NFP = NF + pad_f
    NC = NFP // FCHUNK

    n_frames = (n_samples // C.CHANNELS) // C.WINDOW_SIZE
    nf = jnp.stack([n_frames, n_frames], axis=1)[:, None, :]

    re, im = _windowed_dft()
    out = pl.pallas_call(
        _kernel,
        grid=(B, NC),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 2), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, FCHUNK, C.WINDOW_SIZE),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (C.WINDOW_SIZE, NPAD), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (C.WINDOW_SIZE, NPAD), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, NPAD), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, NPAD), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(
        nf,
        mono.reshape(B, NFP, C.WINDOW_SIZE),
        jnp.asarray(re, jnp.float32),
        jnp.asarray(im, jnp.float32),
    )
    return out[:, 0, :NBINS]


def frequency_scores_fused(batch, cfg):
    """Frequency scores using the Pallas STFT-power kernel."""
    dtype = cfg.jnp_dtype
    W = C.WINDOW_SIZE
    power = stft_power(batch.samples, batch.n_samples).astype(dtype)
    p = jnp.sqrt(power[:, 1:] / jnp.asarray(float(W), dtype))
    peak = jnp.max(p, axis=1, keepdims=True)
    db = 20.0 * jnp.log10(p / peak) - jnp.asarray(-C.DB_ATTENUATION, dtype)
    lo, ls, hi, hs = (
        C.FREQ_LOW_INF, C.FREQ_LOW_SUP, C.FREQ_HIGH_INF, C.FREQ_HIGH_SUP,
    )
    b0 = (db[:, 1] + db[:, 3]) / 2.0
    b1 = (db[:, 5] + db[:, 7]) / 2.0
    b2 = jnp.sum(db[:, lo - 1 : ls], axis=1) / (ls - lo)
    b3 = jnp.sum(db[:, ls:hi], axis=1) / (hi - (ls + 1))
    b4 = jnp.sum(db[:, hi:hs], axis=1) / (hs - (hi + 1))
    score = b4 + b3 + b2 - b0 - b1
    score = jnp.asarray(C.FREQUENCY_SCALE, dtype) * score + jnp.asarray(
        C.FREQUENCY_BIAS, dtype
    )
    return score.astype(jnp.float32)
