"""Pallas STFT-power kernel for the frequency analyzer.

Computes sum over non-overlapping 512-sample windows of |DFT(hann * w)|^2
entirely on the MXU, reading the RAW INTERLEAVED stereo PCM — no separate
downmix pass (a [B, L/2] de-interleave costs a TPU relayout, measured
~1.7 ms at B=128, more than the matmul itself).

Two algebraic moves make that possible:

1. Downmix-in-the-matrix: with M[2k, :] = M[2k+1, :] = D[k, :]/2 (rows
   duplicated per stereo pair), frame_interleaved @ M = ((l + r)/2) @ D
   exactly. The C-truncated integer average (reference:
   src/frequency_sort.c:71-73) differs from (l+r)/2 by
   eps_k in {0, +-1/2}; adding 2*eps at the even lanes of the interleaved
   frame makes the identity exact: (frame + 2*eps_even) @ M = mono_cdiv @ D.
   eps is lane-local VPU work (one roll + parity/sign selects).

2. Exact int16 -> bf16 splitting: x = 256*a + b2 with a in [-128, 127],
   b2 = b + 2*eps in [-129, 128] — all exactly representable in bf16. Three
   DEFAULT-precision (single-pass bf16) matmuls
   256*(a@Mh) + b2@Mh + 256*(a@Ml), with M = Mh + Ml split into bf16 high
   and residual parts, reach ~1e-5 relative accuracy at the MXU's native
   bf16 rate — the same cycle count as a HIGHEST (6-pass) matmul on the
   half-width mono frames, but with no downmix pass at all.

The DFT matrix packs re|im for bins 0..255 into 512 columns (the hann
window is folded in; re^2 and im^2 fold outside). The Nyquist bin is
dropped entirely: the reference never accumulates power_spectrum[256]
(av_rdft packing, reference src/frequency_sort.c:86-93).
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

MAX_FCHUNK = 512         # frames per grid step (single chunk if NF fits)
NBINS = C.WINDOW_SIZE // 2  # 256 computed bins (0..255; Nyquist dropped)
FRAME = 2 * C.WINDOW_SIZE   # 1024 interleaved samples per window


@functools.lru_cache(maxsize=None)
def _downmix_dft_split() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """[1024, 512] duplicated-row hann-folded (re|im) DFT matrix, split into
    three cascading bf16 parts (high, residual, residual-of-residual).

    The third part powers the "precise" spectrum mode: the 3-matmul fast
    form's ~2^-16-relative ABSOLUTE spectra error is fine for loud bins
    but, through the analyzer's peak-relative dB, inflates to ~0.1 score
    error on pathological near-silent-band content (round-3 fuzz, 6/200
    cases); two more matmuls (b2@Ml + 256*a@M3) push the floor to ~2^-23 —
    the reference's own float32 FFT noise level."""
    dre, dim = tables.rdft_matrices()
    h = tables.hann_window()[:, None]
    cat = np.concatenate([h * dre[:, :NBINS], h * dim[:, :NBINS]], axis=1)
    m = np.repeat(cat / 2.0, 2, axis=0)  # [1024, 512]
    import ml_dtypes

    mh = m.astype(ml_dtypes.bfloat16)
    ml = (m - mh.astype(np.float64)).astype(ml_dtypes.bfloat16)
    m3 = (m - mh.astype(np.float64) - ml.astype(np.float64)).astype(
        ml_dtypes.bfloat16
    )
    return mh, ml, m3


def _kernel(nf_ref, x_ref, mh_ref, ml_ref, m3_ref, out_ref, *, fchunk, precise):
    # nf_ref: SMEM [1, 1, 2] int32 (n_frames, global frame offset)
    # x_ref: VMEM [1, FCHUNK, 1024] int16 interleaved stereo frames
    # mh/ml/m3: VMEM [1024, 512] bf16 downmix-DFT matrix split parts
    # out_ref: VMEM [1, 8, 512] float32 accumulator (row 0 used)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    # All integer arithmetic runs in f32 (exact well below 2^24) — int16 ->
    # int32 conversion would pay an unpack relayout on the VPU.
    xf = x_ref[0].astype(jnp.float32)  # [FCHUNK, 1024]
    # c_div truncation correction: t = l + r at even lanes; mono_cdiv
    # differs from t/2 by -sign(t)/2 when t is odd.
    t = xf + pltpu.roll(xf, shift=FRAME - 1, axis=1)  # circular shift by -1
    th = t * 0.5
    odd = th != jnp.floor(th)
    lane = jax.lax.broadcasted_iota(jnp.int32, (fchunk, FRAME), 1)
    odd_even = odd & (lane % 2 == 0)
    eps2 = jnp.where(odd_even, jnp.where(t < 0.0, 1.0, -1.0), 0.0)

    # exact split x = 256*a + b; fold 2*eps into b (stays within bf16 ints)
    a = jnp.floor((xf + 128.0) * (1.0 / 256.0))
    b2 = xf - a * 256.0 + eps2

    frame_ix = nf_ref[0, 0, 1] + j * fchunk + jax.lax.broadcasted_iota(
        jnp.int32, (fchunk, 1), 0
    )
    mask = (frame_ix < nf_ref[0, 0, 0]).astype(jnp.float32)
    ab16 = (a * mask).astype(jnp.bfloat16)
    bb16 = (b2 * mask).astype(jnp.bfloat16)

    dot = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    y = 256.0 * dot(ab16, mh_ref[:, :]) + dot(bb16, mh_ref[:, :]) + 256.0 * dot(
        ab16, ml_ref[:, :]
    )  # [FCHUNK, 512] f32: re in lanes 0..255, im in lanes 256..511
    if precise:  # 5-matmul form: ~2^-23 absolute (see _downmix_dft_split)
        y = y + dot(bb16, ml_ref[:, :]) + 256.0 * dot(ab16, m3_ref[:, :])

    partial = jnp.sum(y * y, axis=0)  # [512]
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 2 * NBINS), 0)
    out_ref[0] = out_ref[0] + jnp.where(row == 0, partial, 0.0)


@functools.partial(jax.jit, static_argnames=("precise",))
def stft_power(samples, n_samples, frame_offset=None, precise=True):
    """samples: int16 [B, L] interleaved stereo; returns [B, 257] float32
    power spectra summed over the song's non-overlapping windows (the
    Nyquist column is zero — the reference never accumulates it).

    ``frame_offset``: global index of this buffer's first window — lets a
    sequence-sharded caller mask its LOCAL windows against the song's
    GLOBAL frame count (parallel/mesh.py psums the partial spectra)."""
    B, L = samples.shape
    NF = L // FRAME
    x = samples[:, : NF * FRAME]
    if NF <= MAX_FCHUNK:
        FCHUNK = ((NF + 7) // 8) * 8  # single chunk, sublane-aligned
    else:
        FCHUNK = MAX_FCHUNK
    pad_f = (-NF) % FCHUNK
    if pad_f:
        x = jnp.pad(x, ((0, 0), (0, pad_f * FRAME)))
    NFP = NF + pad_f
    NC = NFP // FCHUNK

    n_frames = (n_samples // C.CHANNELS) // C.WINDOW_SIZE
    off = (
        jnp.zeros_like(n_frames)
        if frame_offset is None
        else jnp.broadcast_to(
            jnp.asarray(frame_offset, n_frames.dtype), n_frames.shape
        )
    )
    nf = jnp.stack([n_frames, off], axis=1)[:, None, :]

    mh, ml, m3 = _downmix_dft_split()
    kern = functools.partial(_kernel, fchunk=FCHUNK, precise=precise)
    mat_spec = pl.BlockSpec(
        (FRAME, 2 * NBINS), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kern,
        grid=(B, NC),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 2), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, FCHUNK, FRAME),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            mat_spec,
            mat_spec,
            mat_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, 8, 2 * NBINS), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, 2 * NBINS), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(
        nf,
        x.reshape(B, NFP, FRAME),
        jnp.asarray(mh, jnp.bfloat16),
        jnp.asarray(ml, jnp.bfloat16),
        jnp.asarray(m3, jnp.bfloat16),
    )
    power = out[:, 0, :NBINS] + out[:, 0, NBINS:]  # re^2 + im^2, bins 0..255
    return jnp.pad(power, ((0, 0), (0, 1)))  # Nyquist column = 0


def frequency_scores_fused(batch, cfg):
    """Frequency scores using the Pallas STFT-power kernel."""
    power = stft_power(
        batch.samples, batch.n_samples, precise=cfg.stft_conv == "precise"
    )
    return frequency_scores_from_power(power, cfg)


def frequency_scores_from_power(power, cfg):
    """Reference band-dB scoring from accumulated power spectra [B, 257]
    (reference: src/frequency_sort.c:97-139)."""
    dtype = cfg.jnp_dtype
    W = C.WINDOW_SIZE
    power = power.astype(dtype)
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
