"""Single-pass Pallas kernel: sample-stats + STFT-power from ONE HBM read.

The two hot kernels (kernels/fused_stats.py, kernels/pallas_stft.py) each
stream the same int16 PCM from HBM (~0.95 ms/pass at B=128). This kernel
reads it once, in the STFT's frame layout [FCHUNK, 1024], and derives the
tempo analyzer's 256-sample hop blocks by LANE SLICING — piece c of a row
is lanes [c*256 - K, c*256 + 256) of the K-extended row — so no
lane/sublane relayout is ever needed:

- amplitude: Chebyshev CDF weights on the full [FCHUNK, 1024] tile;
  per-hop-block sums via four lane-group reductions.
- tempo: the banded FIR runs per piece as the same exact-int bf16-split
  matmul as fused_stats ([240, 272] @ [272, 256] x 4 pieces = identical
  MACs); block history flows lane-contiguously within a row, and row 0
  takes the cross-chunk halo sliver.
- frequency: identical math to pallas_stft (downmix-in-matrix, c_div
  correction, exact int16 split), computed only on band 0 of the band grid
  dimension.

Output layout: the four pieces stack along SUBLANES into one
[4*FCHUNK, k+256] matrix (each piece's lane slice carries its own history)
so the FIR runs as 4 big matmuls; tempo stats come out in stacked-piece
order (c*FCHUNK + r) and the caller transposes the tiny stats arrays back
to hop-block order. The STFT accumulator is the same [8, 512] row-0 tile
as pallas_stft.

Measured (v5e-1, B=128): 4.53 ms/batch vs 4.61 ms for the two-kernel
path — the ~0.95 ms saved HBM pass is mostly consumed by the in-kernel
piece-concat data movement, leaving ~2%, within tunnel noise. Numerics
are identical (tempo bit-equal, others ~2e-6). Kept OFF by default
(AnalysisConfig.single_pass) as an option for HBM-starved parts.
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
from bliss_tpu.kernels.fused_stats import _cheb_T, BLK
from bliss_tpu.kernels.pallas_stft import _downmix_dft_split, FRAME, NBINS

PIECES = FRAME // BLK  # 4 hop blocks per 1024-sample frame row


def _kernel(
    ab_ref,    # SMEM [1, 1, 4] f32: (alpha, beta, halo0_valid, n_frames)
    x_ref,     # VMEM [1, FCHUNK, 1024] int16 frames
    halo_ref,  # VMEM [1, 1, 1, 128] int16: last k raw samples before chunk
    warm_ref,  # VMEM [k, k] f32: band's warm-up correction
    convh_ref,  # VMEM [BLK+k, BLK] bf16: band's banded FIR (high)
    convl_ref,  # VMEM [BLK+k, BLK] bf16: band's banded FIR (residual)
    mh_ref,    # VMEM [1024, 512] bf16 downmix-DFT (high)
    ml_ref,    # VMEM [1024, 512] bf16 downmix-DFT (residual)
    m3_ref,    # VMEM [1024, 512] bf16 downmix-DFT (residual of residual)
    out_ref,   # VMEM [1, 1, 1, 8, 4*FCHUNK] f32 tempo/amp stats
               # (stacked-piece order c*FCHUNK + r along the last axis)
    pow_ref,   # VMEM [1, 8, 512] f32 STFT accumulator (row 0)
    *,
    cheb,
    halfwidth,
    k,
    fchunk,
    stft_precise,
):
    j = pl.program_id(1)
    b = pl.program_id(2)
    xf = x_ref[0].astype(jnp.float32)  # [FCHUNK, 1024]
    alpha = ab_ref[0, 0, 0]
    beta = ab_ref[0, 0, 1]

    # ---- frequency (band 0 only): identical to pallas_stft._kernel ---------
    @pl.when((j == 0) & (b == 0))
    def _():
        pow_ref[0] = jnp.zeros_like(pow_ref[0])

    @pl.when(b == 0)
    def _():
        t = xf + pltpu.roll(xf, shift=FRAME - 1, axis=1)
        th = t * 0.5
        odd = th != jnp.floor(th)
        lane = jax.lax.broadcasted_iota(jnp.int32, (fchunk, FRAME), 1)
        odd_even = odd & (lane % 2 == 0)
        o1 = jnp.float32(1.0)
        eps2 = jnp.where(odd_even, jnp.where(t < 0.0, o1, -o1), o1 * 0)
        a_ = jnp.floor((xf + 128.0) * (1.0 / 256.0))
        b2 = xf - a_ * 256.0 + eps2
        frame_ix = j * fchunk + jax.lax.broadcasted_iota(
            jnp.int32, (fchunk, 1), 0
        )
        mask = (
            frame_ix.astype(jnp.float32) < ab_ref[0, 0, 3]
        ).astype(jnp.float32)
        ab16 = (a_ * mask).astype(jnp.bfloat16)
        bb16 = (b2 * mask).astype(jnp.bfloat16)
        dotf = functools.partial(
            jnp.dot, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        y = (
            256.0 * dotf(ab16, mh_ref[:, :])
            + dotf(bb16, mh_ref[:, :])
            + 256.0 * dotf(ab16, ml_ref[:, :])
        )
        if stft_precise:  # 5-matmul form, ~2^-23 abs (pallas_stft notes)
            y = y + dotf(bb16, ml_ref[:, :]) + 256.0 * dotf(
                ab16, m3_ref[:, :]
            )
        partial = jnp.sum(y * y, axis=0)
        row8 = jax.lax.broadcasted_iota(jnp.int32, (8, 2 * NBINS), 0)
        pow_ref[0] = pow_ref[0] + jnp.where(row8 == 0, partial, 0.0)

    # ---- amplitude weights + nonzero flags on the full tile ----------------
    w = _cheb_T(1000.0 - jnp.abs(xf + 1.0), cheb, halfwidth)
    nzf = jnp.where(xf != 0.0, jnp.float32(1.0), jnp.float32(0.0))

    # ---- tempo: K-extended row, pieces by lane slice -----------------------
    halo_raw = halo_ref[0, 0, :, :k].astype(jnp.float32)  # [1, k]
    raw_hist = (j > 0) | (ab_ref[0, 0, 2] != 0.0)
    v0 = -beta / alpha
    halo_tail = jnp.where(raw_hist, halo_raw, jnp.full_like(halo_raw, v0))
    tails = pltpu.roll(xf[:, FRAME - k :], shift=1, axis=0)  # [FCHUNK, k]
    rowK = jax.lax.broadcasted_iota(jnp.int32, (fchunk, k), 0)
    prev_tail = jnp.where(
        rowK == 0, jnp.broadcast_to(halo_tail, (fchunk, k)), tails
    )
    ext_row = jnp.concatenate([prev_tail, xf], axis=1)  # [FCHUNK, k + 1024]

    csum = jnp.sum(
        convh_ref[:, :1].astype(jnp.float32)
        + convl_ref[:, :1].astype(jnp.float32)
    )
    dotf = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    NBLKC = PIECES * fchunk
    one = jnp.float32(1.0)
    colB = jax.lax.broadcasted_iota(jnp.int32, (NBLKC, BLK), 1)
    altB = jnp.where(colB % 2 == 0, one, -one)
    colK = jax.lax.broadcasted_iota(jnp.int32, (NBLKC, k), 1)
    altK = jnp.where(colK % 2 == 0, one, -one)

    # Each piece's lane slice carries its own K-sample history, so stacking
    # the four pieces along SUBLANES yields one [4*FCHUNK, k+256] matrix —
    # 4 big matmuls instead of 16 small ones. Block order along the stacked
    # axis is (piece, row) = c*FCHUNK + r; the caller transposes back to
    # the chunk's (row, piece) hop-block order on the tiny stats arrays.
    xcat = jnp.concatenate(
        [ext_row[:, c * BLK : c * BLK + k + BLK] for c in range(PIECES)],
        axis=0,
    )  # [4*FCHUNK, k+256] raw
    a_ = jnp.floor((xcat + 128.0) * (1.0 / 256.0))
    b_ = xcat - a_ * 256.0
    a16 = a_.astype(jnp.bfloat16)
    b16 = b_.astype(jnp.bfloat16)
    zr = (
        256.0 * dotf(a16, convh_ref[:, :])
        + dotf(b16, convh_ref[:, :])
        + 256.0 * dotf(a16, convl_ref[:, :])
        + dotf(b16, convl_ref[:, :])
    )
    z = zr * alpha + beta * csum  # [4*FCHUNK, 256]
    s1 = jnp.sum(z, axis=1)
    s2 = jnp.sum(z * z, axis=1)
    sa = jnp.sum(z * altB, axis=1)
    hist = xcat[:, :k] * alpha + beta  # normalized history
    zh = z[:, :k]
    # HIGHEST is load-bearing: Mosaic's default f32 dot truncates to bf16
    # passes (~2^-11 relative), and delta must cancel z's history tail to
    # f32 accuracy — at LOW precision a loud->silence window boundary
    # leaves ~0.7 spurious energy where the reference computes 0, which
    # log-compression turns into a phantom envelope peak (wrong beat
    # count / attack). The 16x16 matmul is far off the critical path.
    delta = jax.lax.dot_general(
        hist, warm_ref[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d1 = jnp.sum(delta, axis=1)
    d2 = jnp.sum(2.0 * zh * delta + delta * delta, axis=1)
    da = jnp.sum(delta * altK, axis=1)
    wcat = jnp.concatenate(
        [w[:, c * BLK : (c + 1) * BLK] for c in range(PIECES)], axis=0
    )
    nzcat = jnp.concatenate(
        [nzf[:, c * BLK : (c + 1) * BLK] for c in range(PIECES)], axis=0
    )
    wsum = jnp.sum(wcat, axis=1)
    rownz = jnp.max(nzcat, axis=1)

    out_ref[0, 0, 0] = jnp.stack([s1, s2, sa, d1, d2, da, wsum, rownz])


def fused_all_call(
    samples,
    alpha,
    beta,
    n_frames,
    halo0=None,
    interpret: bool = False,
    fchunk: int = 240,
    nb_bands: int = 1,
    band_taps: int = 17,
    filterbank: str = "firwin",
    stft_precise: bool = True,
):
    """One-pass kernel invocation.

    Returns (wsum [B, NBF], rownz [B, NBF], energies [B, NB, NW],
    power [B, 257]). The input is padded to a multiple of
    fchunk*1024 samples; NBF counts padded 256-blocks.
    """
    import ml_dtypes

    B, L0 = samples.shape
    NB = nb_bands
    K = band_taps - 1
    if K > 128:
        raise ValueError("band_taps - 1 must fit the 128-lane halo sliver")
    CHUNK = fchunk * FRAME
    if L0 < CHUNK:
        fchunk = max(8, (-(-L0 // FRAME) + 7) // 8 * 8)
        CHUNK = fchunk * FRAME
    pad = (-L0) % CHUNK
    x = jnp.pad(samples, ((0, 0), (0, pad))) if pad else samples
    L = L0 + pad
    NC = L // CHUNK
    NBF = L // BLK

    hv = jnp.full((B,), 0.0 if halo0 is None else 1.0, jnp.float32)
    ab = jnp.stack(
        [
            alpha.astype(jnp.float32),
            beta.astype(jnp.float32),
            hv,
            n_frames.astype(jnp.float32),
        ],
        axis=1,
    )[:, None, :]

    tails = x.reshape(B, NC, CHUNK)[:, :, CHUNK - K :]
    first = (
        halo0.astype(jnp.int16)
        if halo0 is not None
        else jnp.zeros((B, K), jnp.int16)
    )
    halo = jnp.concatenate([first[:, None, :], tails[:, : NC - 1]], axis=1)
    halo = jnp.pad(halo, ((0, 0), (0, 0), (0, 128 - K)))[:, :, None, :]

    A, _, c_pos = tables.amplitude_cdf_poly()
    warm = tables.fir_warmup_correction(NB, band_taps, filterbank).reshape(
        NB * K, K
    )
    conv = tables.conv_band_matrices(NB, band_taps, filterbank)
    convh = conv.astype(ml_dtypes.bfloat16)
    convl = (conv - convh.astype(np.float64)).astype(ml_dtypes.bfloat16)
    mh, ml, m3 = _downmix_dft_split()

    kern = functools.partial(
        _kernel,
        cheb=tuple(float(v) for v in c_pos),
        halfwidth=float(A),
        k=K,
        fchunk=fchunk,
        stft_precise=stft_precise,
    )
    FC = fchunk
    out, power = pl.pallas_call(
        kern,
        grid=(B, NC, NB),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 4), lambda i, j, b: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, FC, FRAME), lambda i, j, b: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, 128), lambda i, j, b: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (K, K), lambda i, j, b: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (BLK + K, BLK), lambda i, j, b: (b, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (BLK + K, BLK), lambda i, j, b: (b, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (FRAME, 2 * NBINS), lambda i, j, b: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (FRAME, 2 * NBINS), lambda i, j, b: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (FRAME, 2 * NBINS), lambda i, j, b: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, 1, 8, PIECES * FC), lambda i, j, b: (i, j, b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, 2 * NBINS), lambda i, j, b: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, NC, NB, 8, PIECES * FC), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, 2 * NBINS), jnp.float32),
        ],
        interpret=interpret,
    )(
        ab,
        x.reshape(B, NC, FC, FRAME).reshape(B, NC * FC, FRAME),
        halo,
        jnp.asarray(warm, jnp.float32),
        jnp.asarray(convh),
        jnp.asarray(convl),
        jnp.asarray(mh, jnp.bfloat16),
        jnp.asarray(ml, jnp.bfloat16),
        jnp.asarray(m3, jnp.bfloat16),
    )

    # Undo the kernel's stacked-piece order (c*FC + r) back to hop-block
    # order (r*4 + c), then -> [B, NB, NBF] per statistic.
    FCv = fchunk

    def rows(r):
        v = out[:, :, :, r, :].reshape(B, NC, NB, PIECES, FCv)
        v = jnp.swapaxes(v, 3, 4).reshape(B, NC, NB, PIECES * FCv)
        return jnp.moveaxis(v, 2, 1).reshape(B, NB, NBF)

    s1, s2, sa, d1, d2, da = (rows(r) for r in range(6))
    wsum = rows(6)[:, 0]
    rownz = rows(7)[:, 0]

    NW = NBF - 1
    sum_y2 = s2[..., :NW] + s2[..., 1:] + d2[..., :NW]
    sum_y = s1[..., :NW] + s1[..., 1:] + d1[..., :NW]
    sum_a = sa[..., :NW] + sa[..., 1:] + da[..., :NW]
    energies = (C.WINDOW_SIZE / 2) * sum_y2 + (
        sum_y * sum_y + sum_a * sum_a
    ) / 2.0
    pw = power[:, 0, :NBINS] + power[:, 0, NBINS:]
    pw = jnp.pad(pw, ((0, 0), (0, 1)))  # Nyquist column = 0
    return wsum, rownz, energies, pw


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "fchunk", "nb_bands", "band_taps", "filterbank",
        "stft_precise",
    ),
)
def fused_all_stats(samples, n_samples, interpret: bool = False,
                    fchunk: int = 240, nb_bands: int = 1,
                    band_taps: int = 17, filterbank: str = "firwin",
                    stft_precise: bool = True):
    """samples: int16 [B, L]; n_samples: int32 [B].

    Returns (amp_integral [B], energies [B, NB, NW], power [B, 257]) from
    ONE pass over the PCM (same contracts as kernels.fused_sample_stats +
    kernels.pallas_stft.stft_power)."""
    from bliss_tpu.dsp.intops import c_div
    from bliss_tpu.kernels.fused_stats import trim_bounds_from_rownz

    B, L = samples.shape
    s32 = samples.astype(jnp.int32)
    idx = jnp.arange(L, dtype=jnp.int32)
    valid = idx[None, :] < n_samples[:, None]
    mean = jnp.sum(jnp.where(valid, s32, 0), axis=1, dtype=jnp.int32)
    mean = c_div(mean, n_samples)
    d = jnp.where(valid, s32 - mean[:, None], 0).astype(jnp.float32)
    var = jnp.trunc(jnp.sum(d * d, axis=1) / n_samples.astype(jnp.float32))
    inv = jnp.float32(1.0 / (1 << 15))
    alpha = inv / (var * inv * inv)
    beta = -(mean.astype(jnp.float32) * inv) / (var * inv * inv)
    n_frames = (n_samples // C.CHANNELS) // C.WINDOW_SIZE

    wsum, rownz, energies, power = fused_all_call(
        samples, alpha, beta, n_frames, interpret=interpret, fchunk=fchunk,
        nb_bands=nb_bands, band_taps=band_taps, filterbank=filterbank,
        stft_precise=stft_precise,
    )
    start, end = trim_bounds_from_rownz(samples, rownz, L)
    trimlen = (end - start + 1).astype(jnp.float32)
    Lpad = jnp.float32(wsum.shape[1] * BLK)
    amp_dot = jnp.sum(wsum, axis=1) - (Lpad - trimlen)
    amp_integral = amp_dot * (100.0 / (end - start).astype(jnp.float32))
    return amp_integral, energies, power
