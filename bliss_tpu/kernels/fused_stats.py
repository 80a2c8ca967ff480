"""Fused Pallas kernel: one pass over the raw int16 PCM computes

- the amplitude analyzer's weighted sample reduction (Chebyshev CDF
  evaluation, gather-free),
- the tempo analyzer's per-256-block convolution partial sums
  (S1, S2, S_alt) plus the per-window FIR warm-up corrections
  (D1, D2, D_alt), and
- per-block nonzero flags, from which the caller reconstructs the
  amplitude zero-trim bounds without any full-signal argmax pass,

so the two heaviest sample-rate stages read HBM exactly once, convert
int16->float32 once in VMEM, and write only tiny per-block reductions.
The frequency analyzer stays on the MXU (DFT matmul) outside this kernel.

Multi-band: the filterbank runs as an extra INNERMOST grid dimension, so
the PCM block stays resident in VMEM across bands (Pallas skips refetching
blocks whose index map doesn't change) and only the tiny per-band conv /
warm-up matrices page in — VMEM use is constant in the band count, which
is what lets the same kernel serve the 1-band parity mode, the reference's
5x17 full-spectrum filterbank, and its 36x33 fine filterbank.

Layout: the PCM is viewed as [B, NC*NBLK, 256] so each grid step reads a
[NBLK, 256] matrix of hop-sized blocks directly (aligned (sublane, lane)
tiles, no in-kernel relayout). Each block row is extended by a (taps-1)-
column history from the previous row (pltpu.roll); the cross-chunk history
arrives as a separate halo input. The FIR convolution itself runs as one
banded matmul on the MXU (tables.conv_band_matrix).

Amplitude trim (reference src/amplitude_sort.c:26-32 trims leading/trailing
zeros) is exact without masking inside the kernel: zero samples have weight
w(0) = T(999) = 1 exactly, so the caller subtracts one per out-of-trim
sample from the unmasked total.
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

DEFAULT_CHUNK = 245760   # samples per grid step along L
BLK = C.TEMPO_HOP        # 256

# Output row assignment in each band's fused [8, NBLK] result tile
# (wsum/rownz are band-independent; the caller reads band 0's copies).
ROWS = ("s1", "s2", "sa", "d1", "d2", "da", "wsum", "rownz")


def _cheb_T(m, coeffs, halfwidth):
    """Chebyshev evaluation of the smoothing-kernel CDF (positive half +
    symmetry fold), mirroring features/amplitude._integral_poly."""
    neg = m < 0
    mf = jnp.where(neg, -m - 1.0, m)
    t = jnp.clip((2.0 * mf - halfwidth) / halfwidth, -1.0, 1.0)
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    for ck in coeffs[:0:-1]:
        b1, b2 = ck + 2.0 * t * b1 - b2, b1
    val = coeffs[0] + t * b1 - b2
    val = jnp.where(mf >= halfwidth, 1.0, val)
    return jnp.where(neg, 1.0 - val, val)


def _kernel(
    ab_ref,    # SMEM [1, 1, 4] float32: (alpha, beta, halo0_valid, unused)
    x_ref,     # VMEM [1, NBLK, 256] int16: this chunk as hop-sized rows
    halo_ref,  # VMEM [1, 1, 1, 128] int16: last k samples before this chunk
               # in lanes 0..k-1 (sliver, not a full-array shifted copy)
    warm_ref,  # VMEM [k, k] float32: THIS band's FIR warm-up correction
    convh_ref,  # VMEM [BLK+k, BLK]: THIS band's banded FIR matrix — f32 in
    convl_ref,  # "exact" mode (convl unused); bf16 high/residual in "split"
    out_ref,   # VMEM out [1, 1, 1, 8, NBLK] float32: rows per ROWS
    *,
    cheb,      # tuple of float coeffs (compile-time)
    halfwidth,
    conv_precision,
    conv_mode,  # "split" (bf16x4 exact-int, MXU native rate) | "exact" (f32)
    k,         # taps - 1 (warm-up depth)
):
    j = pl.program_id(1)
    xb = x_ref[0].astype(jnp.float32)  # [NBLK, BLK]

    # ---- amplitude: w(s) = T(1000 - |s+1|), UNMASKED per-block sums --------
    # (trim correction happens in the caller; zeros weigh exactly 1;
    # recomputed per band — pure VPU, caller reads band 0's rows)
    w = _cheb_T(1000.0 - jnp.abs(xb + 1.0), cheb, halfwidth)
    wsum = jnp.sum(w, axis=1)  # [NBLK]

    # ---- per-block any-nonzero flags (trim bound reconstruction) -----------
    one = jnp.float32(1.0)
    rownz = jnp.max(jnp.where(xb != 0.0, one, one * 0), axis=1)  # [NBLK]

    # ---- tempo: halo-extend each hop-block row (RAW sample domain) ---------
    alpha = ab_ref[0, 0, 0]
    beta = ab_ref[0, 0, 1]
    halo_raw = halo_ref[0, 0, :, :k].astype(jnp.float32)  # [1, k]
    # Chunk 0's history must be zero in NORMALIZED space (matching the
    # reference's zero-padded conv start) unless the caller injected a real
    # raw history (sharded mode sets halo0_valid); mid-stream chunks always
    # use their raw sliver. In the raw domain "normalized zero" is the raw
    # value -beta/alpha (non-integer; its split error is negligible and
    # confined to the first window's warm-up lanes).
    raw_hist = (j > 0) | (ab_ref[0, 0, 2] != 0.0)
    v0 = -beta / alpha
    halo_tail = jnp.where(raw_hist, halo_raw, jnp.full_like(halo_raw, v0))
    # Row-shift the per-block tails down by one (block b's history is block
    # b-1's last k samples); row 0 takes the cross-chunk halo.
    NBLK = xb.shape[0]
    tails = pltpu.roll(xb[:, BLK - k :], shift=1, axis=0)  # [NBLK, k]
    rowK = jax.lax.broadcasted_iota(jnp.int32, (NBLK, k), 0)
    prev_tail = jnp.where(
        rowK == 0, jnp.broadcast_to(halo_tail, (NBLK, k)), tails
    )
    ext_raw = jnp.concatenate([prev_tail, xb], axis=1)  # [NBLK, k + BLK]
    ext = ext_raw * alpha + beta  # normalized (used by the warm-up path)

    # The causal FIR as a banded matmul on the MXU (measured ~2x faster than
    # taps unaligned vector shifts on the VPU). Linearity lets it run on the
    # RAW integer samples (z = alpha*(ext_raw @ T) + beta*sum(taps)), which
    # admit an EXACT bf16 split ext_raw = 256*a + b (a, b integer in
    # [-128, 127]): four single-pass bf16 matmuls reach ~1e-5 relative — vs
    # six passes for a HIGHEST f32 matmul — and the kernel-wide win is ~20%
    # (the conv was half its runtime). "exact" keeps the f32 matmul for
    # strict accumulation studies.
    if conv_mode == "split":
        a = jnp.floor((ext_raw + 128.0) * (1.0 / 256.0))
        b = ext_raw - a * 256.0
        a16 = a.astype(jnp.bfloat16)
        b16 = b.astype(jnp.bfloat16)
        dot = functools.partial(
            jnp.dot,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        zr = (
            256.0 * dot(a16, convh_ref[:, :])
            + dot(b16, convh_ref[:, :])
            + 256.0 * dot(a16, convl_ref[:, :])
            + dot(b16, convl_ref[:, :])
        )
        csum = jnp.sum(
            convh_ref[:, :1].astype(jnp.float32)
            + convl_ref[:, :1].astype(jnp.float32)
        )
        z = zr * alpha + beta * csum
    else:
        z = jnp.dot(
            ext, convh_ref[:, :],
            preferred_element_type=jnp.float32,
            precision=conv_precision,
        )

    col = jax.lax.broadcasted_iota(jnp.int32, (NBLK, BLK), 1)
    alt = jnp.where(col % 2 == 0, 1.0, -1.0)  # (-1)^t within a block
    s1 = jnp.sum(z, axis=1)
    s2 = jnp.sum(z * z, axis=1)
    sa = jnp.sum(z * alt, axis=1)

    # ---- FIR warm-up corrections per block ---------------------------------
    hist = ext[:, :k]  # the k normalized samples before each block
    zh = z[:, :k]
    delta = jax.lax.dot_general(
        hist, warm_ref[:, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST is load-bearing (see kernels/fused_all.py): delta must
        # cancel z's history tail to f32 accuracy; Mosaic's default bf16
        # passes leave spurious energy in silence-boundary windows.
        precision=jax.lax.Precision.HIGHEST,
    )  # [NBLK, k]
    altK = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (NBLK, k), 1) % 2 == 0, 1.0, -1.0
    )
    d1 = jnp.sum(delta, axis=1)
    d2 = jnp.sum(2.0 * zh * delta + delta * delta, axis=1)
    da = jnp.sum(delta * altK, axis=1)

    out_ref[0, 0, 0] = jnp.stack([s1, s2, sa, d1, d2, da, wsum, rownz])


def fused_stats_call(
    samples,
    alpha,
    beta,
    halo0=None,
    interpret: bool = False,
    chunk: int = DEFAULT_CHUNK,
    conv_precision=jax.lax.Precision.HIGHEST,
    conv_mode: str = "split",
    nb_bands: int = 1,
    band_taps: int = 17,
    filterbank: str = "firwin",
):
    """Low-level kernel invocation with caller-provided normalization
    scalars.

    Returns (wsum [B, NBF] — UNMASKED per-block weight sums (padding blocks
    count 1 per sample), rownz [B, NBF] — per-block any-nonzero flags,
    energies [B, NB, NW]). NBF = padded block count (the padded length is
    NBF * 256). ``halo0``: optional [B, taps-1] int16 conv history for the
    very first block (sequence-sharded callers pass the previous shard's
    tail; standalone use keeps the zero history).
    """
    B, L0 = samples.shape
    NB = nb_bands
    K = band_taps - 1
    if K > 128:
        raise ValueError("band_taps - 1 must fit the 128-lane halo sliver")
    CHUNK = min(chunk, ((L0 + BLK - 1) // BLK) * BLK)
    NBLK = CHUNK // BLK
    if CHUNK < 16 * 128 or (L0 > CHUNK and NBLK % 8):
        # NBLK must tile into sublanes when multiple chunks share the block
        # shape; a single full-array chunk is exempt (equal-dims rule).
        raise ValueError(
            f"input too short for the fused kernel tiles (L={L0}); use the "
            "XLA path for clips under ~2k samples"
        )
    pad = (-L0) % CHUNK
    x = jnp.pad(samples, ((0, 0), (0, pad))) if pad else samples
    L = L0 + pad
    NC = L // CHUNK
    NBF = L // BLK

    hv = jnp.full(
        (B,), 0.0 if halo0 is None else 1.0, jnp.float32
    )
    ab = jnp.stack(
        [alpha.astype(jnp.float32), beta.astype(jnp.float32), hv, hv * 0],
        axis=1,
    )[:, None, :]

    # The K raw samples preceding each chunk, as tiny [B, NC, 1, 128]
    # slivers (lanes 0..K-1 carry data): chunk j takes chunk j-1's tail;
    # chunk 0 is zero-filled unless a cross-shard history is injected.
    tails = x.reshape(B, NC, CHUNK)[:, :, CHUNK - K :]  # [B, NC, K]
    first = (
        halo0.astype(jnp.int16)
        if halo0 is not None
        else jnp.zeros((B, K), jnp.int16)
    )
    halo = jnp.concatenate([first[:, None, :], tails[:, : NC - 1]], axis=1)
    halo = jnp.pad(halo, ((0, 0), (0, 0), (0, 128 - K)))[:, :, None, :]

    A, _, c_pos = tables.amplitude_cdf_poly()
    # [NB*K, K] warm-up and [NB*(BLK+K), BLK] conv matrices; the band grid
    # dimension (innermost) pages each band's slice via its BlockSpec.
    warm = tables.fir_warmup_correction(NB, band_taps, filterbank).reshape(
        NB * K, K
    )
    conv = tables.conv_band_matrices(NB, band_taps, filterbank)
    if conv_mode == "split":
        import ml_dtypes

        convh_np = conv.astype(ml_dtypes.bfloat16)
        convl_np = (conv - convh_np.astype(np.float64)).astype(
            ml_dtypes.bfloat16
        )
        convh = jnp.asarray(convh_np)
        convl = jnp.asarray(convl_np)
    elif conv_mode == "exact":
        convh = jnp.asarray(conv, jnp.float32)
        convl = jnp.zeros_like(convh)  # unused by the exact branch
    else:
        raise ValueError(f"unknown conv_mode {conv_mode!r}")

    kern = functools.partial(
        _kernel,
        cheb=tuple(float(v) for v in c_pos),
        halfwidth=float(A),
        conv_precision=conv_precision,
        conv_mode=conv_mode,
        k=K,
    )
    out = pl.pallas_call(
        kern,
        grid=(B, NC, NB),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 4), lambda i, j, b: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, NBLK, BLK), lambda i, j, b: (i, j, 0),
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
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, 8, NBLK), lambda i, j, b: (i, j, b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, NC, NB, 8, NBLK), jnp.float32),
        interpret=interpret,
    )(
        ab,
        x.reshape(B, NC * NBLK, BLK),
        halo,
        jnp.asarray(warm, jnp.float32),
        convh,
        convl,
    )

    # [B, NC, NB, NBLK] -> [B, NB, NBF] per statistic
    def rows(r):
        return jnp.moveaxis(out[:, :, :, r, :], 2, 1).reshape(B, NB, NBF)

    s1, s2, sa, d1, d2, da = (rows(r) for r in range(6))
    wsum = out[:, :, 0, 6, :].reshape(B, NBF)
    rownz = out[:, :, 0, 7, :].reshape(B, NBF)

    NW = NBF - 1
    sum_y2 = s2[..., :NW] + s2[..., 1:] + d2[..., :NW]
    sum_y = s1[..., :NW] + s1[..., 1:] + d1[..., :NW]
    sum_a = sa[..., :NW] + sa[..., 1:] + da[..., :NW]
    energies = (C.WINDOW_SIZE / 2) * sum_y2 + (
        sum_y * sum_y + sum_a * sum_a
    ) / 2.0
    return wsum, rownz, energies


def trim_bounds_from_rownz(samples, rownz, L0: int):
    """Reconstruct the amplitude zero-trim bounds (first/last nonzero sample
    index) from per-block nonzero flags + two tiny per-song block gathers.

    Replaces a full [B, L] forward+reverse argmax pass (measured ~1.5 ms at
    B=128) with O(B * 256) work after the kernel.
    """
    B = samples.shape[0]
    NBF_data = (L0 + BLK - 1) // BLK
    nz = rownz[:, :NBF_data] > 0.0
    any_nz = jnp.any(nz, axis=1)
    bf = jnp.argmax(nz, axis=1).astype(jnp.int32)
    bl = (NBF_data - 1 - jnp.argmax(nz[:, ::-1], axis=1)).astype(jnp.int32)

    pad = NBF_data * BLK - L0
    xp = jnp.pad(samples, ((0, 0), (0, pad))) if pad else samples
    xblk = xp.reshape(B, NBF_data, BLK)
    first_blk = jnp.take_along_axis(xblk, bf[:, None, None], axis=1)[:, 0]
    last_blk = jnp.take_along_axis(xblk, bl[:, None, None], axis=1)[:, 0]
    inner_f = jnp.argmax(first_blk != 0, axis=1).astype(jnp.int32)
    inner_l = (
        BLK - 1 - jnp.argmax(last_blk[:, ::-1] != 0, axis=1)
    ).astype(jnp.int32)
    start = jnp.where(any_nz, bf * BLK + inner_f, 0)
    end = jnp.where(any_nz, bl * BLK + inner_l, L0 - 1)
    return start, end


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "chunk", "nb_bands", "band_taps", "filterbank",
        "conv_mode",
    ),
)
def fused_sample_stats(samples, n_samples, interpret: bool = False,
                       chunk: int = DEFAULT_CHUNK, nb_bands: int = 1,
                       band_taps: int = 17, filterbank: str = "firwin",
                       conv_mode: str = "split"):
    """samples: int16 [B, L]; n_samples: int32 [B].

    Returns (amp_integral [B], energies [B, NB, NW]) where amp_integral is
    the smoothed-histogram windowed integral (before the affine score) and
    energies are the per-band per-window Parseval spectral sums (before
    window-count masking), NW = L//hop - 1. L is padded to a CHUNK multiple
    internally.
    """
    x = samples
    B, L = x.shape
    # prepass: integer mean / variance (plain XLA, one fused pass each)
    s32 = x.astype(jnp.int32)
    idx = jnp.arange(L, dtype=jnp.int32)
    valid = idx[None, :] < n_samples[:, None]
    mean = jnp.sum(jnp.where(valid, s32, 0), axis=1, dtype=jnp.int32)
    from bliss_tpu.dsp.intops import c_div

    mean = c_div(mean, n_samples)
    d = jnp.where(valid, s32 - mean[:, None], 0).astype(jnp.float32)
    var = jnp.trunc(jnp.sum(d * d, axis=1) / n_samples.astype(jnp.float32))
    inv = jnp.float32(1.0 / (1 << 15))
    # xn = alpha * s + beta; the normalized signal should be zero outside
    # [0, n) — alpha*0+beta is not zero, but every window touching the
    # invalid tail is masked by the caller, so those energies never surface.
    alpha = inv / (var * inv * inv)
    beta = -(mean.astype(jnp.float32) * inv) / (var * inv * inv)

    wsum, rownz, energies = fused_stats_call(
        samples, alpha, beta, interpret=interpret, chunk=chunk,
        nb_bands=nb_bands, band_taps=band_taps, filterbank=filterbank,
        conv_mode=conv_mode,
    )
    start, end = trim_bounds_from_rownz(samples, rownz, L)
    trimlen = (end - start + 1).astype(jnp.float32)
    # Unmasked total minus w(0)=1 per sample outside [start, end] (incl. the
    # kernel's own zero padding, NBF*256 total samples).
    Lpad = jnp.float32(wsum.shape[1] * BLK)
    amp_dot = jnp.sum(wsum, axis=1) - (Lpad - trimlen)
    amp_integral = amp_dot * (100.0 / (end - start).astype(jnp.float32))
    return amp_integral, energies
