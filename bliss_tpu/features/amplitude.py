"""Amplitude (loudness) analyzer.

Behavioral model (reference: src/amplitude_sort.c:12-80): trim leading and
trailing zero samples, histogram the s16 sample values into 65 536 bins,
smooth with a 7-tap FIR for 301 passes, normalize by the trimmed length, and
integrate the bins within +-1000 of INT16_MAX; score = -0.2*integral + 6.

TPU realizations:

- "table" (default): the 301-pass smoothing is a fixed linear operator, and
  the windowed integral is a linear functional of the histogram — so the
  entire analysis collapses to ONE masked table-lookup reduction over the
  samples (tables.amplitude_weight_table). No histogram, no smoothing loop.
- "iterative": replays the reference's float32 smoothing passes for
  bit-closest parity, on a 4096-bin crop around the integral window (the
  kernel's +-903-bin influence radius cannot carry information from outside
  the crop into the window, so the crop is exact — see tables.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bliss_tpu import constants as C
from bliss_tpu import tables
from bliss_tpu.config import AnalysisConfig
from bliss_tpu.features.types import PCMBatch

# Crop bounds for iterative mode: integral window grown by the 903-bin
# influence radius, rounded out to a friendly power-of-two width.
_CROP_LO = 30720
_CROP_W = 4096


def _trim_bounds(s: jnp.ndarray):
    """First and last nonzero sample index per song ([B], [B])."""
    nonzero = s != 0
    start = jnp.argmax(nonzero, axis=1)
    end = s.shape[1] - 1 - jnp.argmax(nonzero[:, ::-1], axis=1)
    return start, end


def amplitude_scores(batch: PCMBatch, cfg: AnalysisConfig) -> jnp.ndarray:
    """[B] amplitude scores (float32)."""
    s = batch.samples.astype(jnp.int32)
    start, end = _trim_bounds(s)
    idx = jnp.arange(s.shape[1], dtype=jnp.int32)
    seg = (idx[None, :] >= start[:, None]) & (idx[None, :] <= end[:, None])

    if cfg.amplitude_mode == "table":
        integral = _integral_table(s, seg, start, end, cfg)
    elif cfg.amplitude_mode == "poly":
        integral = _integral_poly(s, seg, start, end, cfg)
    elif cfg.amplitude_mode == "iterative":
        integral = _integral_iterative(s, seg, start, end, cfg)
    else:
        raise ValueError(f"unknown amplitude_mode {cfg.amplitude_mode}")

    # Final affine score in float32, as the reference computes it
    # (src/amplitude_sort.c:79).
    integral = integral.astype(jnp.float32)
    return jnp.float32(C.AMPLITUDE_SCALE) * integral + jnp.float32(
        C.AMPLITUDE_BIAS
    )


def _integral_table(s, seg, start, end, cfg):
    dtype = cfg.jnp_dtype
    w = jnp.asarray(tables.amplitude_weight_table(), dtype)
    vals = jnp.take(w, s + (1 << 15), axis=0)
    dot = jnp.sum(vals * seg.astype(dtype), axis=1)
    span = (end - start).astype(dtype)
    return dot * (jnp.asarray(100.0, dtype) / span)


def poly_weight(sf: jnp.ndarray, dtype) -> jnp.ndarray:
    """Gather-free amplitude weight w(s) = T(1000 - |s+1|): the smoothing
    kernel's CDF T evaluated by a Chebyshev fit (tables.amplitude_cdf_poly).
    TPU gathers serialize per element; this keeps everything on the VPU
    (~2.5e-7 agreement with the exact table).

    Two exact symmetries collapse the evaluation to one Clenshaw per
    sample: the weight is symmetric about s = -1 (so the difference of two
    CDF terms reduces to the single term above), and the CDF satisfies
    T(-m-1) = 1 - T(m) (so only its positive half is fit). Shared by the
    whole-shape analyzer and the streaming pass-1 chunks."""
    A, _, c_pos = tables.amplitude_cdf_poly()
    c_pos = [jnp.asarray(v, dtype) for v in c_pos]

    def chebval(t, coeffs):
        b1 = jnp.zeros_like(t)
        b2 = jnp.zeros_like(t)
        for ck in coeffs[:0:-1]:
            b1, b2 = ck + 2.0 * t * b1 - b2, b1
        return coeffs[0] + t * b1 - b2

    def T(m):
        neg = m < 0
        mf = jnp.where(neg, -m - 1.0, m)  # fold to the positive half
        tp = jnp.clip((2.0 * mf - A) / A, -1.0, 1.0)
        val = chebval(tp, c_pos)
        val = jnp.where(mf >= A, 1.0, val)
        return jnp.where(neg, 1.0 - val, val)

    return T(1000.0 - jnp.abs(sf + 1.0))


def _integral_poly(s, seg, start, end, cfg):
    dtype = cfg.jnp_dtype
    w = poly_weight(s.astype(dtype), dtype)
    dot = jnp.sum(w * seg.astype(dtype), axis=1)
    span = (end - start).astype(dtype)
    return dot * (jnp.asarray(100.0, dtype) / span)


def hist_crop_counts(s, seg):
    """[B, _CROP_W] histogram counts of the samples selected by ``seg``,
    cropped to the 4096 bins the iterative integral can see (int32 —
    exact; shared by the whole-shape path and the streaming chunks)."""
    B = s.shape[0]
    bin_idx = s + ((1 << 15) - _CROP_LO)
    in_crop = (bin_idx >= 0) & (bin_idx < _CROP_W) & seg
    bin_idx = jnp.clip(bin_idx, 0, _CROP_W - 1)
    hist = jnp.zeros((B, _CROP_W), jnp.int32)
    return hist.at[
        jnp.arange(B, dtype=jnp.int32)[:, None], bin_idx
    ].add(in_crop.astype(jnp.int32), mode="drop")


def _integral_iterative(s, seg, start, end, cfg):
    hist = hist_crop_counts(s, seg).astype(jnp.float32)
    return integral_from_hist(hist, (end - start), cfg)


def integral_from_hist(hist, span, cfg):
    """The iterative integral from an assembled [B, _CROP_W] float32
    histogram and the trimmed span (end - start): the reference's 301
    float32 smoothing passes + windowed (optionally strictly-ordered)
    sum. Length-independent — this is why the iterative mode streams:
    chunks accumulate counts, this runs once on the total."""
    # Multiplier 1/27 applied in float64 then stored float32, exactly like
    # `1./27. * (float sums)` in C; fall back to float32 when x64 is off.
    mul_dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    inv27 = jnp.asarray(1.0 / 27.0, mul_dtype)

    def one_pass(h, _):
        # Left-to-right float32 adds match the C expression's association.
        acc = h[:, 0:-6] + jnp.float32(3) * h[:, 1:-5]
        acc = acc + jnp.float32(6) * h[:, 2:-4]
        acc = acc + jnp.float32(7) * h[:, 3:-3]
        acc = acc + jnp.float32(6) * h[:, 4:-2]
        acc = acc + jnp.float32(3) * h[:, 5:-1]
        acc = acc + h[:, 6:]
        smoothed = (acc.astype(mul_dtype) * inv27).astype(jnp.float32)
        return h.at[:, 3:-3].set(smoothed), None

    hist, _ = jax.lax.scan(one_pass, hist, None, length=C.N_SMOOTH_PASSES + 1)

    lo = C.INTEGRAL_INF - _CROP_LO
    hi = C.INTEGRAL_SUP - _CROP_LO
    window = hist[:, lo : hi + 1]
    # Per-bin normalize in float32 (C divides by the negative span then takes
    # fabs; same as dividing by the positive span for nonnegative counts).
    span = span.astype(jnp.float32)
    norm = jnp.abs(
        (window / span[:, None]).astype(mul_dtype) * 100.0
    ).astype(jnp.float32)
    if cfg.strict_accumulation:
        # C sums the integral sequentially in float32; the golden values
        # resolve that accumulation order (~1e-5 of drift over 2001 adds).
        def add(acc, col):
            return acc + col, None

        total, _ = jax.lax.scan(
            add, jnp.zeros(norm.shape[0], jnp.float32), norm.T
        )
        return total
    return jnp.sum(norm, axis=1)
