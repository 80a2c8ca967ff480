"""IIR filtering on TPU.

The reference's Butterworth low-pass is an inherently sequential per-sample
recurrence (reference: src/tempo_atk_sort.c:200-218). Two TPU realizations:

- ``lfilter_scan``: the literal recurrence via lax.scan (reference semantics,
  used for parity cross-checks and as a fallback).
- ``lfilter_blocked``: the recurrence is linear, so a block of T steps is a
  dense affine map of (block inputs, incoming state). Precomputing the four
  block operators (tables.iir_block_operator) turns seq_len sequential steps
  into seq_len/T MXU matmuls — the standard state-space block trick for
  parallelizing linear recurrences on matrix hardware.

Both operate on [..., T] arrays with zero initial state, matching the
reference (registry memset at src/tempo_atk_sort.c:193-197).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bliss_tpu import tables


def lfilter_scan(b: np.ndarray, a: np.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Direct-form-II-transposed lfilter over the last axis, zero init."""
    dtype = x.dtype
    b = jnp.asarray(b, dtype)
    a = jnp.asarray(a, dtype)
    order = a.shape[0] - 1
    lead = x.shape[:-1]

    def step(z, u):
        y = b[0] * u + z[..., 0]
        znew = [b[k] * u + z[..., k] - a[k] * y for k in range(1, order)]
        znew.append(b[order] * u - a[order] * y)
        return jnp.stack(znew, axis=-1), y

    # Deriving the zero state from x keeps sharding/varying-axis metadata
    # consistent when this runs inside shard_map.
    z0 = jnp.zeros_like(x[..., :order])
    xt = jnp.moveaxis(x, -1, 0)
    _, yt = jax.lax.scan(step, z0, xt)
    return jnp.moveaxis(yt, 0, -1)


def lfilter_blocked(
    x: jnp.ndarray,
    *,
    block: int = 256,
    precision=jax.lax.Precision.HIGHEST,
    kind: str = "butter",
) -> jnp.ndarray:
    """Butterworth low-pass (tables.BUTTER_B/A) via the block recurrence.

    ``x``: [..., T]; T is padded up to a multiple of ``block`` internally
    (the zero-padded tail outputs are discarded). ``kind`` selects the block
    operator (see tables.iir_block_operator).
    """
    L, Z, M, N = tables.iir_block_operator(block, kind)
    dtype = x.dtype
    Lt = jnp.asarray(L.T, dtype)
    Zt = jnp.asarray(Z.T, dtype)
    Mt = jnp.asarray(M.T, dtype)
    Nt = jnp.asarray(N.T, dtype)

    T = x.shape[-1]
    pad = (-T) % block
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    lead = x.shape[:-1]
    nblk = x.shape[-1] // block
    xb = x.reshape(*lead, nblk, block)
    xb = jnp.moveaxis(xb, -2, 0)  # [nblk, ..., block]

    def step(z, u):
        y = (
            jnp.matmul(u, Lt, precision=precision)
            + jnp.matmul(z, Zt, precision=precision)
        )
        z = (
            jnp.matmul(u, Mt, precision=precision)
            + jnp.matmul(z, Nt, precision=precision)
        )
        return z, y

    z0 = jnp.zeros_like(x[..., : Zt.shape[0]])
    _, yb = jax.lax.scan(step, z0, xb)
    y = jnp.moveaxis(yb, 0, -2).reshape(*lead, nblk * block)
    return y[..., :T]


def _shift_right(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """x delayed by k with zero fill (zero initial filter state)."""
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(k, 0)])[..., : x.shape[-1]]


def lfilter_dd(u, *, block: int = 256, refinements: int = 2):
    """Butterworth low-pass of a double-single input, to ~2^-48 relative
    precision, via iterative refinement — the engine of the beat-exact
    on-device envelope finish (tempo_finish="device_exact").

    The filter is a lower-triangular linear solve A y = B u with
    A = 1 + sum a_k z^-k, B = sum b_k z^-k. We compute an f32 solution with
    the fast MXU block recurrence, then repeatedly (a) form the residual
    r = B u - A y in double-single arithmetic (vectorized shifts — no
    recurrence), and (b) solve the small correction A e = r in f32 blocked
    form again. Each pass shrinks the error by ~eps_f32 * ||A^-1||; two
    passes land at the double-single floor (~3e-11 absolute, measured
    against scipy float64 in tests/test_ddmath.py; a third pass measured
    identical error but +2.8% device batch time).

    ``u``: (hi, lo) with shape [..., T]. Returns a normalized (hi, lo).
    """
    from bliss_tpu.dsp import ddmath as dd

    from bliss_tpu import constants as C

    b_dd = [dd.const(v) for v in np.asarray(C.BUTTER_B, np.float64)]
    a_dd = [dd.const(v) for v in np.asarray(C.BUTTER_A, np.float64)[1:]]

    u_hi, u_lo = u

    def fir_b(x):
        """B x in dd for dd input x."""
        acc = None
        for k, (chi, clo) in enumerate(b_dd):
            xs = (_shift_right(x[0], k), _shift_right(x[1], k))
            term = dd.add(dd.mul_f(xs, chi), dd.mul_f(xs, clo))
            acc = term if acc is None else dd.add(acc, term)
        return acc

    def apply_a(y):
        """A y in dd for dd input y."""
        acc = y
        for k, (chi, clo) in enumerate(a_dd, start=1):
            ys = (_shift_right(y[0], k), _shift_right(y[1], k))
            term = dd.add(dd.mul_f(ys, chi), dd.mul_f(ys, clo))
            acc = dd.add(acc, term)
        return acc

    rhs = fir_b(u)
    y = dd.from_f32(lfilter_blocked(u_hi, block=block))
    for _ in range(refinements):
        r = dd.sub(rhs, apply_a(y))
        e = lfilter_blocked(r[0], block=block, kind="recursive")
        y = dd.add(y, dd.from_f32(e))
    return y
