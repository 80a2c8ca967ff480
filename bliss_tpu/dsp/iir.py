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
    x: jnp.ndarray, *, block: int = 256, precision=jax.lax.Precision.HIGHEST
) -> jnp.ndarray:
    """Butterworth low-pass (tables.BUTTER_B/A) via the block recurrence.

    ``x``: [..., T]; T is padded up to a multiple of ``block`` internally
    (the zero-padded tail outputs are discarded).
    """
    L, Z, M, N = tables.iir_block_operator(block)
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
