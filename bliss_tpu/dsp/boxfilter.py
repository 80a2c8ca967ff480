"""Centered box sums via static shifted adds.

Used to replicate the reference's rectangular smoothing filter
(reference: src/tempo_atk_sort.c:19-40) without its running-sum state: a
width-19 'same' box sum is 19 shifted adds — cheap, vectorized over the
batch, and free of the cumsum cancellation that plagues long float32 scans.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_sum_same(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """sum_{d=-(w//2)..w//2} x[j+d] with zero padding, over the last axis.

    ``width`` must be odd (the reference uses 19).
    """
    if width % 2 == 0:
        raise ValueError("width must be odd")
    half = width // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(half, half)]
    xp = jnp.pad(x, pad)
    out = xp[..., :x.shape[-1]]
    for d in range(1, width):
        out = out + xp[..., d : d + x.shape[-1]]
    return out
