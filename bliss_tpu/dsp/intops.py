"""Integer helpers matching C semantics where they are observable."""

from __future__ import annotations

import jax.numpy as jnp


def c_div(a, b):
    """C-style integer division (truncation toward zero).

    The reference relies on C `/` for the signal mean and the stereo
    downmix (reference: src/helpers.c:36, src/frequency_sort.c:71-73);
    Python/JAX `//` floors instead, which differs for negative operands.
    """
    q = jnp.floor_divide(a, b)
    r = a - q * b
    # floor rounded away from zero iff remainder nonzero and signs differ
    adjust = (r != 0) & ((a < 0) != (b < 0))
    return q + adjust.astype(q.dtype)
