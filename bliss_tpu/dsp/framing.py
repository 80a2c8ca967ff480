"""Signal framing as pure reshapes (no gathers).

TPU-native framing: building the [num_windows, frame] matrix with strided
gathers defeats XLA's layout optimizer, so half-overlap framing is expressed
as two aligned reshapes interleaved — pure data movement XLA folds into the
consumer. This realizes the blockwise-processing contract of the reference
analyzers (512-sample windows, hop 256: reference src/tempo_atk_sort.c:50-55;
hop 512: src/frequency_sort.c:67).
"""

from __future__ import annotations

import jax.numpy as jnp


def frame_signal(x: jnp.ndarray, frame: int = 512, hop: int = 256) -> jnp.ndarray:
    """Frame the last axis of ``x`` into overlapping windows.

    Supports hop == frame (trivial reshape) and hop == frame // 2
    (interleaved half-offset reshapes). ``x.shape[-1]`` must be a multiple of
    ``frame``. Returns [..., n_windows, frame] with
    n_windows = L//hop - (frame//hop - 1).
    """
    L = x.shape[-1]
    if L % frame:
        raise ValueError(f"signal length {L} not a multiple of frame {frame}")
    lead = x.shape[:-1]
    if hop == frame:
        return x.reshape(*lead, L // frame, frame)
    if hop * 2 != frame:
        raise ValueError("only hop == frame or hop == frame//2 supported")
    n_even = L // frame            # windows at offsets 0, frame, 2*frame, ...
    n_odd = n_even - 1             # windows at offsets hop, hop+frame, ...
    even = x.reshape(*lead, n_even, frame)
    odd = x[..., hop : hop + n_odd * frame].reshape(*lead, n_odd, frame)
    paired = jnp.stack([even[..., :n_odd, :], odd], axis=-2)
    paired = paired.reshape(*lead, 2 * n_odd, frame)
    return jnp.concatenate([paired, even[..., n_odd:, :]], axis=-2)
