"""k-means clustering over force vectors (library radio / auto-playlists).

New capability beyond the reference (BASELINE.json config 5: "100k-song
radio/clustering: k-means over feature vectors with distance matmul").
Lloyd iterations run fully on device with static shapes: assignment is an
[N, K] distance matmul + argmin, the update a segment mean via one-hot
matmul (MXU), iterated with lax.scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(
    features: jnp.ndarray,
    k: int,
    iters: int = 25,
    seed: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster [N, D] features into k groups.

    Returns (centroids [k, D], assignments [N]). Initialization samples k
    points without replacement (jax.random.choice).
    """
    n = features.shape[0]
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, shape=(k,), replace=False)
    centroids = features[init_idx]

    sq_f = jnp.sum(features * features, axis=-1)  # [N], loop-invariant

    def step(cents, _):
        d2 = (
            sq_f[:, None]
            - 2.0 * jnp.matmul(features, cents.T, precision=jax.lax.Precision.HIGHEST)
            + jnp.sum(cents * cents, axis=-1)[None, :]
        )
        assign = jnp.argmin(d2, axis=-1)  # [N]
        onehot = jax.nn.one_hot(assign, k, dtype=features.dtype)  # [N, K]
        counts = jnp.sum(onehot, axis=0)  # [K]
        sums = jnp.matmul(onehot.T, features, precision=jax.lax.Precision.HIGHEST)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # Keep empty clusters where they were.
        new = jnp.where(counts[:, None] > 0, new, cents)
        return new, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    d2 = (
        sq_f[:, None]
        - 2.0 * jnp.matmul(features, centroids.T, precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(centroids * centroids, axis=-1)[None, :]
    )
    return centroids, jnp.argmin(d2, axis=-1)
