"""k-means clustering over force vectors (library radio / auto-playlists).

New capability beyond the reference (BASELINE.json config 5: "100k-song
radio/clustering: k-means over feature vectors with distance matmul").
Everything runs on device with static shapes:

- init: k-means++ (Arthur & Vassilvitskii 2007) — each next seed sampled
  proportionally to its squared distance from the chosen seeds, via a
  lax.scan of distance matmuls + jax.random.categorical. Removes the
  luck-of-the-seed quality variance of uniform init.
- Lloyd iterations: assignment is an [N, K] distance matmul + argmin, the
  update a segment mean via one-hot matmul (MXU), inside a lax.while_loop
  with a centroid-shift convergence stop (max_iters is the static bound
  the loop compiles against).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _dist2(features, sq_f, cents):
    """Squared Euclidean distances [N, K] via one matmul."""
    return (
        sq_f[:, None]
        - 2.0
        * jnp.matmul(features, cents.T, precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(cents * cents, axis=-1)[None, :]
    )


def _pp_init(key, features, sq_f, k):
    """k-means++ seeding: [k, D] centroids."""
    n, d = features.shape
    first = features[jax.random.randint(key, (), 0, n)]
    cents = jnp.zeros((k, d), features.dtype).at[0].set(first)
    mind2 = jnp.maximum(_dist2(features, sq_f, first[None, :])[:, 0], 0.0)

    def step(carry, ki):
        cents, mind2 = carry
        ki_key = jax.random.fold_in(key, ki)
        idx = jax.random.categorical(
            ki_key, jnp.log(jnp.maximum(mind2, 1e-30))
        )
        c = features[idx]
        cents = cents.at[ki].set(c)
        d2 = jnp.maximum(_dist2(features, sq_f, c[None, :])[:, 0], 0.0)
        return (cents, jnp.minimum(mind2, d2)), None

    (cents, _), _ = jax.lax.scan(
        step, (cents, mind2), jnp.arange(1, k, dtype=jnp.int32)
    )
    return cents


@partial(jax.jit, static_argnames=("k", "iters", "init"))
def kmeans(
    features: jnp.ndarray,
    k: int,
    iters: int = 100,
    seed: int = 0,
    tol: float = 1e-4,
    init: str = "pp",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster [N, D] features into k groups.

    Returns (centroids [k, D], assignments [N]). ``init``: "pp" (k-means++,
    default) or "random" (uniform sample without replacement). Lloyd stops
    when the max centroid shift falls below ``tol`` or after ``iters``.
    """
    n = features.shape[0]
    key = jax.random.PRNGKey(seed)
    sq_f = jnp.sum(features * features, axis=-1)  # [N], loop-invariant

    if init == "pp":
        centroids = _pp_init(key, features, sq_f, k)
    elif init == "random":
        init_idx = jax.random.choice(key, n, shape=(k,), replace=False)
        centroids = features[init_idx]
    else:
        raise ValueError(f"unknown init {init!r}: use 'pp' or 'random'")

    def lloyd_step(cents):
        assign = jnp.argmin(_dist2(features, sq_f, cents), axis=-1)  # [N]
        onehot = jax.nn.one_hot(assign, k, dtype=features.dtype)  # [N, K]
        counts = jnp.sum(onehot, axis=0)  # [K]
        sums = jnp.matmul(
            onehot.T, features, precision=jax.lax.Precision.HIGHEST
        )
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # Keep empty clusters where they were.
        return jnp.where(counts[:, None] > 0, new, cents)

    def cond(carry):
        _, shift, it = carry
        return (shift > tol) & (it < iters)

    def body(carry):
        cents, _, it = carry
        new = lloyd_step(cents)
        return new, jnp.max(jnp.abs(new - cents)), it + 1

    centroids, _, _ = jax.lax.while_loop(
        cond, body, (centroids, jnp.asarray(jnp.inf, features.dtype), 0)
    )
    return centroids, jnp.argmin(_dist2(features, sq_f, centroids), axis=-1)
