"""Song similarity on force vectors.

Scalar semantics follow the reference (Euclidean distance:
src/analyze.c:88-103; cosine similarity: src/analyze.c:127-143). The batched
forms are new, TPU-first capabilities: whole-library pairwise similarity as
a single matmul-shaped program (the reference can only compare two songs per
call; its playlist example loops in Python over numpy,
python/examples/make_m3u_playlist.py:65-67).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HP = jax.lax.Precision.HIGHEST


def distance(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance between force vectors [..., 4]."""
    d = jnp.asarray(v1) - jnp.asarray(v2)
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def cosine_similarity(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity between force vectors [..., 4]."""
    v1 = jnp.asarray(v1)
    v2 = jnp.asarray(v2)
    num = jnp.sum(v1 * v2, axis=-1)
    den = jnp.sqrt(jnp.sum(v1 * v1, axis=-1)) * jnp.sqrt(
        jnp.sum(v2 * v2, axis=-1)
    )
    return num / den


@jax.jit
def distance_matrix(a: jnp.ndarray, b: jnp.ndarray | None = None) -> jnp.ndarray:
    """All-pairs Euclidean distances: [N, 4] x [M, 4] -> [N, M].

    Expressed through the Gram matrix so the N*M*4 inner products ride the
    MXU; the diagonal of a self-distance matrix is clamped exactly to 0.
    """
    self_pairs = b is None
    if b is None:
        b = a
    sq_a = jnp.sum(a * a, axis=-1)
    sq_b = jnp.sum(b * b, axis=-1)
    gram = jnp.matmul(a, b.T, precision=_HP)
    d2 = sq_a[:, None] + sq_b[None, :] - 2.0 * gram
    if self_pairs:
        eye = jnp.eye(a.shape[0], dtype=bool)
        d2 = jnp.where(eye, 0.0, d2)
        d2 = jnp.maximum(d2, d2.T)  # exact symmetry
    return jnp.sqrt(jnp.maximum(d2, 0.0))


@jax.jit
def cosine_similarity_matrix(
    a: jnp.ndarray, b: jnp.ndarray | None = None
) -> jnp.ndarray:
    """All-pairs cosine similarity: [N, 4] x [M, 4] -> [N, M]."""
    if b is None:
        b = a
    an = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return jnp.matmul(an, bn.T, precision=_HP)


def nearest_neighbors(
    features: jnp.ndarray, query: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest songs to ``query`` [4] within ``features`` [N, 4].

    Returns (distances [k], indices [k]) sorted ascending. Uses top-k on the
    negated distances (device-side; no host sort).
    """
    d = distance(features, query[None, :])
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx


def playlist_order(features: jnp.ndarray, seed_index: int) -> jnp.ndarray:
    """Full playlist for a seed song: all songs ordered by ascending distance
    (the batch generalization of python/examples/make_m3u_playlist.py)."""
    d = distance(features, features[seed_index][None, :])
    return jnp.argsort(d)
