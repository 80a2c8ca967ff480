"""Song similarity on force vectors.

Scalar semantics follow the reference (Euclidean distance:
src/analyze.c:88-103; cosine similarity: src/analyze.c:127-143). The batched
forms are new, TPU-first capabilities: whole-library pairwise similarity as
a single matmul-shaped program (the reference can only compare two songs per
call; its playlist example loops in Python over numpy,
python/examples/make_m3u_playlist.py:65-67).
"""

from __future__ import annotations

from functools import partial

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


@partial(jax.jit, static_argnames=("k",))
def _block_topk(q, feats, row0, k):
    """Top-k neighbors of query block ``q`` [Q, D] within ``feats`` [N, D].

    ``row0`` is the global index of q's first row; each query's own row is
    masked out (self-distance) before the top-k.
    """
    sq_q = jnp.sum(q * q, axis=-1)
    sq_f = jnp.sum(feats * feats, axis=-1)
    gram = jnp.matmul(q, feats.T, precision=_HP)
    d2 = sq_q[:, None] + sq_f[None, :] - 2.0 * gram
    n = feats.shape[0]
    self_col = row0 + jnp.arange(q.shape[0])
    is_self = jnp.arange(n)[None, :] == self_col[:, None]
    d2 = jnp.where(is_self, jnp.inf, jnp.maximum(d2, 0.0))
    neg, idx = jax.lax.top_k(-d2, k)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx


def nearest_neighbors_all(
    features: jnp.ndarray, k: int, block: int = 4096
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Every song's k nearest others: [N, D] -> (dists [N, k], idx [N, k]).

    Processed in query blocks of ``block`` rows so peak memory is
    O(block * N), not O(N^2) — a 100k-song library needs ~1.6 GB per block
    step instead of a 40 GB full matrix. Each block is one MXU matmul +
    device top-k; the jitted program is reused across blocks (the last
    block is padded to ``block`` rows).
    """
    feats = jnp.asarray(features, jnp.float32)
    n, k = feats.shape[0], min(k, max(feats.shape[0] - 1, 0))
    if n == 0 or k <= 0:
        return (jnp.zeros((n, 0), jnp.float32), jnp.zeros((n, 0), jnp.int32))
    block = min(block, n)
    dists, idxs = [], []
    for row0 in range(0, n, block):
        q = feats[row0 : row0 + block]
        pad = block - q.shape[0]
        if pad:
            q = jnp.pad(q, ((0, pad), (0, 0)))
        d, i = _block_topk(q, feats, row0, k)
        if pad:
            d, i = d[:-pad], i[:-pad]
        dists.append(d)
        idxs.append(i)
    return jnp.concatenate(dists), jnp.concatenate(idxs)


def playlist_order(features: jnp.ndarray, seed_index: int) -> jnp.ndarray:
    """Full playlist for a seed song: all songs ordered by ascending distance
    (the batch generalization of python/examples/make_m3u_playlist.py)."""
    d = distance(features, features[seed_index][None, :])
    return jnp.argsort(d)
