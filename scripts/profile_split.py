"""Split fused_sample_stats into XLA prepass vs Pallas kernel cost."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from bliss_tpu.dsp.intops import c_div
from bliss_tpu.kernels.fused_stats import fused_stats_call

B = int(os.environ.get("B", 128))
L = 491520
rng = np.random.RandomState(0)
samples = jax.device_put(rng.randint(-3000, 3000, size=(B, L)).astype(np.int16))
n_samples = jax.device_put(np.full((B,), L - 1000, np.int32))


def prepass(x, n_samples):
    B, L = x.shape
    s32 = x.astype(jnp.int32)
    nz = x != 0
    idx = jnp.arange(L, dtype=jnp.int32)
    start = jnp.argmax(nz, axis=1).astype(jnp.int32)
    end = (L - 1 - jnp.argmax(nz[:, ::-1], axis=1)).astype(jnp.int32)
    valid = idx[None, :] < n_samples[:, None]
    mean = jnp.sum(jnp.where(valid, s32, 0), axis=1, dtype=jnp.int32)
    mean = c_div(mean, n_samples)
    d = jnp.where(valid, s32 - mean[:, None], 0).astype(jnp.float32)
    var = jnp.trunc(jnp.sum(d * d, axis=1) / n_samples.astype(jnp.float32))
    inv = jnp.float32(1.0 / (1 << 15))
    alpha = inv / (var * inv * inv)
    beta = -(mean.astype(jnp.float32) * inv) / (var * inv * inv)
    return start, end, alpha, beta


def loop_bench(name, fn, R1=4, R2=24):
    @functools.partial(jax.jit, static_argnames="R")
    def rep(x, R):
        def body(i, acc):
            nx = x + (i % 3).astype(jnp.int16)
            out = fn(nx)
            return acc + jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))

        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    float(rep(samples, R1))
    float(rep(samples, R2))

    def t(R):
        t0 = time.time()
        for _ in range(3):
            float(rep(samples, R))
        return (time.time() - t0) / 3

    per = (t(R2) - t(R1)) / (R2 - R1)
    print(f"{name:34s} {per*1000:8.3f} ms/batch", flush=True)
    return per


start, end, alpha, beta = jax.jit(prepass)(samples, n_samples)
start, end, alpha, beta = (
    jax.device_put(np.asarray(v)) for v in (start, end, alpha, beta)
)

loop_bench("prepass(mean/var/trim)", lambda x: prepass(x, n_samples))
loop_bench("kernel only (fixed scalars)", lambda x: fused_stats_call(x, alpha, beta))

# prepass sub-pieces
loop_bench("  trim argmax fwd+rev", lambda x: (
    jnp.argmax(x != 0, axis=1) + jnp.argmax((x != 0)[:, ::-1], axis=1)))
loop_bench("  mean only", lambda x: jnp.sum(
    jnp.where(jnp.arange(L, dtype=jnp.int32)[None, :] < n_samples[:, None],
              x.astype(jnp.int32), 0), axis=1, dtype=jnp.int32))
def var_piece(x):
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < n_samples[:, None]
    d = jnp.where(valid, x.astype(jnp.int32) - 3, 0).astype(jnp.float32)
    return jnp.sum(d * d, axis=1)
loop_bench("  var only", var_piece)
