"""Isolate pallas_call scaffolding costs: input dtype, DMA, grid overhead."""
import sys; sys.path.insert(0, '/root/repo')
import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 256
B, L = 128, 491520
CHUNK = int(os.environ.get("CHUNK", 245760))
NBLK = CHUNK // BLK
NC = L // CHUNK

rng = np.random.RandomState(0)
x16 = jax.device_put(rng.randint(-3000, 3000, size=(B, L)).astype(np.int16))


def bench(make_call, x, R1=4, R2=24):
    @functools.partial(jax.jit, static_argnames="R")
    def rep(xx, R):
        def body(i, acc):
            return acc + jnp.sum(make_call(xx + (i % 3).astype(xx.dtype))[:, :, :1])
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
    float(rep(x, R1)); float(rep(x, R2))
    def t(R):
        t0 = time.time()
        for _ in range(3):
            float(rep(x, R))
        return (time.time() - t0) / 3
    return (t(R2) - t(R1)) / (R2 - R1)


def kernel_noin(out_ref):
    out_ref[0, 0] = jnp.zeros((8, NBLK), jnp.float32)


def call_noin(x):
    # x unused: measures pure grid overhead + out DMA
    return pl.pallas_call(
        kernel_noin,
        grid=(B, NC),
        in_specs=[],
        out_specs=pl.BlockSpec((1, 1, 8, NBLK), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NC, 8, NBLK), jnp.float32),
    )


def make_call_x(dtype, lanes):
    nblk = NBLK
    def kernel(x_ref, out_ref):
        xb = x_ref[0][:8, :].astype(jnp.float32)  # [8, lanes] tiny slice
        dep = jnp.pad(xb[:, :min(lanes, nblk)], ((0, 0), (0, max(nblk - lanes, 0))))
        out_ref[0, 0] = dep[:, :nblk]

    def call(x):
        return pl.pallas_call(
            kernel,
            grid=(B, NC),
            in_specs=[pl.BlockSpec((1, nblk, lanes), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 8, nblk), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, NC, 8, nblk), jnp.float32),
        )(x.reshape(B, NC * nblk, lanes))
    return call


print(f"CHUNK={CHUNK} NC={NC} NBLK={NBLK} grid={B*NC} steps", flush=True)
t = bench(lambda x: call_noin(x)(), x16)
print(f"no-input zeros-out      {t*1000:8.3f} ms", flush=True)

t = bench(make_call_x(jnp.int16, BLK), x16)
print(f"x int16 [.,{BLK}]        {t*1000:8.3f} ms", flush=True)

x32 = jax.device_put(np.asarray(x16).astype(np.int32))
t = bench(make_call_x(jnp.int32, BLK), x32)
print(f"x int32 [.,{BLK}]        {t*1000:8.3f} ms", flush=True)

xf = jax.device_put(np.asarray(x16).astype(np.float32))
t = bench(make_call_x(jnp.float32, BLK), xf)
print(f"x f32   [.,{BLK}]        {t*1000:8.3f} ms", flush=True)

# full compute-free read of int16 with a lane reduction (forces real load)
def make_call_touch(dtype):
    def kernel(x_ref, out_ref):
        xb = x_ref[0].astype(jnp.float32)
        s = jnp.sum(xb, axis=1)
        out_ref[0, 0] = jnp.stack([s] * 8)
    def call(x):
        return pl.pallas_call(
            kernel,
            grid=(B, NC),
            in_specs=[pl.BlockSpec((1, NBLK, BLK), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, 8, NBLK), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, NC, 8, NBLK), jnp.float32),
        )(x.reshape(B, NC * NBLK, BLK))
    return call

t = bench(make_call_touch(jnp.int16), x16)
print(f"x i16 full sum          {t*1000:8.3f} ms", flush=True)
t = bench(make_call_touch(jnp.float32), xf)
print(f"x f32 full sum          {t*1000:8.3f} ms", flush=True)
