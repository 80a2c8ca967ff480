"""Does bitcasting the PCM to int32 (same bytes, half the elements) lift
the measured int16 streaming-read floor (~0.95 ms/kernel, ~130 GB/s —
docs/DESIGN.md §7)?

The earlier dtype ablation (ablate_dma.py) compared int16 vs int32 vs f32
ARRAYS — the wider dtypes carried 2x the bytes, so they measured
bandwidth, not element-count overhead. Here the int32 view carries the
SAME bytes as the int16 array; the kernel unpacks lo/hi halves with
shifts. If the floor is element-count-bound (i16 sublane packing /
upcast), this halves it; if byte-bound, it changes nothing.
"""
import sys; sys.path.insert(0, '/root/repo')
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 256
B, L = 128, 491520
CHUNK = 245760
NBLK = CHUNK // BLK          # int16 rows per grid step
NBLKP = NBLK // 2            # int32 rows per grid step (same bytes)
NC = L // CHUNK

rng = np.random.RandomState(0)
x16h = rng.randint(-3000, 3000, size=(B, L)).astype(np.int16)
x16 = jax.device_put(x16h)
xpk = jax.device_put(x16h.view(np.int32))  # [B, L//2], identical bytes


def bench(call, x, R1=4, R2=24):
    @functools.partial(jax.jit, static_argnames="R")
    def rep(xx, R):
        def body(i, acc):
            return acc + jnp.sum(call(xx + (i % 3).astype(xx.dtype))[:, :, :1])
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
    float(rep(x, R1)); float(rep(x, R2))
    def t(R):
        t0 = time.time()
        for _ in range(3):
            float(rep(x, R))
        return (time.time() - t0) / 3
    return (t(R2) - t(R1)) / (R2 - R1)


def call_i16(x):
    def kernel(x_ref, out_ref):
        s = jnp.sum(x_ref[0].astype(jnp.float32), axis=1)
        out_ref[0, 0] = jnp.stack([s] * 8)
    return pl.pallas_call(
        kernel,
        grid=(B, NC),
        in_specs=[pl.BlockSpec((1, NBLK, BLK), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 8, NBLK), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NC, 8, NBLK), jnp.float32),
    )(x.reshape(B, NC * NBLK, BLK))


def call_packed(x):
    def kernel(x_ref, out_ref):
        w = x_ref[0]                                  # [NBLKP, BLK] int32
        lo = ((w << 16) >> 16).astype(jnp.float32)    # samples 2k (LE)
        hi = (w >> 16).astype(jnp.float32)            # samples 2k+1
        s = jnp.sum(lo + hi, axis=1)
        out_ref[0, 0] = jnp.stack([s] * 8)
    return pl.pallas_call(
        kernel,
        grid=(B, NC),
        in_specs=[pl.BlockSpec((1, NBLKP, BLK), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 8, NBLKP), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NC, 8, NBLKP), jnp.float32),
    )(x.reshape(B, NC * NBLKP, BLK))


def call_packed_nounpack(x):
    # reads the packed words but sums them AS int32 — isolates the unpack
    # shifts from the load itself
    def kernel(x_ref, out_ref):
        s = jnp.sum(x_ref[0].astype(jnp.float32), axis=1)
        out_ref[0, 0] = jnp.stack([s] * 8)
    return pl.pallas_call(
        kernel,
        grid=(B, NC),
        in_specs=[pl.BlockSpec((1, NBLKP, BLK), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 8, NBLKP), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NC, 8, NBLKP), jnp.float32),
    )(x.reshape(B, NC * NBLKP, BLK))


if __name__ == "__main__":
    gb = B * L * 2 / 1e9
    # correctness: packed unpack must reproduce the int16 sums
    a = np.asarray(jax.jit(call_i16)(x16)).astype(np.float64)[:, :, 0, :].sum()
    b = np.asarray(jax.jit(call_packed)(xpk)).astype(np.float64)[:, :, 0, :].sum()
    print(f"sum check: i16={a:.0f} packed={b:.0f} match={abs(a-b) < 1}", flush=True)
    for name, call, x in [
        ("i16 full sum     ", call_i16, x16),
        ("i32-packed sum   ", call_packed, xpk),
        ("i32-packed noup  ", call_packed_nounpack, xpk),
    ]:
        t = bench(call, x)
        print(f"{name} {t*1000:8.3f} ms   {gb/t:7.1f} GB/s", flush=True)
