"""Ablate the fused_stats kernel: which stage costs what on the real TPU."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bliss_tpu import constants as C
from bliss_tpu import tables

BLK = 256
K = 16
CHUNK = int(os.environ.get("CHUNK", 245760))
B, L = 128, 491520
NBLK = CHUNK // BLK
NC = L // CHUNK

rng = np.random.RandomState(0)
x_h = rng.randint(-3000, 3000, size=(B, L)).astype(np.int16)
samples = jax.device_put(x_h)
alpha = jax.device_put(np.full((B,), 1e-3, np.float32))
beta = jax.device_put(np.full((B,), 1e-5, np.float32))

A, _, c_pos = tables.amplitude_cdf_poly()
CHEB = tuple(float(v) for v in c_pos)
HW = float(A)
WARM = jnp.asarray(tables.fir_warmup_correction()[0], jnp.float32)
CONV = jnp.asarray(tables.conv_band_matrix(), jnp.float32)


def make_kernel(do_cheb, do_conv, do_warm, prec):
    def _kernel(ab_ref, x_ref, halo_ref, warm_ref, conv_ref, out_ref):
        j = pl.program_id(1)
        xb = x_ref[0].astype(jnp.float32)

        if do_cheb:
            m = 1000.0 - jnp.abs(xb + 1.0)
            neg = m < 0
            mf = jnp.where(neg, -m - 1.0, m)
            t = jnp.clip((2.0 * mf - HW) / HW, -1.0, 1.0)
            b1 = jnp.zeros_like(t)
            b2 = jnp.zeros_like(t)
            for ck in CHEB[:0:-1]:
                b1, b2 = ck + 2.0 * t * b1 - b2, b1
            val = CHEB[0] + t * b1 - b2
            val = jnp.where(mf >= HW, 1.0, val)
            w = jnp.where(neg, 1.0 - val, val)
        else:
            w = xb
        wsum = jnp.sum(w, axis=1)
        one = jnp.float32(1.0)
        rownz = jnp.max(jnp.where(xb != 0.0, one, one * 0), axis=1)

        al = ab_ref[0, 0, 0]
        be = ab_ref[0, 0, 1]
        xn = xb * al + be
        halo_tail = (
            halo_ref[0, 0].astype(jnp.float32).reshape(1, 16 * 128)[:, -K:] * al + be
        )
        no_hist = (j == 0) & (ab_ref[0, 0, 2] == 0.0)
        halo_tail = jnp.where(no_hist, jnp.zeros_like(halo_tail), halo_tail)
        tails = pltpu.roll(xn[:, BLK - K:], shift=1, axis=0)
        rowK = jax.lax.broadcasted_iota(jnp.int32, (NBLK, K), 0)
        prev_tail = jnp.where(rowK == 0, jnp.broadcast_to(halo_tail, (NBLK, K)), tails)
        ext = jnp.concatenate([prev_tail, xn], axis=1)

        if do_conv:
            z = jnp.dot(ext, conv_ref[:, :], preferred_element_type=jnp.float32,
                        precision=prec)
        else:
            z = ext[:, K:]

        col = jax.lax.broadcasted_iota(jnp.int32, (NBLK, BLK), 1)
        alt = jnp.where(col % 2 == 0, 1.0, -1.0)
        s1 = jnp.sum(z, axis=1)
        s2 = jnp.sum(z * z, axis=1)
        sa = jnp.sum(z * alt, axis=1)

        if do_warm:
            hist = ext[:, :K]
            zh = z[:, :K]
            delta = jax.lax.dot_general(
                hist, warm_ref[:, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            altK = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (NBLK, K), 1) % 2 == 0, 1.0, -1.0)
            d1 = jnp.sum(delta, axis=1)
            d2 = jnp.sum(2.0 * zh * delta + delta * delta, axis=1)
            da = jnp.sum(delta * altK, axis=1)
        else:
            d1 = s1 * 0
            d2 = s1 * 0
            da = s1 * 0

        out_ref[0, 0] = jnp.stack([s1, s2, sa, d1, d2, da, wsum, rownz])
    return _kernel


def run_variant(name, do_cheb=True, do_conv=True, do_warm=True,
                prec=jax.lax.Precision.HIGHEST):
    kern = make_kernel(do_cheb, do_conv, do_warm, prec)

    def call(x):
        hv = jnp.zeros((B,), jnp.float32)
        ab = jnp.stack([alpha, beta, hv, hv], axis=1)[:, None, :]
        halo = jnp.pad(x, ((0, 0), (16 * 128, 0)))[:, :L]
        halo = halo.reshape(B, NC, CHUNK)[:, :, :16 * 128].reshape(B, NC, 16, 128)
        out = pl.pallas_call(
            kern,
            grid=(B, NC),
            in_specs=[
                pl.BlockSpec((1, 1, 4), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, NBLK, BLK), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 16, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK + K, BLK), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 8, NBLK), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, NC, 8, NBLK), jnp.float32),
        )(ab, x.reshape(B, NC * NBLK, BLK), halo, WARM, CONV)
        return out

    @functools.partial(jax.jit, static_argnames="R")
    def rep(x, R):
        def body(i, acc):
            return acc + jnp.sum(call(x + (i % 3).astype(jnp.int16))[:, :, :2])
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    float(rep(samples, 4)); float(rep(samples, 24))
    def t(R):
        t0 = time.time()
        for _ in range(3):
            float(rep(samples, R))
        return (time.time() - t0) / 3
    per = (t(24) - t(4)) / 20
    print(f"{name:32s} {per*1000:8.3f} ms/batch", flush=True)


run_variant("full (HIGHEST)")
run_variant("no cheb", do_cheb=False)
run_variant("no conv", do_conv=False)
run_variant("no warmup", do_warm=False)
run_variant("conv DEFAULT", prec=jax.lax.Precision.DEFAULT)
run_variant("bare (no cheb/conv/warm)", do_cheb=False, do_conv=False, do_warm=False)


def run_variant2(name, body_fn):
    def _kernel(ab_ref, x_ref, halo_ref, warm_ref, conv_ref, out_ref):
        out_ref[0, 0] = body_fn(x_ref, ab_ref)

    def call(x):
        hv = jnp.zeros((B,), jnp.float32)
        ab = jnp.stack([alpha, beta, hv, hv], axis=1)[:, None, :]
        halo = jnp.pad(x, ((0, 0), (16 * 128, 0)))[:, :L]
        halo = halo.reshape(B, NC, CHUNK)[:, :, :16 * 128].reshape(B, NC, 16, 128)
        return pl.pallas_call(
            _kernel,
            grid=(B, NC),
            in_specs=[
                pl.BlockSpec((1, 1, 4), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, NBLK, BLK), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 16, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK + K, BLK), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 8, NBLK), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, NC, 8, NBLK), jnp.float32),
        )(ab, x.reshape(B, NC * NBLK, BLK), halo, WARM, CONV)

    @functools.partial(jax.jit, static_argnames="R")
    def rep(x, R):
        def body(i, acc):
            return acc + jnp.sum(call(x + (i % 3).astype(jnp.int16))[:, :, :2])
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    float(rep(samples, 4)); float(rep(samples, 24))
    def t(R):
        t0 = time.time()
        for _ in range(3):
            float(rep(samples, R))
        return (time.time() - t0) / 3
    per = (t(24) - t(4)) / 20
    print(f"{name:32s} {per*1000:8.3f} ms/batch", flush=True)


def v_zero(x_ref, ab_ref):
    return jnp.zeros((8, NBLK), jnp.float32)

def v_convert(x_ref, ab_ref):
    xb = x_ref[0].astype(jnp.float32)
    # cheap dependency on xb without cross-lane reduction or relayout:
    return jnp.zeros((8, NBLK), jnp.float32) + xb[:1, :1]

def v_sums_stack(x_ref, ab_ref):
    xb = x_ref[0].astype(jnp.float32)
    s1 = jnp.sum(xb, axis=1)
    return jnp.stack([s1, s1, s1, s1, s1, s1, s1, s1])

def v_one_sum(x_ref, ab_ref):
    xb = x_ref[0].astype(jnp.float32)
    s1 = jnp.sum(xb, axis=1)
    return jnp.zeros((8, NBLK), jnp.float32) + s1[None, :]

def v_six_sums(x_ref, ab_ref):
    xb = x_ref[0].astype(jnp.float32)
    s1 = jnp.sum(xb, axis=1)
    s2 = jnp.sum(xb * xb, axis=1)
    s3 = jnp.sum(xb + 1.0, axis=1)
    s4 = jnp.sum(xb * 2.0, axis=1)
    s5 = jnp.sum(xb - 1.0, axis=1)
    s6 = jnp.sum(xb * 0.5, axis=1)
    return jnp.stack([s1, s2, s3, s4, s5, s6, s1, s2])

run_variant2("zero-out only", v_zero)
run_variant2("convert only", v_convert)
run_variant2("1 lane-sum bcast", v_one_sum)
run_variant2("1 lane-sum stacked x8", v_sums_stack)
run_variant2("6 lane-sums stacked", v_six_sums)
