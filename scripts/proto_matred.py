"""Prototype: fused_stats kernel with MXU-matmul reductions instead of VPU
lane reductions (+ optionally a narrower A=128/deg-14 Chebyshev).
Times each variant on the real TPU and checks numerics vs the shipped
kernel."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bliss_tpu import tables
from bliss_tpu.kernels.fused_stats import fused_stats_call, BLK

K = 16
B, L = 128, 491520
CHUNK = 245760
NBLK = CHUNK // BLK
NC = L // CHUNK
NBF = L // BLK

rng = np.random.RandomState(0)
x_h = rng.randint(-3000, 3000, size=(B, L)).astype(np.int16)
samples = jax.device_put(x_h)
alpha = jax.device_put(np.full((B,), 1e-3, np.float32))
beta = jax.device_put(np.full((B,), 1e-5, np.float32))


def cheb_coeffs(degree, halfwidth):
    from numpy.polynomial import chebyshev as Ch
    Kk = tables.smoothing_kernel_iterated()
    Sp = np.concatenate([[0.0], np.cumsum(Kk)])
    half = (len(Kk) - 1) // 2
    def T(m):
        return Sp[np.clip(np.asarray(m, int) + half + 1, 0, len(Kk))]
    m_pos = np.arange(0, halfwidth + 1)
    t = (2.0 * m_pos - halfwidth) / halfwidth
    return tuple(float(v) for v in Ch.chebfit(t, T(m_pos), degree))


def reduce_mats():
    alt = np.zeros(BLK); alt[0::2] = 1.0; alt[1::2] = -1.0
    Rz = np.zeros((BLK, 8)); Rz[:, 0] = 1.0; Rz[:, 1] = alt
    Rzz = np.zeros((BLK, 8)); Rzz[:, 2] = 1.0
    Rw = np.zeros((BLK, 8)); Rw[:, 6] = 1.0
    Rn = np.zeros((BLK, 8)); Rn[:, 7] = 1.0
    altK = alt[:K]
    Rd = np.zeros((K, 8)); Rd[:, 3] = 1.0; Rd[:, 5] = altK
    Rd2 = np.zeros((K, 8)); Rd2[:, 4] = 1.0
    return [jnp.asarray(m, jnp.float32) for m in (Rz, Rzz, Rw, Rn, Rd, Rd2)]


def make_proto(cheb, hw):
    def kern(ab_ref, x_ref, halo_ref, warm_ref, conv_ref,
             rz_ref, rzz_ref, rw_ref, rn_ref, rd_ref, rd2_ref, out_ref):
        j = pl.program_id(1)
        xb = x_ref[0].astype(jnp.float32)

        m = 1000.0 - jnp.abs(xb + 1.0)
        neg = m < 0
        mf = jnp.where(neg, -m - 1.0, m)
        t = jnp.clip((2.0 * mf - hw) / hw, -1.0, 1.0)
        b1 = jnp.zeros_like(t)
        b2 = jnp.zeros_like(t)
        for ck in cheb[:0:-1]:
            b1, b2 = ck + 2.0 * t * b1 - b2, b1
        val = cheb[0] + t * b1 - b2
        val = jnp.where(mf >= hw, 1.0, val)
        w = jnp.where(neg, 1.0 - val, val)

        al = ab_ref[0, 0, 0]
        be = ab_ref[0, 0, 1]
        xn = xb * al + be
        halo_raw = halo_ref[0, 0, :, :K].astype(jnp.float32)
        raw_hist = (j > 0) | (ab_ref[0, 0, 2] != 0.0)
        halo_tail = jnp.where(raw_hist, halo_raw * al + be,
                              jnp.zeros_like(halo_raw))
        nblk = xb.shape[0]
        tails = pltpu.roll(xn[:, BLK - K:], shift=1, axis=0)
        rowK = jax.lax.broadcasted_iota(jnp.int32, (nblk, K), 0)
        prev_tail = jnp.where(rowK == 0,
                              jnp.broadcast_to(halo_tail, (nblk, K)), tails)
        ext = jnp.concatenate([prev_tail, xn], axis=1)

        hp = jax.lax.Precision.HIGHEST
        z = jnp.dot(ext, conv_ref[:, :], preferred_element_type=jnp.float32,
                    precision=hp)
        hist = ext[:, :K]
        zh = z[:, :K]
        delta = jax.lax.dot_general(
            hist, warm_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        nzf = jnp.where(xb != 0.0, 1.0, 0.0)
        dotf = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                                 precision=hp)
        out = (dotf(z, rz_ref[:, :])
               + dotf(z * z, rzz_ref[:, :])
               + dotf(w, rw_ref[:, :])
               + dotf(nzf, rn_ref[:, :])
               + dotf(delta, rd_ref[:, :])
               + dotf(2.0 * zh * delta + delta * delta, rd2_ref[:, :]))
        out_ref[0, 0] = out
    return kern


def proto_call(x, cheb, hw):
    hv = jnp.zeros((B,), jnp.float32)
    ab = jnp.stack([alpha, beta, hv, hv], axis=1)[:, None, :]
    tails = x.reshape(B, NC, CHUNK)[:, :, CHUNK - K:]
    first = jnp.zeros((B, K), jnp.int16)
    halo = jnp.concatenate([first[:, None, :], tails[:, :NC - 1]], axis=1)
    halo = jnp.pad(halo, ((0, 0), (0, 0), (0, 128 - K)))[:, :, None, :]
    warm = jnp.asarray(tables.fir_warmup_correction()[0], jnp.float32)
    conv = jnp.asarray(tables.conv_band_matrices(), jnp.float32)
    mats = reduce_mats()
    out = pl.pallas_call(
        make_proto(cheb, hw),
        grid=(B, NC),
        in_specs=[
            pl.BlockSpec((1, 1, 4), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NBLK, BLK), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK + K, BLK), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 8), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, NBLK, 8), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NC, NBLK, 8), jnp.float32),
    )(ab, x.reshape(B, NC * NBLK, BLK), halo, warm, conv, *mats)
    return out  # [B, NC, NBLK, 8]


def bench(fn, R1=4, R2=24):
    @functools.partial(jax.jit, static_argnames="R")
    def rep(xx, R):
        def body(i, acc):
            o = fn(xx + (i % 3).astype(jnp.int16))
            return acc + jnp.sum(jax.tree_util.tree_leaves(o)[0][..., :1].astype(jnp.float32))
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
    float(rep(samples, R1)); float(rep(samples, R2))
    def t(R):
        t0 = time.time()
        for _ in range(3):
            float(rep(samples, R))
        return (time.time() - t0) / 3
    return (t(R2) - t(R1)) / 20


A0, _, c18 = tables.amplitude_cdf_poly()
CH18 = tuple(float(v) for v in c18)
CH14 = cheb_coeffs(14, 128)

t0 = bench(lambda x: fused_stats_call(x, alpha, beta))
print(f"shipped kernel            {t0*1000:8.3f} ms", flush=True)
t1 = bench(lambda x: proto_call(x, CH18, float(A0)))
print(f"proto matred (cheb18/200) {t1*1000:8.3f} ms", flush=True)
t2 = bench(lambda x: proto_call(x, CH14, 128.0))
print(f"proto matred (cheb14/128) {t2*1000:8.3f} ms", flush=True)

# numerics: compare proto stats against the shipped kernel
wsum0, rownz0, en0 = fused_stats_call(samples, alpha, beta)
o = np.asarray(proto_call(samples, CH18, float(A0)))
s1 = o[..., 0].reshape(B, NBF); sa = o[..., 1].reshape(B, NBF)
s2 = o[..., 2].reshape(B, NBF); d1 = o[..., 3].reshape(B, NBF)
d2 = o[..., 4].reshape(B, NBF); da = o[..., 5].reshape(B, NBF)
wsum = o[..., 6].reshape(B, NBF); nzc = o[..., 7].reshape(B, NBF)
NW = NBF - 1
en = 256.0 * (s2[:, :NW] + s2[:, 1:] + d2[:, :NW]) + (
    (s1[:, :NW] + s1[:, 1:] + d1[:, :NW]) ** 2
    + (sa[:, :NW] + sa[:, 1:] + da[:, :NW]) ** 2) / 2.0
en0 = np.asarray(en0)[:, 0]
rel = np.abs(en - en0) / (np.abs(en0) + 1e-6)
print("energy maxrel vs shipped:", float(rel.max()))
print("wsum maxdiff:", float(np.abs(np.asarray(wsum0) - wsum).max()))
print("rownz agree:", bool(((np.asarray(rownz0) > 0) == (nzc > 0)).all()))
