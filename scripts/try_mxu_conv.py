import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bliss_tpu import constants as C

BLK, K = 256, 16
CHUNK = 122880
NBLK = CHUNK // BLK

# banded conv matrix [BLK+K, BLK]
Tm = np.zeros((BLK+K, BLK), np.float32)
c = C.FIR_BANDPASS
for t in range(BLK):
    for m in range(17):
        Tm[K + t - m, t] = c[m]

def kern_vpu(x_ref, o_ref):
    xn = x_ref[0]
    tails = pltpu.roll(xn[:, BLK-K:], shift=1, axis=0)
    ext = jnp.concatenate([tails, xn], axis=1)
    z = jnp.zeros_like(xn)
    for m in range(17):
        z = z + float(c[m]) * ext[:, K-m:K-m+BLK]
    o_ref[0, 0] = jnp.stack([jnp.sum(z,1), jnp.sum(z*z,1)] + [jnp.sum(z,1)]*6)

def kern_mxu(x_ref, t_ref, o_ref):
    xn = x_ref[0]
    tails = pltpu.roll(xn[:, BLK-K:], shift=1, axis=0)
    ext = jnp.concatenate([tails, xn], axis=1)
    z = jnp.dot(ext, t_ref[:, :], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    o_ref[0, 0] = jnp.stack([jnp.sum(z,1), jnp.sum(z*z,1)] + [jnp.sum(z,1)]*6)

B, L = 64, 491520
rng = np.random.RandomState(0)
x = jax.device_put(jnp.asarray(rng.randn(B, L).astype(np.float32)))
NC = L // CHUNK

def build(kind):
    ins = [pl.BlockSpec((1, NBLK, BLK), lambda i,j: (i,j,0), memory_space=pltpu.VMEM)]
    args = [x.reshape(B, NC*NBLK, BLK)]
    kern = kern_vpu
    if kind=='mxu':
        ins.append(pl.BlockSpec((BLK+K, BLK), lambda i,j: (0,0), memory_space=pltpu.VMEM))
        args.append(jnp.asarray(Tm))
        kern = kern_mxu
    f = pl.pallas_call(kern, grid=(B, NC), in_specs=ins,
        out_specs=pl.BlockSpec((1,1,8,NBLK), lambda i,j: (i,j,0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NC, 8, NBLK), jnp.float32))
    return functools.partial(f, *args) if kind=='vpu' else (lambda: f(args[0], args[1]))

for kind in ('vpu','mxu'):
    ins2 = build(kind)
    @functools.partial(jax.jit, static_argnames='R')
    def rep(R, fn=ins2):
        def body(i, acc):
            return acc + jnp.sum(fn()[0,0,0,:])
        return jax.lax.fori_loop(0, R, body, jnp.float32(0))
    try:
        float(rep(4)); float(rep(16))
        def t(R):
            t0=time.time()
            for _ in range(3): float(rep(R))
            return (time.time()-t0)/3
        per=(t(16)-t(4))/12
        print(f'{kind}: {per*1000:.2f} ms/batch', flush=True)
    except Exception as e:
        print(kind, 'FAILED', type(e).__name__, str(e)[:300], flush=True)
