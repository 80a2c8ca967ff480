"""Conv-precision ablation of the FIR matmul (conv_mode="exact" —
the shipped default is the bf16-split, which ignores conv_precision)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, time
import jax, jax.numpy as jnp, numpy as np
from bliss_tpu.kernels.fused_stats import fused_stats_call

B, L = 128, 491520
rng = np.random.RandomState(0)
samples = jax.device_put(rng.randint(-3000, 3000, size=(B, L)).astype(np.int16))
alpha = jax.device_put(np.full((B,), 1e-3, np.float32))
beta = jax.device_put(np.full((B,), 1e-5, np.float32))

def bench(prec):
    @functools.partial(jax.jit, static_argnames="R")
    def rep(xx, R):
        def body(i, acc):
            _, _, en = fused_stats_call(xx + (i % 3).astype(jnp.int16), alpha, beta, conv_precision=prec, conv_mode="exact")
            return acc + jnp.sum(en[:, :, :1])
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
    float(rep(samples, 4)); float(rep(samples, 24))
    def t(R):
        t0 = time.time()
        for _ in range(3): float(rep(samples, R))
        return (time.time()-t0)/3
    return (t(24)-t(4))/20

for name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                   ("DEFAULT", jax.lax.Precision.DEFAULT)):
    print(f"{name:8s} {bench(prec)*1000:7.3f} ms", flush=True)
_, _, eh = fused_stats_call(samples, alpha, beta, conv_precision=jax.lax.Precision.HIGHEST, conv_mode="exact")
_, _, ed = fused_stats_call(samples, alpha, beta, conv_precision=jax.lax.Precision.DEFAULT, conv_mode="exact")
eh, ed = np.asarray(eh), np.asarray(ed)
rel = np.abs(ed - eh) / (np.abs(eh) + 1e-6)
print("DEFAULT energy maxrel:", float(rel.max()), "median:", float(np.median(rel)))
