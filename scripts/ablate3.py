import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time, functools
from bliss_tpu.features import PCMBatch
from bliss_tpu.features.analyze import analyze_batch
from bliss_tpu.config import AnalysisConfig

cfg = AnalysisConfig(dtype='float32', amplitude_mode='poly')
B, L = 64, 491520
rng = np.random.RandomState(0)
samples = rng.randint(-3000, 3000, size=(B, L)).astype(np.int16)
batch = PCMBatch(jax.device_put(jnp.asarray(samples)),
                 jax.device_put(jnp.full((B,), L-1000, jnp.int32)),
                 jax.device_put(jnp.full((B,), 11, jnp.int32)))

@functools.partial(jax.jit, static_argnames='R')
def repeated(b, R):
    def body(i, acc):
        s = b.samples + (i % 3).astype(jnp.int16)
        nb = PCMBatch(s, b.n_samples, b.durations)
        return acc + jnp.sum(analyze_batch(nb, cfg))
    return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

for R in (4, 20):
    t0=time.time(); float(repeated(batch, R)); tc=time.time()-t0
    t0=time.time()
    for _ in range(3): float(repeated(batch, R))
    dt=(time.time()-t0)/3
    print(f'R={R:3d} compile {tc:5.1f}s total {dt*1000:8.1f} ms', flush=True)
# per-iteration from R=20 vs R=4 difference
