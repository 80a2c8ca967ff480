import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time
from bliss_tpu.features import PCMBatch
from bliss_tpu.features.amplitude import amplitude_scores
from bliss_tpu.features.frequency import frequency_scores
from bliss_tpu.config import AnalysisConfig

B, L = 64, 491520
rng = np.random.RandomState(0)
samples = rng.randint(-3000, 3000, size=(B, L)).astype(np.int16)
batch = PCMBatch(jax.device_put(jnp.asarray(samples)),
                 jax.device_put(jnp.full((B,), L-1000, jnp.int32)),
                 jax.device_put(jnp.full((B,), 11, jnp.int32)))
cfg = AnalysisConfig(dtype='float32', amplitude_mode='poly')

def bench(name, fn):
    j = jax.jit(fn)
    t0=time.time()
    r = j(batch); _=float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    tc=time.time()-t0
    K=16
    t0=time.time()
    outs=[j(batch) for _ in range(K)]
    _=[float(jnp.sum(jax.tree_util.tree_leaves(o)[0])) for o in outs]
    dt=(time.time()-t0)/K
    print(f'{name:28s} compile {tc:6.1f}s  {dt*1000:8.2f} ms', flush=True)

bench('amplitude-poly', lambda b: amplitude_scores(b, cfg))
bench('frequency', lambda b: frequency_scores(b, cfg))
