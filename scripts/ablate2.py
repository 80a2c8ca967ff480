import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time
from bliss_tpu.features import PCMBatch
from bliss_tpu.features.analyze import analyze_batch
from bliss_tpu.config import AnalysisConfig

cfg = AnalysisConfig(dtype='float32', amplitude_mode='poly')

tiny = jax.device_put(jnp.ones((8, 128), jnp.float32))
jt = jax.jit(lambda x: jnp.sum(x * 1.0001))
float(jt(tiny))
K = 32
t0 = time.time()
outs = [jt(tiny) for _ in range(K)]
_ = [float(o) for o in outs]
print(f'tiny-op dispatch: {(time.time()-t0)/K*1000:.2f} ms/call', flush=True)

for B in (64, 256):
    L = 491520
    rng = np.random.RandomState(0)
    samples = rng.randint(-3000, 3000, size=(B, L)).astype(np.int16)
    batch = PCMBatch(jax.device_put(jnp.asarray(samples)),
                     jax.device_put(jnp.full((B,), L-1000, jnp.int32)),
                     jax.device_put(jnp.full((B,), 11, jnp.int32)))
    j = jax.jit(lambda b: jnp.sum(analyze_batch(b, cfg)))
    t0=time.time(); float(j(batch)); print(f'B={B} compile {time.time()-t0:.1f}s', flush=True)
    K = 16
    t0 = time.time()
    outs = [j(batch) for _ in range(K)]
    _ = [float(o) for o in outs]
    dt = (time.time()-t0)/K
    print(f'B={B}: {dt*1000:.2f} ms/batch  {B/dt:.0f} songs/s', flush=True)
