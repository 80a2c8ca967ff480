import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time, functools
from bliss_tpu.features import PCMBatch
from bliss_tpu.features.amplitude import amplitude_scores
from bliss_tpu.features.frequency import frequency_scores
from bliss_tpu.features.tempo import envelope_energies, envelope_scores
from bliss_tpu.config import AnalysisConfig

cfg = AnalysisConfig(dtype='float32', amplitude_mode='poly')
B, L = 64, 491520
rng = np.random.RandomState(0)
samples = rng.randint(-3000, 3000, size=(B, L)).astype(np.int16)
batch = PCMBatch(jax.device_put(jnp.asarray(samples)),
                 jax.device_put(jnp.full((B,), L-1000, jnp.int32)),
                 jax.device_put(jnp.full((B,), 11, jnp.int32)))

def loop_bench(name, fn, R1=4, R2=20):
    @functools.partial(jax.jit, static_argnames='R')
    def rep(b, R):
        def body(i, acc):
            nb = PCMBatch(b.samples + (i % 3).astype(jnp.int16), b.n_samples, b.durations)
            out = fn(nb)
            return acc + jnp.sum(jax.tree_util.tree_leaves(out)[0])
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
    float(rep(batch, R1)); float(rep(batch, R2))
    def t(R):
        t0=time.time()
        for _ in range(3): float(rep(batch, R))
        return (time.time()-t0)/3
    per = (t(R2)-t(R1))/(R2-R1)
    print(f'{name:22s} {per*1000:8.2f} ms/batch  {B/per:8.0f} songs/s', flush=True)

loop_bench('perturb-only', lambda b: jnp.sum(b.samples.astype(jnp.float32)))
loop_bench('amplitude-poly', lambda b: amplitude_scores(b, cfg))
loop_bench('frequency', lambda b: frequency_scores(b, cfg))
loop_bench('envelope_energies', lambda b: envelope_energies(b, cfg))
loop_bench('envelope_scores', lambda b: envelope_scores(b, cfg))
