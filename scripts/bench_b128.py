import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time, functools
from bliss_tpu.features import PCMBatch
from bliss_tpu.features.analyze import analyze_batch
from bliss_tpu.config import AnalysisConfig
from bliss_tpu.io import decode

d = decode('/root/reference/audio/song.flac')
base = np.asarray(d.samples)
cfg = AnalysisConfig(dtype='float32', amplitude_mode='poly', fused_kernel=True)
for B in (128, 192):
    arrays = [np.roll(base, 1013*i) for i in range(B)]
    hb = PCMBatch.from_arrays(arrays, [11]*B)
    batch = PCMBatch(*(jax.device_put(x) for x in hb))
    @functools.partial(jax.jit, static_argnames='R')
    def rep(b, R):
        def body(i, acc):
            nb = PCMBatch(b.samples + (i%3).astype(jnp.int16), b.n_samples, b.durations)
            return acc + jnp.sum(analyze_batch(nb, cfg))
        return jax.lax.fori_loop(0, R, body, jnp.float32(0))
    float(rep(batch,4)); float(rep(batch,16))
    def t(R):
        t0=time.time()
        for _ in range(3): float(rep(batch,R))
        return (time.time()-t0)/3
    per=(t(16)-t(4))/12
    print(f'B={B}: {per*1000:.2f} ms/batch {B/per:.0f} songs/s', flush=True)
