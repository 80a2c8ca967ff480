import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time, functools
from bliss_tpu.features import PCMBatch
from bliss_tpu.features.analyze import analyze_batch
from bliss_tpu.config import AnalysisConfig
from bliss_tpu.io import decode

d = decode('/root/reference/audio/song.flac')
B = 64
base = np.asarray(d.samples)
arrays = [np.roll(base, 1013*i) for i in range(B)]
L = ((max(a.shape[0] for a in arrays)+1023)//1024)*1024
samples = np.zeros((B, L), np.int16)
for i,a in enumerate(arrays): samples[i,:a.shape[0]] = a
batch = PCMBatch(jax.device_put(jnp.asarray(samples)),
                 jax.device_put(jnp.full((B,), base.shape[0], jnp.int32)),
                 jax.device_put(jnp.full((B,), 11, jnp.int32)))
golden = np.array([-8.945454,-10.641844,-10.136086,-15.560563])

for tag, cfg in [('xla', AnalysisConfig(dtype='float32', amplitude_mode='poly')),
                 ('fused', AnalysisConfig(dtype='float32', amplitude_mode='poly', fused_kernel=True))]:
    j1 = jax.jit(functools.partial(analyze_batch, cfg=cfg))
    feats = np.asarray(j1(batch))
    err = np.abs(feats[0]-golden)
    @functools.partial(jax.jit, static_argnames='R')
    def rep(b, R, c=cfg):
        def body(i, acc):
            nb = PCMBatch(b.samples + (i%3).astype(jnp.int16), b.n_samples, b.durations)
            return acc + jnp.sum(analyze_batch(nb, c))
        return jax.lax.fori_loop(0, R, body, jnp.float32(0))
    float(rep(batch,4)); float(rep(batch,20))
    def t(R):
        t0=time.time()
        for _ in range(3): float(rep(batch,R))
        return (time.time()-t0)/3
    per=(t(20)-t(4))/16
    print(f'{tag:6s}: {per*1000:6.2f} ms/batch {B/per:7.0f} songs/s  err(amp,freq,atk)={err[1]:.1e},{err[2]:.1e},{err[3]:.1e} tempo_err={err[0]:.2f}', flush=True)
