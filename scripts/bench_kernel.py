import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time, functools
from bliss_tpu.kernels import fused_sample_stats
from bliss_tpu.features import PCMBatch
from bliss_tpu.features.amplitude import amplitude_scores
from bliss_tpu.features.tempo import band_energies
from bliss_tpu.config import AnalysisConfig
from bliss_tpu import constants as C

B, L = 64, 491520
rng = np.random.RandomState(0)
samples = rng.randint(-3000, 3000, size=(B, L)).astype(np.int16)
x = jax.device_put(jnp.asarray(samples))
n = jax.device_put(jnp.full((B,), L-1000, jnp.int32))

# correctness on device
amp_i, en = fused_sample_stats(x, n)
batch = PCMBatch(x, n, jax.device_put(jnp.full((B,), 11, jnp.int32)))
cfg = AnalysisConfig(dtype='float32', amplitude_mode='poly')
amp_ref = np.asarray(amplitude_scores(batch, cfg))
amp_k = np.float32(C.AMPLITUDE_SCALE)*np.asarray(amp_i) + np.float32(C.AMPLITUDE_BIAS)
print('amp max diff:', np.abs(amp_k-amp_ref).max(), flush=True)
fa_ref = np.asarray(band_energies(batch, cfg))[:,0]
NW = en.shape[1]
trunc = (L-1000) - (L-1000)%512; nwin = -(-(trunc-512)//256)
wm = np.arange(NW)[None,:] < nwin
fa_k = np.asarray(en)*wm
rel = np.abs(fa_k - fa_ref[:, :NW])/ (np.abs(fa_ref[:, :NW])+1e-3)
print('energy rel err:', rel.max(), flush=True)

@functools.partial(jax.jit, static_argnames='R')
def rep(xx, nn, R):
    def body(i, acc):
        a, e = fused_sample_stats(xx + (i%3).astype(jnp.int16), nn)
        return acc + jnp.sum(a) + jnp.sum(e)
    return jax.lax.fori_loop(0, R, body, jnp.float32(0))

float(rep(x, n, 4)); float(rep(x, n, 20))
def t(R):
    t0=time.time()
    for _ in range(3): float(rep(x, n, R))
    return (time.time()-t0)/3
per = (t(20)-t(4))/16
print(f'fused kernel: {per*1000:.2f} ms/batch  {B/per:.0f} songs/s (amp+tempo energies)', flush=True)
