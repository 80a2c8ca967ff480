import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, time, functools
from bliss_tpu.kernels import fused_sample_stats

B, L = 64, 491520
rng = np.random.RandomState(0)
x = jax.device_put(jnp.asarray(rng.randint(-3000,3000,size=(B,L)).astype(np.int16)))
n = jax.device_put(jnp.full((B,), L-1000, jnp.int32))

for chunk in (32768, 122880, 245760, 491520):
    @functools.partial(jax.jit, static_argnames='R')
    def rep(xx, nn, R, c=chunk):
        def body(i, acc):
            a, e = fused_sample_stats(xx + (i%3).astype(jnp.int16), nn, chunk=c)
            return acc + jnp.sum(a) + jnp.sum(e)
        return jax.lax.fori_loop(0, R, body, jnp.float32(0))
    try:
        float(rep(x,n,4)); float(rep(x,n,16))
        def t(R):
            t0=time.time()
            for _ in range(3): float(rep(x,n,R))
            return (time.time()-t0)/3
        per=(t(16)-t(4))/12
        print(f'chunk={chunk:7d}: {per*1000:7.2f} ms/batch  {B/per:7.0f} songs/s', flush=True)
    except Exception as ex:
        print(f'chunk={chunk}: FAILED {type(ex).__name__} {str(ex)[:200]}', flush=True)
