"""Stage-level timing of the fused analysis path on the real TPU (B=128).

Isolates each stage with the fori_loop+perturbation trick (see bench.py) so
the ~28 ms tunnel dispatch cost cancels out of the per-batch number.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from bliss_tpu.config import AnalysisConfig
from bliss_tpu.features import PCMBatch, analyze_batch
from bliss_tpu.features.tempo import envelope_scores_from_energies
from bliss_tpu.kernels import fused_sample_stats
from bliss_tpu.kernels.pallas_stft import stft_power, frequency_scores_fused

B = int(os.environ.get("B", 128))
L = 491520
cfg = AnalysisConfig(dtype="float32", amplitude_mode="poly", fused_kernel=True)

rng = np.random.RandomState(0)
samples = rng.randint(-3000, 3000, size=(B, L)).astype(np.int16)
batch = PCMBatch(
    jax.device_put(jnp.asarray(samples)),
    jax.device_put(jnp.full((B,), L - 1000, jnp.int32)),
    jax.device_put(jnp.full((B,), 11, jnp.int32)),
)


def loop_bench(name, fn, R1=4, R2=24):
    @functools.partial(jax.jit, static_argnames="R")
    def rep(b, R):
        def body(i, acc):
            nb = PCMBatch(
                b.samples + (i % 3).astype(jnp.int16), b.n_samples, b.durations
            )
            out = fn(nb)
            return acc + jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))

        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    float(rep(batch, R1))
    float(rep(batch, R2))

    def t(R):
        t0 = time.time()
        for _ in range(3):
            float(rep(batch, R))
        return (time.time() - t0) / 3

    per = (t(R2) - t(R1)) / (R2 - R1)
    print(f"{name:28s} {per*1000:8.3f} ms/batch  {B/per:9.0f} songs/s", flush=True)
    return per


loop_bench("perturb-only", lambda b: jnp.sum(b.samples.astype(jnp.float32)))
loop_bench("fused_sample_stats", lambda b: fused_sample_stats(b.samples, b.n_samples))
loop_bench("stft_power", lambda b: stft_power(b.samples, b.n_samples))
loop_bench("frequency_fused(total)", lambda b: frequency_scores_fused(b, cfg))


def env_finish(b):
    NBF = b.samples.shape[1] // 256
    fa = (b.samples[:, :NBF].astype(jnp.float32) ** 2)[:, None, :]
    return envelope_scores_from_energies(b, fa, cfg)


loop_bench("envelope_finish(device)", env_finish)
loop_bench("analyze_batch(full)", lambda b: analyze_batch(b, cfg))
