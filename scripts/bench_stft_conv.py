#!/usr/bin/env python
"""Measure the single-pass kernel's precise-vs-fast STFT cost on device.

Times the full production program (for_tpu) with stft_conv in
{precise, fast} using bench.py's repeated-fori method (amortizes the
sandbox tunnel dispatch). Prints one JSON line.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bliss_tpu.config import AnalysisConfig
from bliss_tpu.features import PCMBatch, analyze_batch
from bliss_tpu.io import decode


def main():
    d = decode("/root/reference/audio/song.flac")
    B = int(os.environ.get("BENCH_B", 128))
    base = np.asarray(d.samples)
    arrays = [np.roll(base, 1013 * i) for i in range(B)]
    batch = PCMBatch(
        *(jax.device_put(x) for x in PCMBatch.from_arrays(arrays, [d.duration] * B))
    )

    results = {}
    for mode in ("precise", "fast"):
        for sp in (True, False):
            cfg = dataclasses_replace(AnalysisConfig.for_tpu(), mode, sp)

            @functools.partial(jax.jit, static_argnames="reps")
            def repeated(b, reps, cfg=cfg):
                def body(i, acc):
                    nb = PCMBatch(
                        b.samples + (i % 3).astype(jnp.int16),
                        b.n_samples,
                        b.durations,
                    )
                    return acc + jnp.sum(analyze_batch(nb, cfg))

                return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

            R1, R2, TRIALS = 4, 28, 5
            float(repeated(batch, R1))
            float(repeated(batch, R2))

            def timed(reps):
                best = float("inf")
                for _ in range(TRIALS):
                    t0 = time.time()
                    float(repeated(batch, reps))
                    best = min(best, time.time() - t0)
                return best

            per_batch = (timed(R2) - timed(R1)) / (R2 - R1)
            key = f"{mode}{'-single_pass' if sp else '-two_kernel'}"
            results[key] = {
                "ms_per_batch": round(per_batch * 1000, 3),
                "songs_per_sec": round(B / per_batch, 1),
            }
    print(json.dumps({"batch": B, "device": str(jax.devices()[0]), **results}))


def dataclasses_replace(cfg, mode, single_pass):
    import dataclasses

    return dataclasses.replace(cfg, stft_conv=mode, single_pass=single_pass)


if __name__ == "__main__":
    main()
