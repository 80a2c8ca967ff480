"""Device-resident throughput of the EXTENDED analysis program.

Measures `analyze_batch_ext_jit` (core 4 columns + 45 ROADMAP columns in
one device program sharing a single band-energy pass) with the same
methodology as bench.py's headline stage: the whole analysis repeated
inside one jitted fori_loop on perturbed input (amortizing the ~28 ms
tunnel dispatch out of the measurement), min-of-trials, two repeat
counts differenced to cancel fixed costs. Prints ONE JSON line with the
extended songs/s and the measured overhead vs the core-only program.

Usage: python scripts/bench_extended_throughput.py [--batch 128]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

FIXTURE = "/root/reference/audio/song.flac"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from bliss_tpu.config import AnalysisConfig
    from bliss_tpu.features import PCMBatch, analyze_batch
    from bliss_tpu.features.analyze import analyze_batch_ext_jit
    from bliss_tpu.io import decode

    d = decode(FIXTURE)
    B = args.batch
    base = np.asarray(d.samples)
    arrays = [np.roll(base, 1013 * i) for i in range(B)]
    host_batch = PCMBatch.from_arrays(arrays, [d.duration] * B)
    batch = PCMBatch(*(jax.device_put(x) for x in host_batch))
    cfg = AnalysisConfig.for_tpu()

    def make_repeated(fn):
        @functools.partial(jax.jit, static_argnames="reps")
        def repeated(b, reps):
            def body(i, acc):
                nb = PCMBatch(
                    b.samples + (i % 3).astype(jnp.int16),
                    b.n_samples,
                    b.durations,
                )
                return acc + jnp.sum(fn(nb))

            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        return repeated

    def measure(repeated, r1=4, r2=28):
        float(repeated(batch, r1))  # compile
        float(repeated(batch, r2))

        def timed(reps):
            best = float("inf")
            for _ in range(args.trials):
                t0 = time.time()
                float(repeated(batch, reps))
                best = min(best, time.time() - t0)
            return best

        return (timed(r2) - timed(r1)) / (r2 - r1)

    core_s = measure(make_repeated(lambda b: analyze_batch(b, cfg)))
    ext_s = measure(make_repeated(lambda b: analyze_batch_ext_jit(b, cfg)))

    print(
        json.dumps(
            {
                "metric": "extended-program songs/sec/chip",
                "batch": B,
                "device": str(jax.devices()[0]),
                "core_songs_per_sec": round(B / core_s, 1),
                "extended_songs_per_sec": round(B / ext_s, 1),
                "core_ms_per_batch": round(core_s * 1000, 2),
                "extended_ms_per_batch": round(ext_s * 1000, 2),
                "extended_overhead_pct": round(
                    100.0 * (ext_s - core_s) / core_s, 1
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
