"""Similarity-workload throughput on the device: full-library k-NN.

The `store neighbors` / `store dupes` / playlist workloads reduce to an
all-pairs blocked distance + top-k (`sim.distance.nearest_neighbors_all`:
[block, N] MXU matmul + device top-k per block). This measures that path
end-to-end at library scale — the N x N compute a 100k-song library pays
on every `store dupes` — and prints ONE JSON line.

Usage: python scripts/bench_similarity.py [--n 100000] [--dim 4] [--k 5]
           [--block 4096] [--platform tpu|cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=4,
                    help="4 = core vectors; 49 = core+extended")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--block", type=int, default=4096)
    ap.add_argument("--platform", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bliss_tpu.sim.distance import nearest_neighbors_all

    rng = np.random.RandomState(0)
    feats = jax.device_put(
        jnp.asarray(rng.randn(args.n, args.dim).astype(np.float32) * 3)
    )

    # compile + warm
    d, idx = nearest_neighbors_all(feats, k=args.k, block=args.block)
    np.asarray(d)

    best = float("inf")
    for _ in range(args.trials):
        t0 = time.time()
        d, idx = nearest_neighbors_all(feats, k=args.k, block=args.block)
        np.asarray(d)  # fetch = sync
        best = min(best, time.time() - t0)

    # spot-check one row against brute force on host
    f = np.asarray(feats)
    brute = np.sqrt(((f - f[0]) ** 2).sum(1))
    brute[0] = np.inf
    ok = bool(
        np.allclose(np.sort(brute)[: args.k], np.asarray(d)[0],
                    rtol=1e-3, atol=1e-3)
    )

    print(
        json.dumps(
            {
                "metric": "full-library k-NN (store dupes/neighbors path)",
                "n": args.n,
                "dim": args.dim,
                "k": args.k,
                "block": args.block,
                "device": str(jax.devices()[0]),
                "seconds": round(best, 3),
                "pairs_per_sec": round(args.n * args.n / best),
                "correct_row0": ok,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
