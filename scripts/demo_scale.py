#!/usr/bin/env python
"""Scale demonstrations on one TPU chip (BASELINE.json configs 3-5):

1. whole-library pairwise similarity: 10k x 10k distance matrix + per-song
   top-k neighbors, on device
2. 100k-song k-means clustering (radio playlists)
3. end-to-end library scan: host decode (threaded) -> device analysis

Run: python scripts/demo_scale.py
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=5):
    """Times fn with warmup; syncs via a tiny on-device reduction so the
    sandbox's slow host tunnel stays out of the measurement."""
    red = jax.jit(lambda *a: sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(fn(*a))))
    float(red(*args))  # warmup/compile
    t0 = time.time()
    for _ in range(iters):
        r = red(*args)
    float(r)
    return (time.time() - t0) / iters, fn(*args)


def main():
    rng = np.random.RandomState(0)

    # --- 1: 10k x 10k distance matrix + top-k ------------------------------
    from bliss_tpu.sim import distance_matrix
    from bliss_tpu.parallel import analysis_mesh, sharded_distance_topk

    feats10k = jnp.asarray(rng.randn(10_000, 4).astype(np.float32) * 4)
    dt, D = timed(distance_matrix, feats10k)
    print(f"10k x 10k distance matrix: {dt*1000:.1f} ms "
          f"({1e8/dt/1e9:.2f}G pairs/s)")

    mesh = analysis_mesh(jax.device_count(), 1)
    dt, _ = timed(lambda f: sharded_distance_topk(f, mesh, k=100)[0], feats10k)
    print(f"10k-song top-100 neighbors (all songs): {dt*1000:.1f} ms")

    # --- 2: 100k-song k-means ----------------------------------------------
    from bliss_tpu.sim import kmeans

    feats100k = jnp.asarray(rng.randn(100_000, 4).astype(np.float32) * 4)
    dt, _ = timed(lambda f: kmeans(f, k=32, iters=50)[1], feats100k, iters=3)
    print(f"100k-song k-means (k=32, 50 iters): {dt*1000:.1f} ms")

    # --- 3: end-to-end library scan (decode on host -> device) -------------
    import shutil
    import tempfile

    from bliss_tpu.pipeline import analyze_library
    from bliss_tpu.config import AnalysisConfig

    n_songs = 384
    tmp = tempfile.mkdtemp(prefix="bliss_scale_")
    src = "/root/reference/audio/song.flac"
    files = []
    for i in range(n_songs):
        dst = os.path.join(tmp, f"song_{i:04d}.flac")
        os.link(src, dst) if hasattr(os, "link") else shutil.copy(src, dst)
        files.append(dst)
    cfg = AnalysisConfig.for_tpu()
    t0 = time.time()
    result = analyze_library(files, cfg=cfg, batch_size=64)
    dt = time.time() - t0
    ok = int(result.ok.sum())
    print(f"e2e library scan ({ok}/{n_songs} songs, decode+analyze): "
          f"{dt:.1f} s = {ok/dt:.1f} songs/s "
          f"[host decode is 1-core in this sandbox]")
    print("stage seconds:", {k: v["seconds"] for k, v in result.stats.items()
                             if isinstance(v, dict)})
    shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
