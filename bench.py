#!/usr/bin/env python
"""Benchmark: batched song analysis throughput on one TPU chip vs the
reference C library on one host CPU core.

Prints ONE JSON line:
  {"metric": "songs analyzed/sec/chip (PCM->features, 11s songs)",
   "value": <tpu songs/s>, "unit": "songs/s", "vs_baseline": <ratio>, ...}

Method
- TPU side: the full float32 production program (fused Pallas kernels,
  Parseval tempo energies, double-single beat-exact envelope finish) over
  device-resident batches of the reference's own 11-second fixture
  (distinct per-song content via rolls). The analysis is repeated R times
  INSIDE one jitted program (fori_loop with a per-iteration input
  perturbation to defeat CSE); timing the difference between R2 and R1
  repeats removes the fixed per-dispatch cost of this sandbox's remote-TPU
  tunnel (~28 ms/call, measured — it would swamp the sub-ms per-batch
  compute otherwise). A correctness probe separately checks fetched feature
  vectors against the reference golden values.
- Baseline: baseline/bench_ref (the reference built from source against a
  validated FFT shim) looping its three analyzers over the same decoded PCM
  (analysis-only, matching the TPU measurement's scope). The result is
  cached in baseline/BASELINE_CPU.json; delete that file to re-measure.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
FIXTURE = "/root/reference/audio/song.flac"
CACHE = os.path.join(REPO, "baseline", "BASELINE_CPU.json")

GOLDEN = [-8.945454, -10.641844, -10.136086, -15.560563]


def measure_baseline() -> dict:
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)
    build = os.path.join(REPO, "baseline", "build")
    bench = os.path.join(build, "bench_ref")
    if not os.path.exists(bench):
        subprocess.run(
            ["bash", os.path.join(REPO, "baseline", "build_baseline.sh")],
            check=True,
            capture_output=True,
        )
    env = dict(
        os.environ,
        LD_LIBRARY_PATH=f"{build}:{os.path.join(REPO, 'baseline', 'fftw_shim', 'lib')}",
    )
    out = subprocess.run(
        [bench, FIXTURE, "40", "analysis"],
        check=True,
        capture_output=True,
        text=True,
        env=env,
    ).stdout
    analysis = json.loads(out.strip().splitlines()[-1])
    out = subprocess.run(
        [bench, FIXTURE, "30", "e2e"],
        check=True,
        capture_output=True,
        text=True,
        env=env,
    ).stdout
    e2e = json.loads(out.strip().splitlines()[-1])
    result = {
        "cpu_analysis_songs_per_sec": analysis["songs_per_sec"],
        "cpu_e2e_songs_per_sec": e2e["songs_per_sec"],
        "host": "1-core sandbox host (nproc=1)",
        "note": "reference built from /root/reference with radix-2 fftw shim;"
        " its golden tests pass under this build",
    }
    with open(CACHE, "w") as f:
        json.dump(result, f, indent=1)
    return result


def main() -> None:
    baseline = measure_baseline()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bliss_tpu.config import AnalysisConfig
    from bliss_tpu.features import PCMBatch, analyze_batch
    from bliss_tpu.io import decode

    d = decode(FIXTURE)
    B = int(os.environ.get("BENCH_B", 128))
    base = np.asarray(d.samples)
    arrays = [np.roll(base, 1013 * i) for i in range(B)]
    host_batch = PCMBatch.from_arrays(arrays, [d.duration] * B)
    batch = PCMBatch(*(jax.device_put(x) for x in host_batch))

    # Production mode: fused kernels + the beat-exact double-single device
    # finish (round 3) — the headline number now carries EXACT tempo.
    cfg = AnalysisConfig.for_tpu()

    import functools

    feats_fn = jax.jit(lambda b: analyze_batch(b, cfg))

    @functools.partial(jax.jit, static_argnames="reps")
    def repeated(b, reps):
        # Repeat the full analysis on (perturbed) input inside one program:
        # amortizes the sandbox tunnel's fixed dispatch cost out of the
        # measurement. The perturbation (one int16 add) defeats CSE.
        def body(i, acc):
            nb = PCMBatch(
                b.samples + (i % 3).astype(jnp.int16), b.n_samples, b.durations
            )
            return acc + jnp.sum(analyze_batch(nb, cfg))

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    # --- correctness gates --------------------------------------------------
    # production path (device_exact): the FULL 4-vector including tempo must
    # match the goldens — the double-single finish is beat-exact, so tempo
    # is gated at reference epsilon (1e-5), not a loose float32 bound.
    feats = np.asarray(feats_fn(batch))
    err = np.abs(feats[0] - np.array(GOLDEN))
    device_ok = bool(err[0] < 1e-5 and err[1:].max() < 5e-4)

    # legacy hybrid path (host float64 finish): cross-validates the device
    # finish and measures the fetch-bound mode
    from bliss_tpu.features.analyze import _device_stage_packed, _unpack_stage
    from bliss_tpu.features.tempo import envelope_finish_host

    cfg_h = AnalysisConfig.for_tpu_hybrid()
    n_host = np.asarray(batch.n_samples)  # hoisted: device-resident in this
    d_host = np.asarray(batch.durations)  # bench, ~28 ms tunnel RTT each

    def hybrid_batch(b):
        packed = np.asarray(_device_stage_packed(b, cfg_h))
        amp, freq, fa, _ = _unpack_stage(packed, cfg_h, b.samples.shape[1])
        t, a = envelope_finish_host(fa, n_host, d_host)
        return np.stack([t, amp, freq, a], axis=1)

    hfeats = hybrid_batch(batch)  # also compiles the hybrid device stage
    herr = np.abs(hfeats[0] - np.array(GOLDEN))
    hybrid_ok = bool(herr[0] < 1e-5 and herr[1:].max() < 5e-4)
    correctness_ok = device_ok and hybrid_ok
    if not correctness_ok:
        print(
            f"WARNING: correctness gate failed: device {feats[0]} / "
            f"hybrid {hfeats[0]} vs {GOLDEN}",
            file=sys.stderr,
        )

    # --- scope 1: device-resident analysis throughput (fused kernels) ------
    # min-of-trials: the tunnel/device occasionally has multi-ms hiccups
    # that would bias a mean upward by 10-20% run to run
    R1, R2, TRIALS = 4, 28, 5
    float(repeated(batch, R1))  # compile
    float(repeated(batch, R2))

    def timed(reps):
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.time()
            float(repeated(batch, reps))
            best = min(best, time.time() - t0)
        return best

    per_batch = (timed(R2) - timed(R1)) / (R2 - R1)
    tpu_songs_per_sec = B / per_batch

    # --- scope 2: production hybrid mode incl. host float64 finish ----------
    # (wall-clock per batch: device stage dispatch + fetch + vectorized host
    # finish; includes this sandbox's ~28 ms tunnel round-trips, so it is a
    # LOWER bound for a real TPU-VM host)
    hybrid_batch(batch)  # warm
    t0 = time.time()
    H = 4
    for _ in range(H):
        hybrid_batch(batch)
    hybrid_per_batch = (time.time() - t0) / H
    hybrid_songs_per_sec = B / hybrid_per_batch

    # --- scope 3: end-to-end 10k-song library scan (decode -> features) -----
    # The north star workload (BASELINE.md): batch analysis of a 10k-song
    # library. Synthetic distinct 11 s FLACs (scripts/gen_library.py; cached
    # across runs), fresh feature store each run, per-stage breakdown from
    # ScanResult.stats. BENCH_E2E_SONGS overrides the count.
    import tempfile

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from gen_library import make_library

    from bliss_tpu.pipeline import analyze_library
    from bliss_tpu.store import FeatureStore

    n_e2e = int(os.environ.get("BENCH_E2E_SONGS", 10000))
    lib_dir = os.environ.get("BENCH_E2E_DIR", "/tmp/bliss_e2e_lib")
    t0 = time.time()
    files = make_library(lib_dir, n_e2e, seconds=11, seed=0)
    gen_s = time.time() - t0
    # warm the bucket's compiled shape with a tiny scan first
    analyze_library(files[:4], cfg=cfg, batch_size=128)
    with tempfile.TemporaryDirectory() as sd:
        t0 = time.time()
        r = analyze_library(
            files, cfg=cfg, batch_size=128, store=FeatureStore(sd)
        )
        e2e_s = time.time() - t0
        assert r.ok.all(), "e2e scan had failures"
        # warm re-scan: every song already in the store, so the scan is
        # pure fingerprint+lookup (no decode, no device) — the daily
        # "re-scan my library" workload the reference GUI re-pays in full
        t0 = time.time()
        r2 = analyze_library(
            files, cfg=cfg, batch_size=128, store=FeatureStore(sd)
        )
        warm_s = time.time() - t0
        assert r2.ok.all() and r2.stats.get("decoded", 0) == 0, (
            "warm re-scan should decode nothing"
        )
    e2e_songs_per_sec = len(files) / e2e_s
    warm_songs_per_sec = len(files) / warm_s

    # Stage breakdown + a measured model of real-host throughput. On this
    # sandbox (1 core, tunneled TPU) e2e is upload/decode-bound; the model
    # projects songs/s for a TPU-VM host with C decode cores feeding the
    # same measured device rate.
    st = r.stats
    stage_s = {
        k: st[k]["seconds"]
        for k in (
            "fingerprint", "pad", "device_dispatch", "device_finalize",
            "store_flush",
        )
        if k in st
    }
    stage_s["scan_total"] = st.get("scan", {}).get("seconds", e2e_s)
    decode_core_s = st.get("decode_core_seconds", 0.0)
    decode_s_per_song = decode_core_s / max(st.get("decoded", 1), 1)
    device_songs_per_sec = tpu_songs_per_sec
    e2e_breakdown = {
        "songs": len(files),
        "gen_seconds": round(gen_s, 1),
        "elapsed_seconds": round(e2e_s, 1),
        "decode_core_seconds": round(decode_core_s, 1),
        "decode_s_per_song_per_core": round(decode_s_per_song, 4),
        "stage_seconds": {k: round(v, 1) for k, v in stage_s.items()},
        # real-host projection: decode scales with cores; the device rate
        # is the measured device-resident throughput on this chip
        "projected_songs_per_sec_at_cores": {
            str(c): round(
                min(c / max(decode_s_per_song, 1e-9), device_songs_per_sec), 1
            )
            for c in (8, 32, 96)
        },
    }

    # --- kernel smoke matrix (real-device Mosaic regression gate) -----------
    # CPU CI runs the Pallas kernels interpreted, which skips tile-shape
    # validation; this compiles every kernel configuration on the actual
    # backend (scripts/kernel_smoke.py). BENCH_KERNELS=0 skips.
    kernels = {"ok": None, "results": {}}
    if os.environ.get("BENCH_KERNELS", "1") != "0":
        from kernel_smoke import run_smoke

        kernels = run_smoke(
            time_budget_s=float(os.environ.get("BENCH_KERNELS_BUDGET", 1200))
        )

    # --- differential fuzz net (real-device numerics gate) ------------------
    # 16 random songs vs the reference binary ON THIS BACKEND: the golden
    # gates above only cover the two fixture songs, and CPU-backend fuzzing
    # computes every f32 dot at full precision, so it cannot catch TPU
    # default-precision regressions (this net found the warm-up-delta
    # ±1-beat flips). Error-tolerant: a flaky tunnel or missing baseline
    # build reports "error: ..." instead of failing the bench. BENCH_FUZZ=0
    # skips.
    fuzz = None
    if os.environ.get("BENCH_FUZZ", "1") != "0":
        try:
            from fuzz_differential import run_batched_device_fuzz

            fuzz = run_batched_device_fuzz(
                n_cases=int(os.environ.get("BENCH_FUZZ_CASES", 16)),
                verbose=False,
            )
            if fuzz["divergent"]:
                correctness_ok = False
                print(
                    f"WARNING: device fuzz divergent: {fuzz}",
                    file=sys.stderr,
                )
        except Exception as e:  # the bench number must survive fuzz infra
            fuzz = {"error": f"{type(e).__name__}: {e}"}
            print(f"WARNING: device fuzz errored: {e}", file=sys.stderr)

    vs = tpu_songs_per_sec / baseline["cpu_analysis_songs_per_sec"]
    print(
        json.dumps(
            {
                "metric": "songs analyzed/sec/chip (PCM->features, 11s songs)",
                "value": round(tpu_songs_per_sec, 1) if correctness_ok else 0.0,
                "unit": "songs/s",
                "vs_baseline": round(vs, 1) if correctness_ok else 0.0,
                "baseline_cpu_songs_per_sec": baseline[
                    "cpu_analysis_songs_per_sec"
                ],
                "batch": B,
                "ms_per_batch": round(per_batch * 1000, 2),
                "hybrid_songs_per_sec": round(hybrid_songs_per_sec, 1),
                "hybrid_ms_per_batch": round(hybrid_per_batch * 1000, 2),
                "e2e_songs_per_sec": round(e2e_songs_per_sec, 1),
                "e2e_vs_baseline": round(
                    e2e_songs_per_sec / baseline["cpu_e2e_songs_per_sec"], 1
                ),
                "warm_rescan_songs_per_sec": round(warm_songs_per_sec, 1),
                "e2e": e2e_breakdown,
                "kernels_ok": kernels["ok"],
                "kernel_smoke": kernels["results"],
                "device_fuzz": fuzz,
                "device": str(jax.devices()[0]),
                "tempo_err_device_exact": float(err[0]),
                "max_feature_err_vs_golden": float(err[1:].max()),
                "tempo_err_hybrid": float(herr[0]),
                "max_feature_err_hybrid": float(herr.max()),
                "correctness_ok": correctness_ok,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
