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

Flake hardening (round 4): the sandbox's remote-TPU tunnel has recurring
multi-minute UNAVAILABLE windows (round 3's driver capture died at the
first device_put). Every device-touching stage therefore runs under
retry-with-backoff (`_retry`); if backend init itself is poisoned for the
process, the bench re-execs itself (bounded) and resumes from a per-stage
checkpoint file; and the JSON line is ALWAYS printed — failed stages
degrade to marked fields ("device": "unavailable", "value": 0.0,
"errors": {...}) instead of a traceback. Exit code is 0 whenever the JSON
line was emitted. The tunnel can also HANG instead of erroring (observed:
one device touch blocked >50 min with nothing raised), so every retry
attempt carries a wall-clock deadline (BENCH_ATTEMPT_TIMEOUT_S, default
1800 s; 0 disables) that converts a hang into a retryable
DEADLINE_EXCEEDED, and a global watchdog (BENCH_GLOBAL_TIMEOUT_S, default
5100 s; 0 disables) force-emits the JSON from the checkpoint and exits 0
if the whole run overstays. Knobs: BENCH_RETRIES, BENCH_BACKOFF_S,
BENCH_EXEC_RETRIES, BENCH_CKPT (checkpoint path; deleted on a fully clean
run).

Driver-capture hardening (round 5 — BENCH_r04.json was rc=124 with no
JSON because the driver's `timeout` SIGTERMed the bench mid-e2e while the
measured 21 164 songs/s sat unprinted in the checkpoint):
- SIGTERM/SIGINT now assemble the JSON from whatever stages the
  checkpoint holds, print it, and exit 0 — a driver kill can no longer
  lose a number the bench already measured.
- Stage order is cheap-gates-first: correctness -> throughput -> hybrid
  -> kernels -> fuzz -> ext_fuzz, then the HEADLINE JSON LINE IS PRINTED
  (with "pending": ["e2e"]), then the e2e enrichment runs and the
  enriched line is re-emitted. An early line beats no line.
- The e2e song count auto-scales to the remaining wall budget
  (BENCH_WALL_BUDGET_S, default 2700 s; BENCH_E2E_SONGS overrides with a
  fixed count) and the fixture library persists across runs
  (make_library reuses files from any previous >= generation).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))
FIXTURE = "/root/reference/audio/song.flac"
CACHE = os.path.join(REPO, "baseline", "BASELINE_CPU.json")

GOLDEN = [-8.945454, -10.641844, -10.136086, -15.560563]

# ---------------------------------------------------------------------------
# Flake hardening: retry, checkpoint, re-exec
# ---------------------------------------------------------------------------

_TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "Unavailable",
    "DEADLINE_EXCEEDED",
    "DeadlineExceeded",
    "Socket closed",
    "Connection reset",
    "Broken pipe",
    "failed to connect",
    "Unable to initialize backend",
    "tunnel",
    "RESOURCE_EXHAUSTED",
    "ABORTED",
    "INTERNAL",
)


def _is_transient(e: BaseException) -> bool:
    """Heuristic: tunnel/backend flake (retry) vs a real bug (don't)."""
    if isinstance(e, (AssertionError, KeyboardInterrupt, SystemExit)):
        return False
    msg = f"{type(e).__name__}: {e}"
    return any(m in msg for m in _TRANSIENT_MARKERS)


def _deadline(fn, seconds: float, label: str):
    """Run fn() with a hard wall-clock bound. The axon tunnel can HANG a
    device call indefinitely (observed: >50 min on one device touch with
    no error raised) — an error we can retry, a hang we cannot, so run the
    attempt on a daemon thread and abandon it past the deadline. The
    raised error matches _TRANSIENT_MARKERS, so _retry/_reexec treat it
    exactly like a thrown UNAVAILABLE (a fresh attempt / fresh process)."""
    box: list = []

    def run():
        try:
            box.append(("ok", fn()))
        except BaseException as e:  # noqa: BLE001 — re-raised by caller
            box.append(("err", e))

    t = threading.Thread(target=run, daemon=True, name=f"bench-{label}")
    t.start()
    t.join(seconds)
    if not box:
        raise RuntimeError(
            f"DEADLINE_EXCEEDED: {label} still blocked after {seconds:.0f}s "
            "(hung device tunnel)"
        )
    kind, val = box[0]
    if kind == "err":
        raise val
    return val


def _retry(fn, label: str, attempts: int | None = None,
           backoff_s: float | None = None, transient_only: bool = True,
           deadline_s: float | None = None):
    """Run fn(); on transient failure sleep and retry (doubling backoff,
    capped). Non-transient exceptions propagate immediately. Each attempt
    is wall-clock bounded (BENCH_ATTEMPT_TIMEOUT_S, default 1800 s; 0
    disables) so a silently hung tunnel degrades like a thrown error."""
    attempts = attempts or int(os.environ.get("BENCH_RETRIES", 5))
    backoff = (
        backoff_s
        if backoff_s is not None
        else float(os.environ.get("BENCH_BACKOFF_S", 30))
    )
    if deadline_s is None:
        deadline_s = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT_S", 1800))
    last: BaseException | None = None
    for i in range(attempts):
        try:
            if deadline_s:
                return _deadline(fn, deadline_s, label)
            return fn()
        except BaseException as e:  # noqa: BLE001 — classified below
            if transient_only and not _is_transient(e):
                raise
            last = e
            if i == attempts - 1:
                break
            wait = min(backoff * (2**i), 300.0)
            print(
                f"bench: {label} attempt {i + 1}/{attempts} failed "
                f"({type(e).__name__}: {e}); retrying in {wait:.0f}s",
                file=sys.stderr,
            )
            time.sleep(wait)
    raise last  # type: ignore[misc]


class Checkpoint:
    """Per-stage JSON results on disk so a crashed/re-exec'd bench resumes
    instead of re-paying completed stages. Invalidated by a signature
    mismatch (code revision / bench params) or age > 6 h. Deleted after a
    fully clean run so the next round always re-measures."""

    TTL_S = 6 * 3600

    def __init__(self, path: str, signature: str):
        self.path = path
        self.signature = signature
        self.stages: dict[str, dict] = {}
        try:
            with open(path) as f:
                data = json.load(f)
            fresh = time.time() - data.get("time", 0) < self.TTL_S
            if data.get("signature") == signature and fresh:
                self.stages = data.get("stages", {})
        except (OSError, ValueError):
            pass

    def _save(self) -> None:
        tmp = self.path + ".tmp"
        try:
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "signature": self.signature,
                        "time": time.time(),
                        "stages": self.stages,
                    },
                    f,
                )
            os.replace(tmp, self.path)
        except OSError as e:
            print(f"bench: checkpoint write failed: {e}", file=sys.stderr)

    def has(self, name: str) -> bool:
        return name in self.stages and "error" not in self.stages[name]

    def get(self, name: str):
        return self.stages[name]["value"]

    def error(self, name: str) -> str | None:
        return self.stages.get(name, {}).get("error")

    def put(self, name: str, value) -> None:
        self.stages[name] = {"value": value}
        self._save()

    def put_error(self, name: str, e: BaseException) -> None:
        self.stages[name] = {"error": f"{type(e).__name__}: {e}"}
        self._save()

    def clear(self) -> None:
        try:
            os.remove(self.path)
        except OSError:
            pass


def run_stage(ckpt: Checkpoint, name: str, fn, required: bool = False):
    """Run one bench stage under retry + checkpointing. Returns the stage's
    JSON-serializable result, or None if it failed (error recorded). With
    required=True a failure propagates (used for backend acquisition, where
    the caller escalates to a process re-exec)."""
    if ckpt.has(name):
        print(f"bench: stage {name}: reusing checkpoint", file=sys.stderr)
        return ckpt.get(name)
    t0 = time.time()
    try:
        value = _retry(fn, label=f"stage {name}")
    except BaseException as e:  # noqa: BLE001 — recorded, bench continues
        ckpt.put_error(name, e)
        print(
            f"bench: stage {name} FAILED ({type(e).__name__}: {e})",
            file=sys.stderr,
        )
        if required:
            raise
        return None
    print(
        f"bench: stage {name} done in {time.time() - t0:.1f}s",
        file=sys.stderr,
    )
    ckpt.put(name, value)
    return value


def _reexec_for_backend(e: BaseException) -> None:
    """Backend init can poison the whole process (the plugin caches its
    failure); a fresh process + the checkpoint is the reliable retry."""
    tries = int(os.environ.get("BENCH_EXEC_ATTEMPT", 0))
    limit = int(os.environ.get("BENCH_EXEC_RETRIES", 2))
    if tries >= limit:
        return
    wait = min(
        float(os.environ.get("BENCH_BACKOFF_S", 30)) * (2**tries), 300.0
    )
    print(
        f"bench: backend unavailable ({e}); re-exec {tries + 1}/{limit} "
        f"after {wait:.0f}s",
        file=sys.stderr,
    )
    time.sleep(wait)
    env = dict(os.environ, BENCH_EXEC_ATTEMPT=str(tries + 1))
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)


# ---------------------------------------------------------------------------
# Stages
# ---------------------------------------------------------------------------


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


def stage_decode_model() -> dict:
    """Host decode cost per codec/variant: seconds/song for the same 11-s
    content encoded as verbatim FLAC (the synthetic e2e library), compressed
    FLAC, mp3, ogg-vorbis, and wav — plus the reference's own fixture. The
    e2e projection is decode-bound on any realistic host, so the codec mix
    is the dominant variable (measured ~4x between verbatim and compressed
    FLAC on this host). Device-independent: runs even when the TPU is
    unavailable."""
    import tempfile

    import numpy as np

    from bliss_tpu.io import decode, encode
    from bliss_tpu.io.flac_writer import write_flac

    rng = np.random.RandomState(7)
    t = np.arange(11 * 22050)
    sig = 9000 * np.sin(2 * np.pi * t / 50.0) + rng.randn(t.size) * 800
    beat = 0.3 + 0.7 * ((t // 8192) % 2)
    pcm = np.clip(sig * beat, -32768, 32767).astype(np.int16)
    frames = np.stack([pcm, pcm], axis=1)  # [n, 2] for the verbatim writer
    inter = frames.reshape(-1)  # interleaved for the libav encoder

    out = {}
    with tempfile.TemporaryDirectory() as d:
        variants = {}
        p = os.path.join(d, "verbatim.flac")
        write_flac(p, frames)
        variants["flac_verbatim"] = p
        for name, fname, codec in (
            ("flac_compressed", "c.flac", None),
            ("mp3", "c.mp3", "libmp3lame"),
            ("ogg_vorbis", "c.ogg", "libvorbis"),
            ("wav_pcm", "c.wav", None),
        ):
            try:
                variants[name] = encode(os.path.join(d, fname), inter,
                                        codec=codec)
            except Exception as e:  # noqa: BLE001 — encoder optional
                out[name] = {"error": f"{type(e).__name__}: {e}"}
        if os.path.exists(FIXTURE):
            variants["reference_fixture_flac"] = FIXTURE

        for name, path in variants.items():
            decode(path)  # warm page cache
            best = best_cpu = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                c0 = time.thread_time()
                decode(path)
                best_cpu = min(best_cpu, time.thread_time() - c0)
                best = min(best, time.perf_counter() - t0)
            out[name] = {
                "s_per_song": round(best, 4),
                # CPU actually burned (CLOCK_THREAD_CPUTIME_ID) — the
                # projection input; wall diverges on contended hosts
                "cpu_s_per_song": round(best_cpu, 4),
                "file_bytes": os.path.getsize(path),
            }
    return out


class DeviceCtx:
    """Device-resident state shared by the correctness/throughput stages:
    the fixture batch on device and the compiled production program."""

    def __init__(self):
        import functools

        import jax
        import jax.numpy as jnp
        import numpy as np

        from bliss_tpu.config import AnalysisConfig
        from bliss_tpu.features import PCMBatch, analyze_batch
        from bliss_tpu.io import decode

        self.jax, self.np = jax, np
        d = decode(FIXTURE)
        self.B = int(os.environ.get("BENCH_B", 128))
        base = np.asarray(d.samples)
        arrays = [np.roll(base, 1013 * i) for i in range(self.B)]
        host_batch = PCMBatch.from_arrays(arrays, [d.duration] * self.B)
        # first device touch — the flake point round 3 died on
        self.batch = PCMBatch(*(jax.device_put(x) for x in host_batch))
        self.device = str(jax.devices()[0])

        self.cfg = AnalysisConfig.for_tpu()
        cfg = self.cfg
        self.feats_fn = jax.jit(lambda b: analyze_batch(b, cfg))

        @functools.partial(jax.jit, static_argnames="reps")
        def repeated(b, reps):
            # Repeat the full analysis on (perturbed) input inside one
            # program: amortizes the tunnel's fixed dispatch cost out of
            # the measurement. The perturbation (one int16 add) defeats CSE.
            def body(i, acc):
                nb = PCMBatch(
                    b.samples + (i % 3).astype(jnp.int16),
                    b.n_samples,
                    b.durations,
                )
                return acc + jnp.sum(analyze_batch(nb, cfg))

            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        self.repeated = repeated

    def hybrid_batch(self, cfg_h, n_host, d_host):
        import numpy as np

        from bliss_tpu.features.analyze import (
            _device_stage_packed,
            _unpack_stage,
        )
        from bliss_tpu.features.tempo import envelope_finish_host

        packed = np.asarray(_device_stage_packed(self.batch, cfg_h))
        amp, freq, fa, _ = _unpack_stage(
            packed, cfg_h, self.batch.samples.shape[1]
        )
        t, a = envelope_finish_host(fa, n_host, d_host)
        return np.stack([t, amp, freq, a], axis=1)


_CTX: DeviceCtx | None = None


def _ctx() -> DeviceCtx:
    # no internal retry: every caller (backend acquisition in main, each
    # stage via run_stage) already runs under _retry
    global _CTX
    if _CTX is None:
        _CTX = DeviceCtx()
    return _CTX


def stage_correctness() -> dict:
    """Golden gates for the production (device_exact) and hybrid paths."""
    import numpy as np

    from bliss_tpu.config import AnalysisConfig

    ctx = _ctx()
    feats = np.asarray(ctx.feats_fn(ctx.batch))
    err = np.abs(feats[0] - np.array(GOLDEN))
    # tempo is gated at reference epsilon (1e-5): the double-single finish
    # is beat-exact, not a loose float32 bound
    device_ok = bool(err[0] < 1e-5 and err[1:].max() < 5e-4)

    cfg_h = AnalysisConfig.for_tpu_hybrid()
    n_host = np.asarray(ctx.batch.n_samples)
    d_host = np.asarray(ctx.batch.durations)
    hfeats = ctx.hybrid_batch(cfg_h, n_host, d_host)
    herr = np.abs(hfeats[0] - np.array(GOLDEN))
    hybrid_ok = bool(herr[0] < 1e-5 and herr[1:].max() < 5e-4)
    if not (device_ok and hybrid_ok):
        print(
            f"WARNING: correctness gate failed: device {feats[0]} / "
            f"hybrid {hfeats[0]} vs {GOLDEN}",
            file=sys.stderr,
        )
    return {
        "device_ok": device_ok,
        "hybrid_ok": hybrid_ok,
        "tempo_err_device_exact": float(err[0]),
        "max_feature_err_vs_golden": float(err[1:].max()),
        "tempo_err_hybrid": float(herr[0]),
        "max_feature_err_hybrid": float(herr.max()),
        "device": ctx.device,
    }


def stage_throughput() -> dict:
    """Device-resident analysis throughput (fused kernels).
    min-of-trials: the tunnel/device occasionally has multi-ms hiccups that
    would bias a mean upward by 10-20% run to run."""
    ctx = _ctx()
    R1, R2, TRIALS = 4, 28, 5
    float(ctx.repeated(ctx.batch, R1))  # compile
    float(ctx.repeated(ctx.batch, R2))

    def timed(reps):
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.time()
            float(ctx.repeated(ctx.batch, reps))
            best = min(best, time.time() - t0)
        return best

    per_batch = (timed(R2) - timed(R1)) / (R2 - R1)
    return {
        "per_batch_s": per_batch,
        "songs_per_sec": ctx.B / per_batch,
        "batch": ctx.B,
    }


def stage_hybrid_timing() -> dict:
    """Production hybrid mode incl. host float64 finish (wall-clock per
    batch: device dispatch + fetch + vectorized host finish; includes this
    sandbox's ~28 ms tunnel round-trips, so it is a LOWER bound for a real
    TPU-VM host)."""
    import numpy as np

    from bliss_tpu.config import AnalysisConfig

    ctx = _ctx()
    cfg_h = AnalysisConfig.for_tpu_hybrid()
    n_host = np.asarray(ctx.batch.n_samples)
    d_host = np.asarray(ctx.batch.durations)
    ctx.hybrid_batch(cfg_h, n_host, d_host)  # warm/compile
    t0 = time.time()
    H = 4
    for _ in range(H):
        ctx.hybrid_batch(cfg_h, n_host, d_host)
    per_batch = (time.time() - t0) / H
    return {
        "per_batch_s": per_batch,
        "songs_per_sec": ctx.B / per_batch,
    }


def _e2e_song_count(elapsed_s: float) -> int:
    """Scale the e2e library size to the remaining wall budget so the
    enrichment stage cannot blow past the driver's kill window. An
    explicit BENCH_E2E_SONGS wins; otherwise size to
    (BENCH_WALL_BUDGET_S - elapsed) at a conservative measured per-song
    cost (generate + cold scan + warm re-scan on this 1-core host)."""
    explicit = os.environ.get("BENCH_E2E_SONGS")
    if explicit:
        return int(explicit)
    budget = float(os.environ.get("BENCH_WALL_BUDGET_S", 2700))
    s_per_song = float(os.environ.get("BENCH_E2E_S_PER_SONG", 0.15))
    remaining = budget - elapsed_s
    return max(500, min(10000, int(remaining / s_per_song)))


def stage_e2e(n_e2e: int) -> dict:
    """End-to-end library scan (decode -> features) + warm re-scan. The
    north star workload (BASELINE.md). The count is wall-budget-scaled
    (see _e2e_song_count); BENCH_E2E_SONGS pins it."""
    import tempfile

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from gen_library import make_library

    from bliss_tpu.pipeline import analyze_library
    from bliss_tpu.store import FeatureStore

    ctx = _ctx()
    cfg = ctx.cfg
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
        # pure stat-prescreen+lookup (no decode, no device) — the daily
        # "re-scan my library" workload the reference GUI re-pays in full
        t0 = time.time()
        r2 = analyze_library(
            files, cfg=cfg, batch_size=128, store=FeatureStore(sd)
        )
        warm_s = time.time() - t0
        assert r2.ok.all() and r2.stats.get("decoded", 0) == 0, (
            "warm re-scan should decode nothing"
        )

    st = r.stats
    stage_s = {
        k: st[k]["seconds"]
        for k in (
            "fingerprint", "pad", "device_dispatch", "device_finalize",
            "finalize_wait", "store_flush",
        )
        if k in st
    }
    stage_s["scan_total"] = st.get("scan", {}).get("seconds", e2e_s)
    stage_cpu_s = {
        k: st[k]["cpu_seconds"]
        for k in (
            "fingerprint", "pad", "device_dispatch", "device_finalize",
            "store_flush",
        )
        if k in st and "cpu_seconds" in st[k]
    }
    decode_core_s = st.get("decode_core_seconds", 0.0)
    n_decoded = max(st.get("decoded", 1), 1)
    decode_s_per_song = decode_core_s / n_decoded
    # measured CPU actually burned by the decode threads — the projection
    # input (wall time on this 1-core host includes time the decoder sat
    # descheduled behind pad/dispatch work; see OPERATIONS.md)
    decode_cpu_s = st.get("decode_cpu_seconds", 0.0)
    decode_cpu_per_song = (decode_cpu_s / n_decoded) or decode_s_per_song
    return {
        "songs": len(files),
        "songs_per_sec": len(files) / e2e_s,
        "warm_rescan_songs_per_sec": len(files) / warm_s,
        "gen_seconds": round(gen_s, 1),
        "elapsed_seconds": round(e2e_s, 1),
        "decode_core_seconds": round(decode_core_s, 1),
        "decode_cpu_seconds": round(decode_cpu_s, 1),
        # process-wide CPU across the scan (user+sys, ALL threads): the
        # robust projection total — per-thread clocks cannot see avcodec
        # helper threads or pool threads
        "process_cpu_seconds": round(
            st.get("scan_process_cpu_seconds", 0.0), 1
        ),
        "decode_s_per_song_per_core": round(decode_s_per_song, 4),
        "decode_cpu_s_per_song": round(decode_cpu_per_song, 4),
        "stage_seconds": {k: round(v, 1) for k, v in stage_s.items()},
        "stage_cpu_seconds": {
            k: round(v, 1) for k, v in stage_cpu_s.items()
        },
        "_decode_s_per_song": decode_cpu_per_song,
    }


def stage_kernels() -> dict:
    """Kernel smoke matrix (real-device Mosaic regression gate). CPU CI
    runs the Pallas kernels interpreted, which skips tile-shape validation;
    this compiles every kernel configuration on the actual backend."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from kernel_smoke import run_smoke

    return run_smoke(
        time_budget_s=float(os.environ.get("BENCH_KERNELS_BUDGET", 1200))
    )


def stage_fuzz() -> dict:
    """Differential fuzz net (real-device numerics gate): random songs vs
    the reference binary ON THIS BACKEND — CPU fuzzing computes every f32
    dot at full precision and cannot catch TPU default-precision
    regressions (this net found the warm-up-delta ±1-beat flips)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from fuzz_differential import run_batched_device_fuzz

    return run_batched_device_fuzz(
        n_cases=int(os.environ.get("BENCH_FUZZ_CASES", 16)),
        verbose=False,
    )


def stage_ext_fuzz() -> dict:
    """Extended-feature differential net: the production f32 extended
    program on this backend vs a float64 oracle in a CPU subprocess (no
    reference binary covers these columns). Found the plain-f32
    beat_metrics ±1-2 beat drift vs the core tempo (round 4)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from fuzz_differential import run_extended_fuzz

    return run_extended_fuzz(
        n_cases=int(os.environ.get("BENCH_EXT_FUZZ_CASES", 8)),
        verbose=False,
    )


# ---------------------------------------------------------------------------
# Assembly
# ---------------------------------------------------------------------------


def assemble_json(baseline, correctness, throughput, hybrid, e2e, kernels,
                  fuzz, errors, decode_model=None, ext_fuzz=None,
                  pending=None) -> dict:
    """Build the output line from whatever stages succeeded; missing or
    failed stages degrade to marked fields instead of aborting the bench."""
    correctness_ok = bool(
        correctness
        and correctness["device_ok"]
        and correctness["hybrid_ok"]
    )
    if fuzz and not fuzz.get("error") and fuzz.get("divergent"):
        correctness_ok = False
    if ext_fuzz and not ext_fuzz.get("error") and ext_fuzz.get("divergent"):
        correctness_ok = False
    songs_per_sec = throughput["songs_per_sec"] if throughput else 0.0
    usable = bool(throughput) and correctness_ok
    base_rate = baseline["cpu_analysis_songs_per_sec"] if baseline else None
    out = {
        "metric": "songs analyzed/sec/chip (PCM->features, 11s songs)",
        "value": round(songs_per_sec, 1) if usable else 0.0,
        "unit": "songs/s",
        "vs_baseline": (
            round(songs_per_sec / base_rate, 1) if usable and base_rate else 0.0
        ),
        "baseline_cpu_songs_per_sec": base_rate,
        "batch": throughput["batch"] if throughput else None,
        "ms_per_batch": (
            round(throughput["per_batch_s"] * 1000, 2) if throughput else None
        ),
        "device": (correctness or {}).get("device", "unavailable"),
        "correctness_ok": correctness_ok,
    }
    if hybrid:
        out["hybrid_songs_per_sec"] = round(hybrid["songs_per_sec"], 1)
        out["hybrid_ms_per_batch"] = round(hybrid["per_batch_s"] * 1000, 2)
    if e2e:
        e2e = dict(e2e)
        decode_s = e2e.pop("_decode_s_per_song", 0.0)
        out["e2e_songs_per_sec"] = round(e2e.pop("songs_per_sec"), 1)
        out["warm_rescan_songs_per_sec"] = round(
            e2e.pop("warm_rescan_songs_per_sec"), 1
        )
        if baseline:
            out["e2e_vs_baseline"] = round(
                out["e2e_songs_per_sec"] / baseline["cpu_e2e_songs_per_sec"], 1
            )
        # real-host projection, built entirely from MEASURED CPU seconds
        # (CLOCK_THREAD_CPUTIME_ID — never wall, which on this 1-core host
        # absorbs scheduler contention into whichever stage happens to
        # hold the GIL): per-song host cost = decode CPU/song + the other
        # host stages' CPU/song; C cores sustain C / cost songs/s, capped
        # by the measured device-resident rate. Formula documented in
        # OPERATIONS.md "Capacity projection"; unit-tested in
        # tests/test_bench_harness.py.
        device_cap = songs_per_sec if throughput else float("inf")
        n_songs = max(e2e.get("songs", 1), 1)
        # non-decode host cost per song. Prefer the process-wide CPU total
        # (user+sys across ALL threads) minus measured decode CPU: the
        # per-thread stage clocks under-count anything a stage runs on
        # other threads (pool workers, library helpers); the process total
        # cannot. Fall back to the per-stage sum for older e2e payloads.
        proc_cpu = e2e.get("process_cpu_seconds", 0.0)
        if proc_cpu:
            other_cpu = max(
                proc_cpu - e2e.get("decode_cpu_seconds", 0.0), 0.0
            ) / n_songs
        else:
            other_cpu = sum(
                e2e.get("stage_cpu_seconds", {}).values()
            ) / n_songs

        def _project(decode_cpu_per_song):
            cost = decode_cpu_per_song + other_cpu
            return {
                str(c): round(min(c / max(cost, 1e-9), device_cap), 1)
                for c in (8, 32, 96)
            }

        e2e["host_cpu_s_per_song_non_decode"] = round(other_cpu, 4)
        e2e["projected_songs_per_sec_at_cores"] = _project(decode_s)
        if decode_model:
            # fold the measured per-codec decode costs in: the projection
            # above assumes the scanned library's codec (verbatim FLAC);
            # real libraries are compressed FLAC / mp3 — rates per variant
            e2e["decode_s_per_song_by_codec"] = {
                k: v.get("cpu_s_per_song", v.get("s_per_song", v))
                for k, v in decode_model.items()
            }
            e2e["projected_songs_per_sec_at_cores_by_codec"] = {
                k: _project(v.get("cpu_s_per_song", v["s_per_song"]))
                for k, v in decode_model.items()
                if "s_per_song" in v
            }
        out["e2e"] = e2e
    elif decode_model:
        out["decode_model"] = decode_model
    if correctness:
        for k in (
            "tempo_err_device_exact",
            "max_feature_err_vs_golden",
            "tempo_err_hybrid",
            "max_feature_err_hybrid",
        ):
            out[k] = correctness[k]
    out["kernels_ok"] = kernels["ok"] if kernels else None
    if kernels:
        out["kernel_smoke"] = kernels.get("results", {})
    out["device_fuzz"] = fuzz
    if ext_fuzz is not None:
        out["extended_fuzz"] = ext_fuzz
    if fuzz and not fuzz.get("error") and fuzz.get("divergent"):
        print(f"WARNING: device fuzz divergent: {fuzz}", file=sys.stderr)
    if ext_fuzz and not ext_fuzz.get("error") and ext_fuzz.get("divergent"):
        print(
            f"WARNING: extended fuzz divergent: {ext_fuzz}", file=sys.stderr
        )
    if pending:
        out["pending"] = list(pending)
    if errors:
        out["errors"] = errors
    return out


def _signature() -> str:
    rev = "unknown"
    try:
        rev = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "HEAD"],
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip()
    except Exception:  # noqa: BLE001 — signature only
        pass
    params = {
        k: os.environ.get(k)
        for k in (
            "BENCH_B", "BENCH_E2E_SONGS", "BENCH_FUZZ_CASES",
            "BENCH_EXT_FUZZ_CASES",
        )
    }
    return f"{rev}|{params}"


_EMIT_LOCK = threading.Lock()
_EMITTED = False


def _emit_json_once(out: dict) -> bool:
    """Print a JSON line only if none was printed yet (the emergency
    paths — fatal handler, global watchdog, SIGTERM/SIGINT — must never
    clobber a line the normal flow already emitted)."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return False
        _EMITTED = True
    print(json.dumps(out))
    sys.stdout.flush()
    return True


def _emit_json(out: dict) -> None:
    """Print a JSON line unconditionally (normal flow only: the headline
    after the correctness gates, then the enriched re-emit after e2e —
    the driver parses the last complete line, and an early line beats no
    line if the e2e enrichment is killed).

    Flag ordering matters: _EMITTED is set only AFTER the line is printed
    and flushed. A SIGTERM landing mid-print then re-emits a (complete)
    line from the checkpoint instead of assuming one already made it out;
    a possible duplicate/truncated-then-complete pair is fine — the
    driver parses the LAST complete line."""
    global _EMITTED
    print(json.dumps(out))
    sys.stdout.flush()
    with _EMIT_LOCK:
        _EMITTED = True


def _assemble_from_ckpt(ckpt: Checkpoint, extra_errors: dict) -> dict:
    """Degraded-JSON assembly from whatever stages the checkpoint holds.
    Shared by the global watchdog, the SIGTERM/SIGINT handlers, and the
    fatal handler — the r04 driver kill left 21 164 songs/s sitting in
    exactly this checkpoint with nothing to print it."""
    stage = {k: v.get("value") for k, v in ckpt.stages.items()}
    errors = {
        k: v["error"] for k, v in ckpt.stages.items() if "error" in v
    }
    errors.update(extra_errors)
    try:
        return assemble_json(
            stage.get("baseline"), stage.get("correctness"),
            stage.get("throughput"), stage.get("hybrid"),
            stage.get("e2e"), stage.get("kernels"), stage.get("fuzz"),
            errors, stage.get("decode_model"),
            ext_fuzz=stage.get("ext_fuzz"),
        )
    except Exception as e:  # noqa: BLE001 — emit SOMETHING
        return {
            "metric": "songs analyzed/sec/chip (PCM->features, 11s songs)",
            "value": 0.0, "unit": "songs/s", "vs_baseline": 0.0,
            "device": "unavailable", "correctness_ok": False,
            "errors": {**errors, "assemble": f"{type(e).__name__}: {e}"},
        }


def _install_signal_handlers(ckpt: Checkpoint) -> None:
    """SIGTERM/SIGINT: flush the JSON line before dying. The driver wraps
    the bench in `timeout`, whose SIGTERM killed round 4's capture with
    the measured number still unprinted (BENCH_r04.json: rc=124,
    parsed: null). The handler assembles from the checkpoint, emits only
    if the normal flow hasn't already, and exits 0 either way."""
    import signal

    def handler(signum, frame):  # noqa: ARG001 — signal API
        # LOCK-FREE on purpose: the handler runs on the main thread
        # between bytecodes, so taking _EMIT_LOCK here would deadlock if
        # the signal interrupted the main thread while it held that lock.
        # Plain flag read instead; the worst case is a duplicate line,
        # and the driver parses the last complete one.
        name = signal.Signals(signum).name
        if not _EMITTED:
            out = _assemble_from_ckpt(
                ckpt, {"signal": f"{name} received; emitted from checkpoint"}
            )
            try:
                print(json.dumps(out))
            except Exception:  # noqa: BLE001 — exit path, best effort
                pass
            print(
                f"bench: {name} received; emitted JSON from checkpoint",
                file=sys.stderr,
            )
        else:
            print(
                f"bench: {name} received after emission; exiting clean",
                file=sys.stderr,
            )
        # flush stdout even on the already-emitted path: with a piped
        # (block-buffered) stdout the emitted line may still sit in
        # Python's buffer, and os._exit skips interpreter cleanup
        try:
            sys.stdout.flush()
        except Exception:  # noqa: BLE001
            pass
        sys.stderr.flush()
        os._exit(0)

    signal.signal(signal.SIGTERM, handler)
    signal.signal(signal.SIGINT, handler)


def _start_global_watchdog(ckpt: Checkpoint) -> None:
    """Last-resort bound on total bench wall time. If the main flow is
    still running after BENCH_GLOBAL_TIMEOUT_S (0 disables), assemble a
    degraded JSON from whatever stages the checkpoint holds, print it, and
    exit 0 — the driver then records a parseable artifact instead of a
    timeout kill (round 3 lost its whole capture to one hung device_put)."""
    limit = float(os.environ.get("BENCH_GLOBAL_TIMEOUT_S", 5100))
    if not limit:
        return

    def fire():
        time.sleep(limit)
        out = _assemble_from_ckpt(ckpt, {
            "watchdog": (
                f"global timeout: bench still running after {limit:.0f}s"
            ),
        })
        if _emit_json_once(out):
            print(
                "bench: global watchdog fired; emitted degraded JSON",
                file=sys.stderr,
            )
        else:
            print(
                "bench: global watchdog fired after emission; exiting",
                file=sys.stderr,
            )
        try:
            sys.stdout.flush()  # piped stdout is block-buffered
        except Exception:  # noqa: BLE001
            pass
        os._exit(0)

    threading.Thread(target=fire, daemon=True, name="bench-watchdog").start()


def main() -> int:
    t_start = time.time()
    ckpt = Checkpoint(
        os.environ.get("BENCH_CKPT", "/tmp/bliss_bench_ckpt.json"),
        _signature(),
    )
    _install_signal_handlers(ckpt)
    _start_global_watchdog(ckpt)
    test_sleep = float(os.environ.get("BENCH_TEST_SLEEP_S", 0))
    if test_sleep:  # test hook: hold here so harness tests can SIGTERM us
        ready = os.environ.get("BENCH_TEST_READY_FILE")
        if ready:  # handshake: interpreter startup can take seconds
            with open(ready, "w") as f:
                f.write("ready")
        time.sleep(test_sleep)

    baseline = run_stage(ckpt, "baseline", measure_baseline)
    decode_model = run_stage(ckpt, "decode_model", stage_decode_model)

    # Acquire the backend once, explicitly, so a poisoned plugin init is
    # distinguishable from a stage bug: in-process retries first, then a
    # bounded process re-exec (resuming from the checkpoint).
    device_stages_possible = True
    try:
        _retry(_ctx, label="backend acquisition")
    except BaseException as e:  # noqa: BLE001
        if _is_transient(e):
            _reexec_for_backend(e)  # only returns when re-execs exhausted
        device_stages_possible = False
        ckpt.put_error("backend", e)
        print(
            f"bench: device unavailable after retries ({e}); emitting "
            "degraded JSON",
            file=sys.stderr,
        )

    correctness = throughput = hybrid = e2e = kernels = fuzz = None
    ext_fuzz = None
    if device_stages_possible:
        # cheap-gates-first: every stage that feeds the headline number
        # and the correctness gates runs BEFORE the expensive e2e
        # enrichment, and the headline line is printed as soon as the
        # gates complete (BENCH_r04 died inside e2e with the number
        # already measured but unprinted)
        correctness = run_stage(ckpt, "correctness", stage_correctness)
        throughput = run_stage(ckpt, "throughput", stage_throughput)
        hybrid = run_stage(ckpt, "hybrid", stage_hybrid_timing)
        if os.environ.get("BENCH_KERNELS", "1") != "0":
            kernels = run_stage(ckpt, "kernels", stage_kernels)
        if os.environ.get("BENCH_FUZZ", "1") != "0":
            fuzz = run_stage(ckpt, "fuzz", stage_fuzz)
            if fuzz is None:
                # fuzz infra failure must not zero the bench number
                fuzz = {"error": ckpt.error("fuzz")}
        if os.environ.get("BENCH_EXT_FUZZ", "1") != "0":
            ext_fuzz = run_stage(ckpt, "ext_fuzz", stage_ext_fuzz)
            if ext_fuzz is None:
                ext_fuzz = {"error": ckpt.error("ext_fuzz")}

    def _errors():
        return {
            name: rec["error"]
            for name, rec in ckpt.stages.items()
            if "error" in rec
        }

    run_e2e = device_stages_possible and (
        os.environ.get("BENCH_E2E", "1") != "0"
    )
    headline = assemble_json(
        baseline, correctness, throughput, hybrid, None, kernels, fuzz,
        _errors(), decode_model, ext_fuzz=ext_fuzz,
        pending=["e2e"] if run_e2e else None,
    )
    _emit_json(headline)

    if run_e2e:
        n_e2e = _e2e_song_count(time.time() - t_start)
        e2e = run_stage(ckpt, "e2e", lambda: stage_e2e(n_e2e))
        out = assemble_json(
            baseline, correctness, throughput, hybrid, e2e, kernels, fuzz,
            _errors(), decode_model, ext_fuzz=ext_fuzz,
        )
        _emit_json(out)  # enriched re-emit: the last complete line wins

    if not _errors():
        ckpt.clear()  # clean run: never reuse stale numbers next time
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BaseException as e:  # noqa: BLE001 — the JSON line must happen
        if isinstance(e, (KeyboardInterrupt, SystemExit)):
            raise
        import traceback

        traceback.print_exc()
        # assemble from the checkpoint: stages completed before the fatal
        # error still carry their numbers into the degraded line
        ckpt = Checkpoint(
            os.environ.get("BENCH_CKPT", "/tmp/bliss_bench_ckpt.json"),
            _signature(),
        )
        _emit_json_once(
            _assemble_from_ckpt(
                ckpt, {"fatal": f"{type(e).__name__}: {e}"}
            )
        )
        sys.exit(0)
