#!/usr/bin/env python
"""Randomized differential fuzzing: reference C library vs bliss-tpu.

Generates N random synthetic songs (random mixtures of tones, noise bursts,
beat trains, sweeps, silence gaps), writes them as FLAC, analyzes each with
the reference binary (baseline/build/analyze) and with bliss-tpu's float64
parity mode, and reports the deviation distribution per feature.

Run: python scripts/fuzz_differential.py [N] [parity|hybrid|device_exact|streaming|streaming_strict|extended] [cpu|tpu]

"parity" (default) compares the float64 parity mode (expected deviation
~1e-5). "hybrid" compares the fused-kernel configuration with the host
float64 envelope finish; "device_exact" the production round-3 mode where
the finish runs ON DEVICE in double-single arithmetic — in both, beats
must stay exact (tempo deviation << one 4/duration quantum) and other
features sit within the float32 gate (5e-4). "streaming" generates LONG
songs (2-7 minutes) and runs them through the chunked fixed-shape path
(features/streaming.py) — the route every >~3-min song takes in
production — under the same beat-exact gate. "streaming_strict" runs
the same long songs through the streamed STRICT-parity config (float64,
iterative amplitude, fft_strict) — expected at the parity gate (~1e-5).

The third argument picks the JAX backend: "cpu" (default — pins the CPU
backend, enables x64) or "tpu" (leaves the default device active; only
the all-f32 modes `device_exact`/`hybrid`/`streaming` are allowed, since
float64 hangs the axon TPU at compile). The tpu backend validates the
numerics under the REAL Mosaic/XLA:TPU compilation — default matmul
precision, fma availability and fusion orders differ from CPU, so CPU
fuzz results do not transfer automatically (this caught the LOW-precision
warm-up-delta ±1-beat flips). device_exact/hybrid run batched (fixed
[16, Lmax] shape = one device compile); streaming uses the per-case
chunked loop (already one compiled shape per chunk program). bench.py
calls run_batched_device_fuzz() as its per-run correctness net.
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import re
import subprocess
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = os.path.join(REPO, "baseline", "build")


def random_song(rng, seconds, sr=22050):
    n = sr * seconds
    t = np.arange(n)
    sig = np.zeros(n)
    for _ in range(rng.randint(1, 5)):
        f = rng.uniform(60, 8000)
        amp = rng.uniform(1000, 12000)
        sig += amp * np.sin(2 * np.pi * f * t / sr + rng.uniform(0, 6.28))
    if rng.rand() < 0.7:  # beat train
        bpm = rng.uniform(60, 180)
        phase = (t * bpm / 60 / sr) % 1.0
        sig *= 0.4 + 0.6 * (phase < rng.uniform(0.2, 0.6))
    if rng.rand() < 0.8:  # noise bed
        sig += rng.randn(n) * rng.uniform(200, 4000)
    if rng.rand() < 0.5:  # silence gap
        a = rng.randint(0, n // 2)
        sig[a : a + rng.randint(sr // 10, sr)] = 0
    sig *= np.clip(t / (0.02 * sr), 0, 1) * np.clip((n - t) / (0.02 * sr), 0, 1)

    left = np.clip(sig, -32767, 32767).astype(np.int16)
    right = np.clip(sig * rng.uniform(0.5, 1.0), -32767, 32767).astype(np.int16)
    return np.stack([left, right], axis=1)


def ensure_reference_binary():
    if not os.path.exists(os.path.join(BUILD, "analyze")):
        subprocess.run(
            ["bash", os.path.join(REPO, "baseline", "build_baseline.sh")],
            check=True,
        )
        subprocess.run(["make", "-C", BUILD, "analyze"], check=True)


def run_batched_device_fuzz(
    n_cases: int = 16, mode: str = "device_exact", seed: int = 1234,
    verbose: bool = True,
) -> dict:
    """Differential fuzz of an all-f32 production mode on the CURRENT jax
    backend, batched to one compiled [16, L] shape (tunnel compiles are
    5-400 s each; per-case shapes would take hours). Compares against the
    reference binary run on the host. Also callable from bench.py as a
    correctness net over random content (the golden gates only cover the
    two fixture songs). Returns {"cases", "divergent", "max_dev", "mode"}.
    """
    assert mode in ("device_exact", "hybrid")
    ensure_reference_binary()

    import jax

    from bliss_tpu.config import AnalysisConfig
    from bliss_tpu.features import PCMBatch, analyze_batch_jit
    from bliss_tpu.features.analyze import analyze_batch_hybrid
    from bliss_tpu.io import decode
    from bliss_tpu.io.flac_writer import write_flac
    from bliss_tpu.pipeline import _bucket_length

    say = print if verbose else (lambda *a, **k: None)
    env = dict(
        os.environ,
        LD_LIBRARY_PATH=(
            f"{BUILD}:{os.path.join(REPO, 'baseline', 'fftw_shim', 'lib')}"
        ),
    )
    if mode == "hybrid":
        cfg = AnalysisConfig(
            dtype="float32", amplitude_mode="poly", fused_kernel=True,
            tempo_finish="host",
        )
    else:
        cfg = AnalysisConfig.for_tpu()  # the production config, verbatim
    rng = np.random.RandomState(seed)
    dev0 = jax.devices()[0]
    say(f"backend: {dev0.platform} ({dev0.device_kind})")

    # Phase 1 (host): generate songs, run the reference binary, decode.
    cases = []  # (case index, duration, samples, reference vector)
    with tempfile.TemporaryDirectory() as tmp:
        for i in range(n_cases):
            sr = 22050 if i % 4 == 0 else [44100, 48000, 32000][(i % 4) - 1]
            frames = random_song(rng, int(rng.randint(3, 9)), sr=sr)
            path = os.path.join(tmp, f"fuzz{i}.flac")
            write_flac(path, frames, sr)
            out = subprocess.run(
                [os.path.join(BUILD, "analyze"), path],
                capture_output=True, text=True, env=env, timeout=300,
            ).stdout
            m = re.search(
                r"Force vector: \(([-\d.]+), ([-\d.]+), ([-\d.]+), "
                r"([-\d.]+)\)",
                out,
            )
            if not m:
                say(f"case {i}: reference failed to analyze")
                continue
            ref = np.array([float(m.group(k)) for k in range(1, 5)])
            d = decode(path)
            cases.append((i, d.duration, np.asarray(d.samples), ref))

    # Phase 2 (device): fixed [B, L] batches -> ONE compiled shape.
    # L is the production bucket for the longest song.
    B = 16
    L = _bucket_length(max(c[2].shape[0] for c in cases), cfg.pad_multiple)
    fn = analyze_batch_hybrid if mode == "hybrid" else analyze_batch_jit
    say(f"analyzing {len(cases)} songs on device, batches of {B} at L={L}")
    ours_all = {}
    for b0 in range(0, len(cases), B):
        chunk = cases[b0:b0 + B]
        arrays = [c[2] for c in chunk]
        durs = [c[1] for c in chunk]
        while len(arrays) < B:  # keep the batch shape fixed
            arrays.append(arrays[-1])
            durs.append(durs[-1])
        batch = PCMBatch.from_arrays(arrays, durs, pad_multiple=L)
        res = np.asarray(fn(batch, cfg))
        for j, c in enumerate(chunk):
            ours_all[c[0]] = res[j]

    devs = []
    n_divergent = 0
    gate = 5e-4 * 2
    for i, duration, _, ref in cases:
        dev = np.abs(ours_all[i] - ref)
        devs.append(dev)
        beat_dev = dev[0] * duration / 4.0
        divergent = beat_dev > 0.01 or dev[1:].max() > gate
        n_divergent += divergent
        flag = " <-- DIVERGENT" if divergent else ""
        say(f"case {i:3d}: dev tempo={dev[0]:.2e} amp={dev[1]:.2e} "
            f"freq={dev[2]:.2e} atk={dev[3]:.2e}{flag}")
    devs = np.array(devs)
    say(f"\n{len(devs)} cases on {dev0.platform}; divergent: {n_divergent}")
    say(f"max deviation per feature "
        f"(tempo, amplitude, frequency, attack): {devs.max(axis=0)}")
    return {
        "cases": len(devs),
        "divergent": int(n_divergent),
        "max_dev": [float(v) for v in devs.max(axis=0)],
        "mode": mode,
    }


# --- extended-feature differential fuzz (device f32 vs CPU float64) --------

# Per-column-group gates for the extended fuzz: |device_f32 - cpu_f64|.
# Set from the math (see run_extended_fuzz docstring), then validated
# empirically on CPU-f32-vs-f64 and the real device. rolloff is the one
# knife-edge feature (per-frame argmax over a cumsum >= 0.95*energy): a
# single-bin flip in one frame moves the energy-weighted mean by up to a
# couple of Hz out of ~43 Hz/bin, hence the loose absolute gate.
EXTENDED_GATES = (
    ("zero_crossing_rate", 0, 1, 1e-5),
    ("loudness_db", 1, 2, 5e-3),
    ("spectral_centroid_hz", 2, 3, 2.0),
    ("spectral_rolloff_hz", 3, 4, 25.0),
    ("spectral_flatness", 4, 5, 1e-3),
    ("beats (bpm*dur/60)", 5, 6, 0.02),  # dev converted to beat quanta
    ("beat_loudness", 6, 7, 1e-2),
    ("mfcc", 7, 20, 2e-3),
    ("mfcc_std", 20, 33, 2e-3),
    ("chroma", 33, 45, 1e-4),
)


def _extended_batches(samples, n_samples, durations, cfg, fn):
    """Yield [16, L] fixed-shape batches through fn; returns [N, n_cols]."""
    from bliss_tpu.features import PCMBatch

    B = 16
    outs = []
    for b0 in range(0, samples.shape[0], B):
        sl = slice(b0, b0 + B)
        s, n, d = samples[sl], n_samples[sl], durations[sl]
        if s.shape[0] < B:  # keep the compiled shape fixed
            pad = B - s.shape[0]
            s = np.concatenate([s, np.repeat(s[-1:], pad, axis=0)])
            n = np.concatenate([n, np.repeat(n[-1:], pad)])
            d = np.concatenate([d, np.repeat(d[-1:], pad)])
        batch = PCMBatch(s, n, d)
        outs.append(np.asarray(fn(batch, cfg))[: sl.stop - b0])
    return np.concatenate(outs, axis=0)[: samples.shape[0]]


def run_extended_fuzz(
    n_cases: int = 64, seed: int = 4321, verbose: bool = True
) -> dict:
    """Differential fuzz of the extended ROADMAP features (zcr, loudness,
    centroid/rolloff/flatness, bpm, beat loudness, MFCC mean/std, chroma):
    the production f32 program (analyze_batch_ext_jit, for_tpu config) on
    the CURRENT jax backend vs a float64 oracle computed on the CPU backend
    in a fresh subprocess (x64 cannot be enabled in a process holding the
    axon TPU — float64 programs hang its compile). There is no reference
    binary for these features (the reference never implemented its
    ROADMAP.md list), so the oracle is the same math at float64; what this
    validates is the f32/XLA:TPU compilation of it — Mosaic matmul
    precision defaults, TPU transcendental approximations (log/exp in
    flatness and log-mel), and the knife-edge cumsum/argmax rolloff.
    bench.py-callable; returns {"cases", "divergent", "max_dev_by_group"}.
    """
    import jax

    from bliss_tpu.config import AnalysisConfig
    from bliss_tpu.features.analyze import analyze_batch_ext_jit
    from bliss_tpu.pipeline import _bucket_length

    say = print if verbose else (lambda *a, **k: None)
    cfg = AnalysisConfig.for_tpu()
    rng = np.random.RandomState(seed)

    # Phase 1 (host): synthetic songs straight to PCM (no decode — the
    # decoder is oracle-tested elsewhere; this fuzz targets the analyzers).
    arrays, durations = [], []
    for _ in range(n_cases):
        seconds = int(rng.randint(3, 9))
        frames = random_song(rng, seconds)
        arrays.append(frames.reshape(-1))  # interleave [n,2] -> [2n]
        durations.append(seconds)  # container whole seconds, like decode
    L = _bucket_length(max(a.shape[0] for a in arrays), cfg.pad_multiple)
    samples = np.zeros((n_cases, L), dtype=np.int16)
    for i, a in enumerate(arrays):
        samples[i, : a.shape[0]] = a
    n_samples = np.array([a.shape[0] for a in arrays], dtype=np.int32)
    durations = np.array(durations, dtype=np.int32)

    dev0 = jax.devices()[0]
    say(f"backend: {dev0.platform} ({dev0.device_kind}); "
        f"{n_cases} cases, batches of 16 at L={L}")

    # Phase 2 (current backend): production f32 extended program.
    ours = _extended_batches(
        samples, n_samples, durations, cfg, analyze_batch_ext_jit
    )[:, 4:]

    # Phase 3 (subprocess): float64 oracle on the CPU backend.
    with tempfile.TemporaryDirectory() as tmp:
        inp = os.path.join(tmp, "in.npz")
        outp = os.path.join(tmp, "out.npz")
        np.savez(
            inp, samples=samples, n_samples=n_samples, durations=durations
        )
        subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--extended-oracle", inp, outp],
            check=True, timeout=3600,
        )
        oracle = np.load(outp)["extended"]

    dev = np.abs(ours - oracle)
    # bpm deviation gates in beat quanta, not Hz of bpm
    dev[:, 5] = dev[:, 5] * durations / 60.0
    n_divergent = 0
    max_dev_by_group = {}
    worst = np.zeros(n_cases, dtype=bool)
    for gname, lo, hi, gate in EXTENDED_GATES:
        g = dev[:, lo:hi]
        max_dev_by_group[gname] = float(g.max())
        bad = (g > gate).any(axis=1)
        worst |= bad
        if bad.any():
            say(f"group {gname}: {int(bad.sum())} case(s) above gate "
                f"{gate} (max {g.max():.3e})")
    n_divergent = int(worst.sum())
    for i in np.flatnonzero(worst):
        say(f"case {i:3d}: DIVERGENT devs={np.round(dev[i], 5).tolist()}")
    say(f"\n{n_cases} cases on {dev0.platform}; divergent: {n_divergent}")
    say("max |f32 - f64| per group: "
        + ", ".join(f"{k}={v:.2e}" for k, v in max_dev_by_group.items()))
    return {
        "cases": n_cases,
        "divergent": n_divergent,
        "max_dev_by_group": max_dev_by_group,
        "mode": "extended",
    }


def _extended_oracle(inp: str, outp: str) -> None:
    """Subprocess body: float64 extended features on the CPU backend."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from bliss_tpu.config import AnalysisConfig
    from bliss_tpu.features.extended import extended_features_jit

    data = np.load(inp)
    cfg = AnalysisConfig(dtype="float64")
    ext = _extended_batches(
        data["samples"], data["n_samples"], data["durations"], cfg,
        extended_features_jit,
    )
    np.savez(outp, extended=ext)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--extended-oracle":
        _extended_oracle(sys.argv[2], sys.argv[3])
        return
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    mode = sys.argv[2] if len(sys.argv) > 2 else "parity"
    backend = sys.argv[3] if len(sys.argv) > 3 else "cpu"
    if mode not in ("parity", "hybrid", "device_exact", "streaming",
                    "streaming_strict", "extended"):
        raise SystemExit(
            f"unknown mode {mode!r}: use 'parity', 'hybrid', "
            "'device_exact', 'streaming', 'streaming_strict', or 'extended'"
        )
    if backend not in ("cpu", "tpu"):
        raise SystemExit(f"unknown backend {backend!r}: use 'cpu' or 'tpu'")
    if backend == "tpu" and mode not in (
        "device_exact", "hybrid", "streaming", "extended"
    ):
        raise SystemExit(
            "backend 'tpu' supports only the f32 modes 'device_exact', "
            "'hybrid', 'streaming', and 'extended' (float64 modes hang "
            "the TPU)"
        )
    if mode == "extended":
        # no reference binary involved; the oracle runs in a subprocess.
        # The parent stays x64-OFF either way: its half must compile the
        # production f32 program exactly as production does.
        if backend == "cpu":
            import jax

            jax.config.update("jax_platforms", "cpu")
        run_extended_fuzz(n_cases)
        return
    ensure_reference_binary()

    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    from bliss_tpu.config import AnalysisConfig
    from bliss_tpu.features import PCMBatch, analyze_batch_jit
    from bliss_tpu.features.analyze import analyze_batch_hybrid
    from bliss_tpu.io import decode
    from bliss_tpu.io.flac_writer import write_flac

    env = dict(
        os.environ,
        LD_LIBRARY_PATH=f"{BUILD}:{os.path.join(REPO, 'baseline', 'fftw_shim', 'lib')}",
    )
    if mode == "hybrid":
        cfg = AnalysisConfig(
            dtype="float32", amplitude_mode="poly", fused_kernel=True,
            tempo_finish="host",
        )
    elif mode == "device_exact":
        cfg = AnalysisConfig.for_tpu()  # the production config, verbatim
    elif mode == "streaming":
        # the config the pipeline hands to analyze_song_streaming (which
        # always finishes the envelope in host float64)
        cfg = AnalysisConfig(dtype="float32")
    elif mode == "streaming_strict":
        cfg = AnalysisConfig.for_parity()
    else:
        cfg = AnalysisConfig.for_parity()
    rng = np.random.RandomState(1234)

    if backend == "tpu" and mode == "streaming":
        # the chunked path is already one fixed compiled shape per chunk
        # program, so the regular per-case loop below works on device;
        # only the float64 marginal-flip adjudication is unavailable.
        dev0 = jax.devices()[0]
        print(f"backend: {dev0.platform} ({dev0.device_kind}), "
              "streaming per-case loop (f64 adjudication unavailable)")
    elif backend == "tpu":
        run_batched_device_fuzz(n_cases, mode)
        return

    devs = []
    n_divergent = 0
    n_marginal = 0
    with tempfile.TemporaryDirectory() as tmp:
        for i in range(n_cases):
            # every 4th case uses a non-canonical sample rate, exercising the
            # resampler end-to-end on both sides (same swresample library ->
            # identical PCM -> identical features expected)
            sr = 22050 if i % 4 == 0 else [44100, 48000, 32000][(i % 4) - 1]
            seconds = (
                int(rng.randint(120, 420))
                if mode.startswith("streaming")
                else int(rng.randint(3, 9))
            )
            frames = random_song(rng, seconds, sr=sr)
            path = os.path.join(tmp, f"fuzz{i}.flac")
            write_flac(path, frames, sr)
            out = subprocess.run(
                [os.path.join(BUILD, "analyze"), path],
                capture_output=True, text=True, env=env, timeout=300,
            ).stdout
            m = re.search(
                r"Force vector: \(([-\d.]+), ([-\d.]+), ([-\d.]+), ([-\d.]+)\)",
                out,
            )
            if not m:
                print(f"case {i}: reference failed to analyze"); continue
            ref = np.array([float(m.group(k)) for k in range(1, 5)])
            d = decode(path)
            if mode.startswith("streaming"):
                from bliss_tpu.features.streaming import analyze_song_streaming

                ours = analyze_song_streaming(
                    np.asarray(d.samples), d.duration, cfg
                )
            else:
                batch = PCMBatch.from_arrays(
                    [np.asarray(d.samples)], [d.duration]
                )
                if mode == "hybrid":
                    ours = np.asarray(analyze_batch_hybrid(batch, cfg))[0]
                else:  # parity and device_exact: fully jitted paths
                    ours = np.asarray(analyze_batch_jit(batch, cfg))[0]
            dev = np.abs(ours - ref)
            devs.append(dev)
            gate = 1e-3 if mode in ("parity", "streaming_strict") else 5e-4 * 2
            beat_dev = dev[0] * d.duration / 4.0  # tempo dev in beat quanta
            divergent = (dev.max() > gate) if mode == "parity" else (
                beat_dev > 0.01 or dev[1:].max() > gate
            )
            flag = " <-- DIVERGENT" if divergent else ""
            if (divergent and mode == "streaming" and 0.5 < beat_dev < 1.5
                    and backend == "tpu"):
                # float64 hangs the axon TPU; flag for manual CPU re-check
                flag = (" <-- DIVERGENT (±1 beat; rerun this case on the"
                        " cpu backend to adjudicate)")
            elif divergent and mode == "streaming" and 0.5 < beat_dev < 1.5:
                # a ±1-beat tempo flip in an f32-energy mode can be an
                # epsilon-marginal peak: the f32 band energies sit at the
                # same ~2^-23 noise floor as the reference's own f32 FFT,
                # so a peak within that margin of the eps threshold counts
                # on one side or the other by rounding luck. Adjudicate by
                # re-running the SAME streamed path in float64 parity
                # config: if that is beat-exact, the chunked machinery is
                # exonerated and the flip is inherent f32 sensitivity.
                p = analyze_song_streaming(
                    np.asarray(d.samples), d.duration,
                    AnalysisConfig.for_parity(),
                )
                if abs(p[0] - ref[0]) * d.duration / 4.0 < 0.01:
                    divergent = False
                    n_marginal += 1
                    flag = " <-- MARGINAL (1-beat f32 flip; parity exact)"
            n_divergent += divergent
            print(f"case {i:3d}: dev tempo={dev[0]:.2e} amp={dev[1]:.2e} "
                  f"freq={dev[2]:.2e} atk={dev[3]:.2e}{flag}")
    devs = np.array(devs)
    print(f"\n{len(devs)} cases; divergent: {n_divergent}; marginal f32 "
          f"beat flips (parity-exact): {n_marginal}")
    print(f"max deviation per feature "
          f"(tempo, amplitude, frequency, attack): {devs.max(axis=0)}")


if __name__ == "__main__":
    main()
