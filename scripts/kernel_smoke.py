#!/usr/bin/env python
"""Real-device Pallas kernel regression gate.

CI runs on CPU where every kernel call is interpret=True — and interpret
mode does NOT validate Mosaic tile constraints (CLAUDE.md): a kernel-
breaking edit can pass the whole suite and only fail at the driver's
device compile. This script compile-checks every kernel configuration on
the ACTUAL TPU:

    {1, 5, 36 bands} x {split, exact FIR} x {two-kernel, single_pass}
    x {plain jit, sharded shard_map}

and verifies finite, golden-consistent outputs. bench.py runs the same
matrix (BENCH_KERNELS=0 to skip) and emits ``kernels_ok`` in its JSON.

Run: python scripts/kernel_smoke.py            # prints one JSON line
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def smoke_configs():
    """The kernel configuration matrix, as (name, AnalysisConfig, sharded)."""
    from bliss_tpu.config import AnalysisConfig

    cfgs = []
    for nb, fbk in ((1, "firwin"), (5, "reference5"), (36, "reference36")):
        for conv in ("split", "exact"):
            cfgs.append(
                (
                    f"bands{nb}-{conv}",
                    AnalysisConfig(
                        dtype="float32",
                        amplitude_mode="poly",
                        fused_kernel=True,
                        fused_conv=conv,
                        filterbank=fbk,
                        tempo_finish="device_exact",
                    ),
                    False,
                )
            )
    # single-pass kernel (split-only by design) at each band count
    for nb, fbk in ((1, "firwin"), (5, "reference5"), (36, "reference36")):
        cfgs.append(
            (
                f"bands{nb}-single_pass",
                AnalysisConfig(
                    dtype="float32",
                    amplitude_mode="poly",
                    fused_kernel=True,
                    single_pass=True,
                    filterbank=fbk,
                    tempo_finish="device_exact",
                ),
                False,
            )
        )
    # stft_conv="fast" (3-matmul spectrum): both kernel arrangements. The
    # default "precise" 5-matmul branch is covered by every config above.
    for sp in (False, True):
        cfgs.append(
            (
                f"bands1-stft_fast{'-single_pass' if sp else ''}",
                AnalysisConfig(
                    dtype="float32",
                    amplitude_mode="poly",
                    fused_kernel=True,
                    single_pass=sp,
                    stft_conv="fast",
                    tempo_finish="device_exact",
                ),
                False,
            )
        )
    # sharded (shard_map) two-kernel path, 1 and 5 bands
    for nb, fbk in ((1, "firwin"), (5, "reference5")):
        cfgs.append(
            (
                f"bands{nb}-sharded",
                AnalysisConfig(
                    dtype="float32",
                    amplitude_mode="poly",
                    fused_kernel=True,
                    tempo_finish="device_exact",
                    filterbank=fbk,
                ),
                True,
            )
        )
    # core + extended ROADMAP features in one program (the `scan --extended`
    # production path, analyze_batch_ext_jit) — its XLA tail (rdft matmuls,
    # mel/DCT/chroma matmuls, cumsum/argmax rolloff) only exists in this
    # variant and must compile-check on the real device like the kernels do
    cfgs.append(("bands1-extended", AnalysisConfig.for_tpu(), "extended"))
    return cfgs


def _check_extended_sanity(ext) -> None:
    """Physical-range gates on the extended tail [B, n_ext]: a compiled
    program producing finite garbage must fail the matrix. Columns per
    EXTENDED_FEATURE_NAMES: zcr, loudness_db, centroid, rolloff, flatness,
    bpm, beat_loudness, 13x mfcc, 13x mfcc_std, 12x chroma."""
    import numpy as np

    nyq = 22050 / 2
    gates = (
        ("zero_crossing_rate", ext[:, 0], 0.0, 1.0),
        ("loudness_db", ext[:, 1], -200.0, 0.0),
        ("spectral_centroid_hz", ext[:, 2], 0.0, nyq),
        ("spectral_rolloff_hz", ext[:, 3], 0.0, nyq),
        ("spectral_flatness", ext[:, 4], 0.0, 1.001),
        ("bpm", ext[:, 5], 0.0, 1000.0),
        ("chroma_sum", np.sum(ext[:, -12:], axis=1), 0.999, 1.001),
    )
    for fname, col, lo, hi in gates:
        if not ((col >= lo) & (col <= hi)).all():
            raise AssertionError(
                f"extended sanity: {fname} outside [{lo}, {hi}]: {col}"
            )


def run_smoke(time_budget_s: float = 1500.0) -> dict:
    """Compile + run each configuration on the default backend; returns
    {"ok": bool, "results": {name: "ok"|"skipped"|error}, ...}."""
    import numpy as np

    import jax

    from bliss_tpu.features import PCMBatch, analyze_batch

    B, L = 8, 1 << 17  # >= 65536 so the fused path engages; small = fast
    rng = np.random.RandomState(0)
    t = np.arange(L)
    sig = 5000 * np.sin(2 * np.pi * t * 440 / 22050) + rng.randn(L) * 500
    arrays = [
        np.clip(np.roll(sig, 131 * i), -32000, 32000).astype(np.int16)
        for i in range(B)
    ]
    batch = PCMBatch.from_arrays(arrays, [3] * B)
    batch = PCMBatch(*(jax.device_put(x) for x in batch))

    results = {}
    feats_by_name = {}
    t_start = time.time()
    ok_all = True
    for name, cfg, sharded in smoke_configs():
        if time.time() - t_start > time_budget_s:
            # a gate that did not run everything must not read green
            ok_all = False
            results[name] = "skipped (time budget) -> gate NOT green"
            continue
        t0 = time.time()
        try:
            if sharded == "extended":
                from bliss_tpu.features.analyze import analyze_batch_ext_jit

                full = np.asarray(analyze_batch_ext_jit(batch, cfg))
                if not np.isfinite(full).all():
                    raise AssertionError(f"non-finite features: {full[0]}")
                _check_extended_sanity(full[:, 4:])
                # core columns feed the bands1 consistency check below
                feats = full[:, :4]
            elif sharded:
                from bliss_tpu.parallel import analysis_mesh, analyze_sharded

                n_dev = len(jax.devices())
                mesh = analysis_mesh(
                    min(2, n_dev), 1, devices=jax.devices()[: min(2, n_dev)]
                )
                feats = np.asarray(analyze_sharded(batch, mesh, cfg))
            else:
                feats = np.asarray(
                    jax.jit(lambda b: analyze_batch(b, cfg))(batch)
                )
            if not np.isfinite(feats).all():
                raise AssertionError(f"non-finite features: {feats[0]}")
            feats_by_name[name] = feats
            results[name] = f"ok ({time.time() - t0:.0f}s)"
        except Exception as e:  # noqa: BLE001 — report every failure mode
            ok_all = False
            results[name] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"

    # consistency: configurations with the same band count must agree — a
    # kernel producing finite garbage is as broken as one failing to
    # compile. Compare every variant against its bands{N}-exact anchor (the
    # f32-matmul conv), tolerance = the documented float32 gate.
    consistency = {}
    for name, feats in feats_by_name.items():
        nb = name.split("-")[0]
        anchor = feats_by_name.get(f"{nb}-exact")
        if anchor is None or name == f"{nb}-exact":
            continue
        d = np.abs(feats - anchor).max(axis=0)  # per-feature max dev
        consistency[name] = [round(float(v), 6) for v in d]
        # amplitude/frequency/attack at the float32 gate; tempo allows the
        # epsilon-marginal beat flips the split-vs-exact conv is documented
        # to produce (docs/DESIGN.md §7) — up to 2 beat quanta at 3 s songs
        if d[1] > 2e-3 or d[2] > 2e-3 or d[3] > 2e-3 or d[0] > 2 * 4.0 / 3.0:
            ok_all = False
            results[name] += f" INCONSISTENT (dev {list(d)} vs {nb}-exact)"
    return {
        "ok": ok_all,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "results": results,
        "consistency_vs_exact": consistency,
        "elapsed_s": round(time.time() - t_start, 1),
    }


def main() -> int:
    out = run_smoke()
    print(json.dumps(out, indent=1))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
