"""The bench flake-hardening harness: retry classification/backoff, the
per-stage checkpoint, degraded JSON assembly, and a simulated
backend-init-failure path.

Round 3's driver bench capture died with rc=1 because one device_put hit
the tunnel's UNAVAILABLE window (BENCH_r03.json); these tests pin the
round-4 guarantee that bench.py retries transient failures, resumes from
its checkpoint, and ALWAYS emits a parseable JSON line.
"""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# --- retry classification + loop -------------------------------------------


def test_retry_recovers_from_transient(bench):
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError(
                "Unable to initialize backend 'axon': UNAVAILABLE"
            )
        return "ok"

    assert bench._retry(flaky, "t", attempts=5, backoff_s=0) == "ok"
    assert len(calls) == 3


def test_retry_raises_after_exhaustion(bench):
    calls = []

    def always_down():
        calls.append(1)
        raise RuntimeError("UNAVAILABLE: tunnel")

    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench._retry(always_down, "t", attempts=3, backoff_s=0)
    assert len(calls) == 3


def test_retry_does_not_mask_real_bugs(bench):
    calls = []

    def buggy():
        calls.append(1)
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        bench._retry(buggy, "t", attempts=5, backoff_s=0)
    assert len(calls) == 1  # non-transient: no retry


def test_transient_classifier(bench):
    assert bench._is_transient(RuntimeError("UNAVAILABLE: backend"))
    assert bench._is_transient(OSError("Socket closed mid-write"))
    assert bench._is_transient(
        RuntimeError("DEADLINE_EXCEEDED: compile timed out")
    )
    assert not bench._is_transient(AssertionError("golden mismatch"))
    assert not bench._is_transient(KeyError("stage"))


# --- checkpoint --------------------------------------------------------------


def test_checkpoint_roundtrip_and_resume(bench, tmp_path):
    p = str(tmp_path / "ckpt.json")
    c1 = bench.Checkpoint(p, "sig-a")
    assert not c1.has("throughput")
    c1.put("throughput", {"songs_per_sec": 21000.0})

    # a fresh process (same signature) resumes the completed stage
    c2 = bench.Checkpoint(p, "sig-a")
    assert c2.has("throughput")
    assert c2.get("throughput") == {"songs_per_sec": 21000.0}

    # a code/param change invalidates it
    c3 = bench.Checkpoint(p, "sig-b")
    assert not c3.has("throughput")

    c2.clear()
    assert not os.path.exists(p)


def test_checkpoint_records_errors_without_masking(bench, tmp_path):
    p = str(tmp_path / "ckpt.json")
    c = bench.Checkpoint(p, "sig")
    c.put_error("e2e", RuntimeError("UNAVAILABLE"))
    assert not c.has("e2e")  # an errored stage re-runs on resume
    assert "UNAVAILABLE" in c.error("e2e")


def test_run_stage_reuses_checkpoint_and_records_failure(
    bench, tmp_path, monkeypatch
):
    monkeypatch.setenv("BENCH_RETRIES", "2")
    monkeypatch.setenv("BENCH_BACKOFF_S", "0")
    c = bench.Checkpoint(str(tmp_path / "c.json"), "s")
    calls = []

    def stage():
        calls.append(1)
        return 42

    assert bench.run_stage(c, "x", stage) == 42
    assert bench.run_stage(c, "x", stage) == 42  # checkpoint hit
    assert len(calls) == 1

    def down():
        raise RuntimeError("UNAVAILABLE")

    assert bench.run_stage(c, "y", down) is None
    assert "UNAVAILABLE" in c.error("y")


# --- simulated backend-init failure: the retry path ------------------------


def test_device_ctx_init_retries_through_unavailable_window(
    bench, monkeypatch
):
    """The exact round-3 failure: backend init raises UNAVAILABLE a few
    times, then the window clears. The acquisition path in main() —
    _retry(_ctx) — must land on the working backend."""
    attempts = []

    class FakeCtx:
        def __init__(self):
            attempts.append(1)
            if len(attempts) < 3:
                raise RuntimeError(
                    "Unable to initialize backend 'axon': UNAVAILABLE: "
                    "TPU backend setup/compile error (Unavailable)."
                )
            self.device = "TPU_0"

    monkeypatch.setattr(bench, "DeviceCtx", FakeCtx)
    monkeypatch.setattr(bench, "_CTX", None)
    ctx = bench._retry(bench._ctx, "backend acquisition", attempts=5,
                       backoff_s=0)
    assert ctx.device == "TPU_0"
    assert len(attempts) == 3
    monkeypatch.setattr(bench, "_CTX", None)


# --- degraded JSON assembly --------------------------------------------------


def test_assemble_json_degrades_without_device(bench):
    """Backend never came up: the line still parses, marked degraded."""
    out = bench.assemble_json(
        baseline={"cpu_analysis_songs_per_sec": 20.0,
                  "cpu_e2e_songs_per_sec": 18.0},
        correctness=None, throughput=None, hybrid=None, e2e=None,
        kernels=None, fuzz=None,
        errors={"backend": "RuntimeError: UNAVAILABLE"},
    )
    line = json.dumps(out)
    parsed = json.loads(line)
    assert parsed["value"] == 0.0
    assert parsed["vs_baseline"] == 0.0
    assert parsed["device"] == "unavailable"
    assert parsed["correctness_ok"] is False
    assert "backend" in parsed["errors"]


def test_assemble_json_full_run(bench):
    correctness = {
        "device_ok": True, "hybrid_ok": True, "device": "TPU_0",
        "tempo_err_device_exact": 1e-7, "max_feature_err_vs_golden": 2e-5,
        "tempo_err_hybrid": 1e-7, "max_feature_err_hybrid": 2e-5,
    }
    out = bench.assemble_json(
        baseline={"cpu_analysis_songs_per_sec": 20.0,
                  "cpu_e2e_songs_per_sec": 18.0},
        correctness=correctness,
        throughput={"per_batch_s": 0.0061, "songs_per_sec": 21000.0,
                    "batch": 128},
        hybrid={"per_batch_s": 0.09, "songs_per_sec": 1400.0},
        e2e={"songs": 10000, "songs_per_sec": 30.0,
             "warm_rescan_songs_per_sec": 4000.0, "gen_seconds": 1.0,
             "elapsed_seconds": 300.0, "decode_core_seconds": 200.0,
             "decode_s_per_song_per_core": 0.02, "stage_seconds": {},
             "_decode_s_per_song": 0.02},
        kernels={"ok": True, "results": {"k": "ok"}},
        fuzz={"divergent": 0, "cases": 16},
        errors={},
    )
    assert out["value"] == 21000.0
    assert out["vs_baseline"] == 1050.0
    assert out["correctness_ok"] is True
    assert out["kernels_ok"] is True
    assert out["e2e_vs_baseline"] == round(30.0 / 18.0, 1)
    # the projection caps at the measured device rate
    proj = out["e2e"]["projected_songs_per_sec_at_cores"]
    assert proj["8"] == 400.0 and proj["96"] == 4800.0
    json.dumps(out)  # must be serializable


def test_projection_is_reproducible_from_measured_cpu_seconds(bench):
    """VERDICT r4 item 3: the capacity projection must be a pure function
    of MEASURED CPU seconds recorded in the JSON itself —
    cores / (decode_cpu_s_per_song + host_cpu_s_per_song_non_decode),
    capped at the device rate — never wall-clock inference."""
    e2e = {
        "songs": 1000, "songs_per_sec": 30.0,
        "warm_rescan_songs_per_sec": 4000.0, "gen_seconds": 1.0,
        "elapsed_seconds": 300.0, "decode_core_seconds": 40.0,
        "decode_cpu_seconds": 25.0,
        "decode_s_per_song_per_core": 0.04,
        "decode_cpu_s_per_song": 0.025,
        "stage_seconds": {"pad": 100.0},
        # 10 s of real host CPU across the non-decode stages
        "stage_cpu_seconds": {"fingerprint": 4.0, "pad": 6.0},
        "_decode_s_per_song": 0.025,  # = CPU, not the 0.04 wall number
    }
    out = bench.assemble_json(
        baseline={"cpu_analysis_songs_per_sec": 20.0,
                  "cpu_e2e_songs_per_sec": 18.0},
        correctness={
            "device_ok": True, "hybrid_ok": True, "device": "TPU_0",
            "tempo_err_device_exact": 0.0,
            "max_feature_err_vs_golden": 0.0,
            "tempo_err_hybrid": 0.0, "max_feature_err_hybrid": 0.0,
        },
        throughput={"per_batch_s": 0.0061, "songs_per_sec": 21000.0,
                    "batch": 128},
        hybrid=None, e2e=e2e, kernels=None, fuzz=None, errors={},
        decode_model={
            "flac_compressed": {"s_per_song": 0.08, "cpu_s_per_song": 0.05,
                                "file_bytes": 1},
            "mp3": {"error": "encoder unavailable"},
        },
    )
    je = out["e2e"]
    # per-song host cost from the JSON's own fields
    cost = je["decode_cpu_s_per_song"] + je["host_cpu_s_per_song_non_decode"]
    assert je["host_cpu_s_per_song_non_decode"] == 0.01  # 10 s / 1000
    proj = je["projected_songs_per_sec_at_cores"]
    for c in (8, 32, 96):
        assert proj[str(c)] == round(min(c / cost, 21000.0), 1)
    # per-codec projection divides the codec's CPU cost + the same overhead
    codec = je["projected_songs_per_sec_at_cores_by_codec"]["flac_compressed"]
    for c in (8, 32, 96):
        assert codec[str(c)] == round(min(c / (0.05 + 0.01), 21000.0), 1)
    # the by-codec table prefers the CPU number
    assert je["decode_s_per_song_by_codec"]["flac_compressed"] == 0.05


def test_projection_prefers_process_cpu_total(bench):
    """When the e2e payload carries process_cpu_seconds (user+sys across
    ALL threads), the projection's non-decode term must be
    (process - decode) / songs — the per-thread stage sum under-counts
    work done on pool/library helper threads and is only the fallback."""
    e2e = {
        "songs": 1000, "songs_per_sec": 30.0,
        "warm_rescan_songs_per_sec": 4000.0, "gen_seconds": 1.0,
        "elapsed_seconds": 300.0, "decode_core_seconds": 40.0,
        "decode_cpu_seconds": 25.0,
        "process_cpu_seconds": 55.0,  # 25 decode + 30 everything else
        "decode_s_per_song_per_core": 0.04,
        "decode_cpu_s_per_song": 0.025,
        "stage_seconds": {"pad": 100.0},
        # deliberately smaller than the true non-decode total (a pool
        # thread burned CPU no stage clock saw): must NOT be used
        "stage_cpu_seconds": {"fingerprint": 4.0, "pad": 6.0},
        "_decode_s_per_song": 0.025,
    }
    out = bench.assemble_json(
        baseline={"cpu_analysis_songs_per_sec": 20.0,
                  "cpu_e2e_songs_per_sec": 18.0},
        correctness={
            "device_ok": True, "hybrid_ok": True, "device": "TPU_0",
            "tempo_err_device_exact": 0.0,
            "max_feature_err_vs_golden": 0.0,
            "tempo_err_hybrid": 0.0, "max_feature_err_hybrid": 0.0,
        },
        throughput={"per_batch_s": 0.0061, "songs_per_sec": 21000.0,
                    "batch": 128},
        hybrid=None, e2e=e2e, kernels=None, fuzz=None, errors={},
    )
    je = out["e2e"]
    assert je["host_cpu_s_per_song_non_decode"] == 0.03  # (55-25)/1000
    cost = 0.025 + 0.03
    proj = je["projected_songs_per_sec_at_cores"]
    for c in (8, 32, 96):
        assert proj[str(c)] == round(min(c / cost, 21000.0), 1)


def test_assemble_json_fuzz_divergence_zeroes_value(bench):
    correctness = {
        "device_ok": True, "hybrid_ok": True, "device": "TPU_0",
        "tempo_err_device_exact": 0.0, "max_feature_err_vs_golden": 0.0,
        "tempo_err_hybrid": 0.0, "max_feature_err_hybrid": 0.0,
    }
    out = bench.assemble_json(
        baseline={"cpu_analysis_songs_per_sec": 20.0,
                  "cpu_e2e_songs_per_sec": 18.0},
        correctness=correctness,
        throughput={"per_batch_s": 0.006, "songs_per_sec": 21000.0,
                    "batch": 128},
        hybrid=None, e2e=None, kernels=None,
        fuzz={"divergent": 2, "cases": 16},
        errors={},
    )
    assert out["correctness_ok"] is False
    assert out["value"] == 0.0

    # ...but a fuzz INFRA error must not zero the number
    out2 = bench.assemble_json(
        baseline={"cpu_analysis_songs_per_sec": 20.0,
                  "cpu_e2e_songs_per_sec": 18.0},
        correctness=correctness,
        throughput={"per_batch_s": 0.006, "songs_per_sec": 21000.0,
                    "batch": 128},
        hybrid=None, e2e=None, kernels=None,
        fuzz={"error": "RuntimeError: tunnel"},
        errors={"fuzz": "RuntimeError: tunnel"},
    )
    assert out2["correctness_ok"] is True
    assert out2["value"] == 21000.0


def test_assemble_json_extended_fuzz_gate(bench):
    """The extended-feature differential net gates correctness_ok the same
    way the core fuzz does: divergence zeroes the value, infra error does
    not, and the result is carried in the JSON."""
    correctness = {
        "device_ok": True, "hybrid_ok": True, "device": "TPU_0",
        "tempo_err_device_exact": 0.0, "max_feature_err_vs_golden": 0.0,
        "tempo_err_hybrid": 0.0, "max_feature_err_hybrid": 0.0,
    }
    base = dict(
        baseline={"cpu_analysis_songs_per_sec": 20.0,
                  "cpu_e2e_songs_per_sec": 18.0},
        correctness=correctness,
        throughput={"per_batch_s": 0.006, "songs_per_sec": 21000.0,
                    "batch": 128},
        hybrid=None, e2e=None, kernels=None,
        fuzz={"divergent": 0, "cases": 16},
        errors={},
    )
    out = bench.assemble_json(
        **base, ext_fuzz={"divergent": 1, "cases": 8, "mode": "extended"}
    )
    assert out["correctness_ok"] is False
    assert out["value"] == 0.0
    assert out["extended_fuzz"]["divergent"] == 1

    out2 = bench.assemble_json(
        **base, ext_fuzz={"error": "RuntimeError: tunnel"}
    )
    assert out2["correctness_ok"] is True
    assert out2["value"] == 21000.0


# --- hang hardening: attempt deadlines + global watchdog ---------------------


def test_deadline_converts_hang_to_transient(bench):
    """A device call that blocks forever must surface as a retryable
    DEADLINE_EXCEEDED instead of hanging the bench (observed on the real
    tunnel: one device touch blocked >50 min with nothing raised)."""
    import time

    def hangs():
        time.sleep(60)

    with pytest.raises(RuntimeError, match="DEADLINE_EXCEEDED"):
        bench._deadline(hangs, 0.2, "t")
    # and the raised error classifies as transient -> _retry retries it
    try:
        bench._deadline(hangs, 0.2, "t")
    except RuntimeError as e:
        assert bench._is_transient(e)


def test_deadline_passes_results_and_errors_through(bench):
    assert bench._deadline(lambda: 42, 5.0, "t") == 42
    with pytest.raises(ValueError, match="boom"):
        bench._deadline(lambda: (_ for _ in ()).throw(ValueError("boom")),
                        5.0, "t")


def test_retry_applies_attempt_deadline(bench):
    """_retry with a deadline recovers when a hang clears on a later
    attempt."""
    import time

    calls = []

    def hang_once():
        calls.append(1)
        if len(calls) == 1:
            time.sleep(60)
        return "ok"

    assert bench._retry(
        hang_once, "t", attempts=3, backoff_s=0, deadline_s=0.3
    ) == "ok"
    assert len(calls) == 2


def test_emit_json_once_is_exactly_once(bench, capsys):
    bench._EMITTED = False  # reset module state for the test
    assert bench._emit_json_once({"value": 1.0})
    assert not bench._emit_json_once({"value": 2.0})
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and json.loads(out[0])["value"] == 1.0
    bench._EMITTED = False


def test_watchdog_emits_degraded_json_from_checkpoint(bench, tmp_path,
                                                      monkeypatch, capsys):
    """If the whole bench overstays the global timeout, the watchdog prints
    a parseable degraded JSON assembled from completed stages and exits 0.
    (os._exit is stubbed; firing logic runs for real.)"""
    import time

    monkeypatch.setenv("BENCH_GLOBAL_TIMEOUT_S", "0.2")
    exited = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exited.append(code))
    bench._EMITTED = False
    ckpt = bench.Checkpoint(str(tmp_path / "ck.json"), "sig")
    ckpt.put("baseline", {"cpu_analysis_songs_per_sec": 20.0,
                          "cpu_e2e_songs_per_sec": 18.0})
    bench._start_global_watchdog(ckpt)
    deadline = time.time() + 10
    while not exited and time.time() < deadline:
        time.sleep(0.05)
    assert exited == [0]
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["value"] == 0.0 and out["device"] == "unavailable"
    assert "watchdog" in out["errors"]
    bench._EMITTED = False


def test_watchdog_disabled_by_zero(bench, monkeypatch):
    monkeypatch.setenv("BENCH_GLOBAL_TIMEOUT_S", "0")
    ckpt = bench.Checkpoint("/tmp/nonexistent-ck.json", "sig")
    bench._start_global_watchdog(ckpt)  # must return without a thread


# --- driver-kill hardening (round 5): SIGTERM flush + early emit -------------


def test_sigterm_flushes_json_from_checkpoint(bench, tmp_path):
    """The exact round-4 failure, end to end: the driver's `timeout`
    SIGTERMs a running bench while the measured number sits in the
    checkpoint. A REAL subprocess must print the assembled JSON line (with
    the checkpointed throughput) and exit 0 on SIGTERM."""
    import signal
    import subprocess
    import time

    ckpt_path = str(tmp_path / "ckpt.json")
    env = dict(os.environ)
    env.pop("BENCH_B", None)
    env.pop("BENCH_E2E_SONGS", None)
    env.pop("BENCH_FUZZ_CASES", None)
    env.pop("BENCH_EXT_FUZZ_CASES", None)
    env["BENCH_CKPT"] = ckpt_path
    env["BENCH_TEST_SLEEP_S"] = "60"
    env["BENCH_GLOBAL_TIMEOUT_S"] = "0"
    ready_file = str(tmp_path / "ready")
    env["BENCH_TEST_READY_FILE"] = ready_file

    # pre-populate the checkpoint the way the r04 run left it: baseline +
    # correctness + throughput measured, e2e still running. The signature
    # must match what the subprocess computes (same git HEAD, same env).
    sig = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "HEAD"],
        capture_output=True, text=True, timeout=10,
    ).stdout.strip()
    params = {k: None for k in (
        "BENCH_B", "BENCH_E2E_SONGS", "BENCH_FUZZ_CASES",
        "BENCH_EXT_FUZZ_CASES",
    )}
    ck = bench.Checkpoint(ckpt_path, f"{sig}|{params}")
    ck.put("baseline", {"cpu_analysis_songs_per_sec": 20.0,
                        "cpu_e2e_songs_per_sec": 18.0})
    ck.put("correctness", {
        "device_ok": True, "hybrid_ok": True, "device": "TPU_0",
        "tempo_err_device_exact": 0.0, "max_feature_err_vs_golden": 2e-5,
        "tempo_err_hybrid": 0.0, "max_feature_err_hybrid": 2e-5,
    })
    ck.put("throughput", {"per_batch_s": 0.0061, "songs_per_sec": 21164.0,
                          "batch": 128})

    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py")],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
    )
    try:
        # handshake, not a fixed sleep: interpreter startup alone can take
        # >2 s on a loaded 1-core host, and SIGTERM before the handler is
        # installed dies with the default disposition (rc=-15)
        deadline = time.time() + 60
        while not os.path.exists(ready_file):
            assert proc.poll() is None, "bench exited before ready"
            assert time.time() < deadline, "bench never reached test hook"
            time.sleep(0.1)
        proc.send_signal(signal.SIGTERM)
        stdout, stderr = proc.communicate(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()

    assert proc.returncode == 0, f"rc={proc.returncode}, stderr={stderr}"
    lines = [ln for ln in stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON on stdout; stderr={stderr}"
    out = json.loads(lines[-1])
    assert out["value"] == 21164.0
    assert out["correctness_ok"] is True
    assert "signal" in out["errors"]


def test_e2e_song_count_scales_to_wall_budget(bench, monkeypatch):
    monkeypatch.delenv("BENCH_E2E_SONGS", raising=False)
    monkeypatch.setenv("BENCH_WALL_BUDGET_S", "2700")
    monkeypatch.setenv("BENCH_E2E_S_PER_SONG", "0.15")
    # plenty of budget left -> capped at the full 10k library
    assert bench._e2e_song_count(elapsed_s=0) == 10000
    # 600 s elapsed -> (2700-600)/0.15 = 14000 -> still capped
    assert bench._e2e_song_count(elapsed_s=600) == 10000
    # 2400 s elapsed -> 2000 songs
    assert bench._e2e_song_count(elapsed_s=2400) == 2000
    # over budget -> the 500-song floor (an e2e number still lands)
    assert bench._e2e_song_count(elapsed_s=3000) == 500
    # explicit override wins
    monkeypatch.setenv("BENCH_E2E_SONGS", "1234")
    assert bench._e2e_song_count(elapsed_s=3000) == 1234


def test_emit_json_prints_unconditionally_then_blocks_emergency(bench,
                                                                capsys):
    """The normal flow prints the headline line, then the enriched re-emit;
    after either, the emergency paths (_emit_json_once) must be no-ops."""
    bench._EMITTED = False
    bench._emit_json({"value": 1.0, "pending": ["e2e"]})
    bench._emit_json({"value": 2.0})
    assert not bench._emit_json_once({"value": 3.0})
    lines = capsys.readouterr().out.strip().splitlines()
    assert [json.loads(x)["value"] for x in lines] == [1.0, 2.0]
    bench._EMITTED = False


def test_make_library_reuses_larger_generation(tmp_path):
    """A wall-budget-scaled bench must reuse the 10k library a previous run
    generated: the first n files of an m>=n generation are byte-identical
    to an n generation (single sequential RNG stream), so the larger
    marker satisfies the smaller request with zero regeneration."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from gen_library import make_library

    d = str(tmp_path / "lib")
    big = make_library(d, 6, seconds=1, seed=7)
    small_bytes = [open(p, "rb").read() for p in big[:3]]
    mtimes = [os.path.getmtime(p) for p in big[:3]]

    small = make_library(d, 3, seconds=1, seed=7)
    assert small == big[:3]
    assert [os.path.getmtime(p) for p in small] == mtimes  # no rewrite
    # and a fresh small generation elsewhere is byte-identical (prefix
    # property of the sequential RNG stream)
    d2 = str(tmp_path / "lib2")
    fresh = make_library(d2, 3, seconds=1, seed=7)
    assert [open(p, "rb").read() for p in fresh] == small_bytes
