"""The batch analysis pipeline: audio files -> force vectors, at scale.

This is the production path that turns the reference's one-song-at-a-time
`bl_analyze` (and its Python examples' sequential scan loops,
reference: python/examples/make_m3u_playlist.py:50-59) into a pipelined
host->device system:

  [host threads]  decode + canonicalize PCM  (libav, GIL released)
        v  bounded prefetch
  [host]          bucket into fixed (batch, length) shapes  (stable jit keys)
        v  async dispatch
  [TPU]           fused batched analyzers   (one jitted program per bucket)
        v
  [host]          float64 envelope finish, feature store, progress

Per-song failure isolation: an undecodable file yields a NaN feature row and
an entry in ScanResult.errors instead of aborting the batch (the batch
analog of the reference GUI's skip-bad-files behavior). With a FeatureStore,
already-analyzed files (by content fingerprint) are skipped — resumable
library scans.
"""

from __future__ import annotations

import dataclasses
import hashlib
import math
import os

import numpy as np

from bliss_tpu.config import AnalysisConfig
from bliss_tpu.features import PCMBatch
from bliss_tpu.features.streaming import (
    DEFAULT_CHUNK,
    analyze_song_streaming,
    streaming_supports,
)
from bliss_tpu.io import iter_decode
from bliss_tpu.store.feature_store import FeatureStore
from bliss_tpu.utils import StageTimer, get_logger, log_event

logger = get_logger("bliss_tpu.pipeline")

# Songs longer than this (interleaved samples, ~3 min) route through the
# chunked streaming path by default. Single source of truth — api.py
# re-exports it for the Song API's identical routing decision.
LONG_SONG_SAMPLES = 1 << 23


@dataclasses.dataclass
class ScanResult:
    files: list[str]
    features: np.ndarray  # [N, 4] float32; NaN rows for failed songs
    ok: np.ndarray  # [N] bool
    errors: dict[str, str]
    stats: dict
    extended: np.ndarray | None = None  # [N, len(EXTENDED_FEATURE_NAMES)]

    def force(self) -> np.ndarray:
        t, a, f, k = (self.features[:, i] for i in range(4))
        return np.maximum(t, 0) + a + f + np.maximum(k, 0)


def _dispatch_analysis(batch: PCMBatch, cfg, mesh, extended: bool = False):
    """Start device analysis for a batch; returns a callable that blocks and
    yields the [B, 4(+ext)] float32 features (the async half). Every branch
    runs core + extended in ONE jitted program sharing the band-energy
    pass."""
    if mesh is not None:
        from bliss_tpu.parallel import analyze_sharded_async

        # extended features compute SHARDED inside the same SPMD program
        return analyze_sharded_async(batch, mesh, cfg, extended=extended)
    if cfg.tempo_finish == "host":
        from bliss_tpu.features.analyze import (
            _device_stage_packed,
            _unpack_stage,
        )
        from bliss_tpu.features.tempo import envelope_finish_host

        # one jitted program (core + extended share the band-energy pass),
        # one packed output array = one device->host fetch per batch
        fut = _device_stage_packed(batch, cfg, extended)
        L = batch.samples.shape[1]

        def finish():
            amp, freq, fa, ext = _unpack_stage(
                np.asarray(fut), cfg, L, extended
            )
            n_np = np.asarray(batch.n_samples)
            d_np = np.asarray(batch.durations)
            if not extended:
                tempo, attack = envelope_finish_host(fa, n_np, d_np)
                return np.stack([tempo, amp, freq, attack], axis=1)
            # overwrite the device-f32 beat columns from the SAME float64
            # envelope finish as the core tempo — extended bpm/beat_loudness
            # must agree with the tempo score in every row
            from bliss_tpu.features.extended import EXTENDED_FEATURE_NAMES
            from bliss_tpu.features.tempo import beat_cols_from_host_aux

            tempo, attack, aux = envelope_finish_host(
                fa, n_np, d_np, return_aux=True
            )
            bpm, loud = beat_cols_from_host_aux(aux, d_np)
            ext = np.array(ext, np.float32, copy=True)
            ext[:, EXTENDED_FEATURE_NAMES.index("bpm")] = bpm
            ext[:, EXTENDED_FEATURE_NAMES.index("beat_loudness")] = loud
            core = np.stack([tempo, amp, freq, attack], axis=1)
            return np.concatenate([core, ext], axis=1)

        return finish
    if extended:
        # one jitted program: core (device finish) + extended share the
        # band-energy pass
        from bliss_tpu.features.analyze import analyze_batch_ext_jit

        fut = analyze_batch_ext_jit(batch, cfg)
        return lambda: np.asarray(fut)
    from bliss_tpu.features import analyze_batch_jit

    fut = analyze_batch_jit(batch, cfg)
    return lambda: np.asarray(fut)


def _bucket_length(n: int, pad_multiple: int) -> int:
    """Quantize padded lengths to sqrt(2)-spaced buckets so the number of
    distinct compiled shapes stays O(log(max_len)) across a library."""
    n = max(n, pad_multiple)
    exact = max(2 * pad_multiple, 1 << math.ceil(math.log2(n)))
    half = exact // 2 + exact // 4  # 0.75 * exact, between the powers of two
    cand = half if n <= half else exact
    return ((cand + pad_multiple - 1) // pad_multiple) * pad_multiple


def analyze_library(
    files: list[str],
    *,
    cfg: AnalysisConfig | None = None,
    batch_size: int = 64,
    store: FeatureStore | None = None,
    mesh=None,
    num_decode_workers: int | None = None,
    progress=None,
    extended: bool = False,
    cancel=None,
    handle_sigint: bool = True,
    long_song_samples: int | None = LONG_SONG_SAMPLES,
) -> ScanResult:
    """Analyze a library of audio files; returns features in input order.

    Songs longer than ``long_song_samples`` interleaved samples (~3 min at
    the default 2^23; a routing threshold only — the streamed chunk size
    is the fixed features/streaming.DEFAULT_CHUNK) are analyzed via the
    chunked streaming path: fixed compiled shapes regardless of length, so
    an 11-minute song no longer costs its own giant-shape compile; extended
    features stream too, and meshed scans route their long songs the same
    way (the mesh keeps serving the normal-length batches; a streamed song
    runs single-device chunks). Every analysis mode streams — including
    the strict/literal-fft parity modes (their sequential accumulation
    orders decompose over in-order chunks; features/streaming.py). Pass
    ``long_song_samples=None`` to force the whole-shape path always.

    progress: optional callback (done, total, message). With
    ``extended=True`` the ROADMAP feature set (zcr, loudness, spectral
    moments, MFCC stats) is computed in the same device pass and returned in
    ScanResult.extended; store entries then carry the concatenated vector.

    Cancellation (the batch analog of the reference GUI's worker-thread
    cancel Event, reference python/examples/analyze_gui.py:51-58): pass a
    ``cancel`` threading.Event, or — when running on the main thread with
    ``handle_sigint`` — press Ctrl-C once. Either way the scan stops taking
    new work, DRAINS the in-flight device batches, flushes the store, and
    returns the partial ScanResult with ``stats["cancelled"] = True``; a
    re-run with the same store resumes losslessly. A second Ctrl-C raises
    KeyboardInterrupt immediately.
    """
    from bliss_tpu.features import EXTENDED_FEATURE_NAMES

    if cfg is None:
        from bliss_tpu.api import default_config

        cfg = default_config()
    timer = StageTimer()
    # process-wide CPU (user+sys, ALL threads incl. decode workers, the
    # finalize pool, and any library-internal helpers): the one number
    # per-thread clocks cannot undercount — the robust total for capacity
    # projections (per-thread stage cpu_seconds give the breakdown)
    import resource as _resource

    _ru0 = _resource.getrusage(_resource.RUSAGE_SELF)
    n_total = len(files)
    n_ext = len(EXTENDED_FEATURE_NAMES) if extended else 0
    width = 4 + n_ext
    features = np.full((n_total, 4), np.nan, np.float32)
    ext_features = (
        np.full((n_total, n_ext), np.nan, np.float32) if extended else None
    )
    ok = np.zeros(n_total, bool)
    errors: dict[str, str] = {}
    done = 0

    def _progress(msg):
        if progress:
            progress(done, n_total, msg)

    # --- feature-store lookups (resume) -------------------------------------
    # Entries are keyed by (content fingerprint, analysis config): a scan
    # with a different filterbank/dtype/kernel path must re-analyze rather
    # than silently reuse vectors from another configuration — even
    # "equivalent" float32 paths can flip an epsilon-marginal beat. Only
    # pad_multiple is excluded (padding invariance is exact, tested).
    cfg_fields = dataclasses.asdict(cfg)
    cfg_fields.pop("pad_multiple", None)
    cfg_key = hashlib.sha1(repr(sorted(cfg_fields.items())).encode()).hexdigest()[:8]

    todo: list[int] = []
    fps: dict[int, str] = {}
    if store is not None:
        with timer.stage("fingerprint"):
            for i, f in enumerate(files):
                try:
                    # stat-prescreened: unchanged files (size+mtime) reuse
                    # their cached content hash without re-reading bytes
                    fp = store.fingerprint(f) + "-" + cfg_key
                except OSError as e:
                    errors[f] = f"stat/read failed: {e}"
                    continue
                fps[i] = fp
                cached = store.get(fp)
                if cached is not None and cached.shape[0] == width:
                    features[i] = cached[:4]
                    if extended:
                        ext_features[i] = cached[4:]
                    ok[i] = True
                else:
                    todo.append(i)
        done = int(ok.sum())
        log_event(
            logger, "store lookup", cached=done, todo=len(todo), total=n_total
        )
    else:
        todo = [i for i, f in enumerate(files) if f not in errors]

    # --- decode stream -> buckets -> device ---------------------------------
    # Device work is dispatched asynchronously: up to `max_in_flight` batches
    # compute/transfer while host threads keep decoding. The blocking half
    # (device fetch + host envelope finish) runs on a background thread so
    # the decode stream never stalls behind a device wait.
    from concurrent.futures import ThreadPoolExecutor

    buckets: dict[int, list] = {}
    in_flight: list = []  # (entries, L, Future[features])
    max_in_flight = 2
    finalize_pool = ThreadPoolExecutor(max_workers=1)

    def dispatch_bucket(L: int, entries: list) -> None:
        pad = batch_size - len(entries)
        arrays = [d.samples for _, d in entries]
        durs = [d.duration for _, d in entries]
        if pad:
            arrays += [np.zeros(1024, np.int16)] * pad
            # dummy rows: a blip avoids degenerate all-zero songs
            for a in arrays[len(entries):]:
                a[100] = 1000
            durs += [1] * pad
        with timer.stage("pad"):
            # np.zeros + row copy, deliberately. The "obvious" win —
            # np.empty + per-row fill + tail zero, writing each byte once —
            # measures ~45% faster in steady-state microbenchmarks but has
            # a catastrophic first-call mode on fresh mmap'd pages (12 s
            # for one 128 MB batch on this VM vs 0.1 s; huge-page/host
            # allocation stalls when every page is dirtied sequentially).
            # zeros() never touches the tail pages beyond each row's PCM,
            # so it faults less and is consistently fast. Negative result
            # recorded so it isn't retried.
            samples = np.zeros((batch_size, L), np.int16)
            for r, a in enumerate(arrays):
                samples[r, : a.shape[0]] = a
            batch = PCMBatch(
                samples,
                np.array([a.shape[0] for a in arrays], np.int32),
                np.array(durs, np.int32),
            )
        with timer.stage("device_dispatch"):
            fin = _dispatch_analysis(batch, cfg, mesh, extended)

        def timed_fin(fin=fin):
            # time INSIDE the pool thread: thread_time() from the main
            # thread would charge ~0 CPU to the finalize stage (the fetch
            # copy and any float64 host finish burn their CPU here, not
            # in the fut.result() wait)
            with timer.stage("device_finalize"):
                return fin()

        in_flight.append((entries, L, finalize_pool.submit(timed_fin)))
        while len(in_flight) > max_in_flight:
            finalize_oldest()

    def finalize_oldest() -> None:
        nonlocal done
        entries, L, fut = in_flight.pop(0)
        with timer.stage("finalize_wait"):
            # main-thread wait (wall only meaningful; its cpu_seconds ~ 0
            # by construction — the work is timed in the pool thread)
            feats = fut.result()
        for (i, d), row in zip(entries, feats):
            features[i] = row[:4]
            if extended:
                ext_features[i] = row[4:]
            ok[i] = True
            done += 1
            if store is not None and i in fps:
                store.put(
                    fps[i],
                    row,
                    {
                        "filename": files[i],
                        "title": d.title,
                        "artist": d.artist,
                        "album": d.album,
                        "genre": d.genre,
                        "tracknumber": d.tracknumber,
                    },
                )
        if store is not None:
            with timer.stage("store_flush"):
                store.flush()
        _progress(f"analyzed batch of {len(entries)} (L={L})")

    # --- cancellation: Ctrl-C (main thread) or a caller-supplied Event ------
    import signal
    import threading

    sigint_seen = threading.Event()
    prev_handler = None
    handler_installed = False  # signal.signal can RETURN None (handler
    # installed outside Python), so track installation separately to
    # restore unconditionally

    def _on_sigint(signum, frame):
        if sigint_seen.is_set():  # second Ctrl-C: abort for real
            raise KeyboardInterrupt
        sigint_seen.set()
        _progress("cancelling: draining in-flight batches (Ctrl-C again to abort)")

    def _cancelled() -> bool:
        return sigint_seen.is_set() or (cancel is not None and cancel.is_set())

    if handle_sigint and threading.current_thread() is threading.main_thread():
        prev_handler = signal.signal(signal.SIGINT, _on_sigint)
        handler_installed = True

    try:
        with timer.stage("scan"):
            # keep ~one batch of decoded songs in flight so device waits
            # never starve the decoders (iter_decode's window is
            # workers * prefetch, so divide by the EFFECTIVE worker count
            # or a many-core host would buffer workers * batch_size songs)
            eff_workers = num_decode_workers or min(32, (os.cpu_count() or 8))
            decode_perf: dict = {}
            stream = iter_decode(
                [files[i] for i in todo],
                num_workers=num_decode_workers,
                prefetch=max(2, batch_size // eff_workers),
                on_error="skip",
                perf=decode_perf,
            )
            for j, (fname, decoded) in zip(todo, stream):
                if _cancelled():
                    break
                if decoded is None:
                    errors[files[j]] = "decode failed"
                    done += 1
                    _progress(f"skipped {files[j]}")
                    continue
                if (
                    long_song_samples is not None
                    and decoded.n_samples > long_song_samples
                    and streaming_supports(cfg)
                ):
                    # chunked streaming on the shared finalize thread so the
                    # decode stream and batch overlap keep flowing; the
                    # result rides the normal in_flight/finalize_oldest path
                    def _stream_one(d=decoded):
                        with timer.stage("streaming"):
                            return analyze_song_streaming(
                                np.asarray(d.samples),
                                d.duration,
                                cfg,
                                chunk_samples=DEFAULT_CHUNK,
                                extended=extended,
                            )[None, :]

                    in_flight.append(
                        (
                            [(j, decoded)],
                            "stream",
                            finalize_pool.submit(_stream_one),
                        )
                    )
                    while len(in_flight) > max_in_flight:
                        finalize_oldest()
                    continue
                L = _bucket_length(decoded.n_samples, cfg.pad_multiple)
                buckets.setdefault(L, []).append((j, decoded))
                if len(buckets[L]) == batch_size:
                    dispatch_bucket(L, buckets.pop(L))
            if not _cancelled():
                for L in sorted(buckets):
                    dispatch_bucket(L, buckets.pop(L))
            else:
                # decoded-but-undispatched songs are dropped; they resume
                # from the store on the next run
                buckets.clear()
            while in_flight:
                finalize_oldest()
    finally:
        if handler_installed:
            signal.signal(
                signal.SIGINT,
                prev_handler if prev_handler is not None else signal.SIG_DFL,
            )
        finalize_pool.shutdown(wait=False)
        if store is not None:
            store.flush()

    stats = timer.report()
    stats["errors"] = len(errors)
    stats["cancelled"] = _cancelled()
    # summed per-file decode wall time across worker threads (core-seconds)
    stats["decode_core_seconds"] = round(
        decode_perf.get("decode_seconds", 0.0), 4
    )
    # summed per-file thread CPU time: what the decode actually COSTS in
    # core-seconds, independent of scheduler contention — capacity
    # projections must divide this, not wall (on a 1-core host the wall
    # number absorbs time spent descheduled behind the pad/dispatch work)
    stats["decode_cpu_seconds"] = round(
        decode_perf.get("decode_cpu_seconds", 0.0), 4
    )
    stats["decoded"] = decode_perf.get("decoded", 0)
    _ru1 = _resource.getrusage(_resource.RUSAGE_SELF)
    stats["scan_process_cpu_seconds"] = round(
        (_ru1.ru_utime - _ru0.ru_utime) + (_ru1.ru_stime - _ru0.ru_stime), 4
    )
    log_event(logger, "scan complete", total=n_total, ok=int(ok.sum()), **{
        k: v["seconds"] for k, v in timer.report().items()
    })
    return ScanResult(list(files), features, ok, errors, stats, ext_features)
