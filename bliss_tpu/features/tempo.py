"""Tempo + attack (envelope) analyzer.

Behavioral model (reference: src/tempo_atk_sort.c:42-296, after Klapuri):
 1. Normalize the interleaved s16 stream using integer mean/variance
    (reference divides by the *variance*, not the std — replicated).
 2. 512-sample windows, hop 256; per window: 17-tap symmetric FIR with zero
    state at the window start, then the summed power spectrum of the window.
 3. Log-compress (mu=100), upsample x2 with zero stuffing, 6th-order
    Butterworth low-pass, half-wave-rectified differentiation, weighted
    envelope; attack = sum of the envelope.
 4. Two width-19 rectangular smoothings (with the reference's exact edge
    behavior), epsilon-peak count; tempo = 4*beats/duration - 30.4.

TPU-first realizations:
 - The per-window summed spectrum needs no FFT: by Parseval,
   sum_{k=0..256}|X_k|^2 = 256*sum(y^2) + ((sum y)^2 + (sum (-1)^n y)^2)/2,
   so step 2 is a 17-tap correlation plus three reductions — pure VPU work
   (tempo_energy_mode="parseval"; "fft" keeps the literal spectrum).
 - The Butterworth recurrence runs as a blocked linear recurrence on the MXU
   (dsp.iir.lfilter_blocked); "scan" selects the literal lax.scan.
 - The rectangular filter's edge quirks (slots that keep stale values of the
   output buffer, and one accumulated slot) are reproduced with index masks;
   see tests against the oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bliss_tpu import constants as C
from bliss_tpu import tables
from bliss_tpu.config import AnalysisConfig
from bliss_tpu.dsp.boxfilter import box_sum_same
from bliss_tpu.dsp.framing import frame_signal
from bliss_tpu.dsp.iir import lfilter_blocked, lfilter_scan
from bliss_tpu.dsp.intops import c_div
from bliss_tpu.features.types import PCMBatch


def band_energies(batch: PCMBatch, cfg: AnalysisConfig) -> jnp.ndarray:
    """Part 1 (the FLOP-heavy stage): per-band per-window spectral energies.

    Returns fa [B, NB, NBF] with NBF = L // hop; per song, slots past its
    nb_frames stay zero. NB = cfg.nb_bands (1 in parity mode; >1 selects the
    extended multi-band Klapuri front-end, tables.bandpass_filterbank).
    """
    dtype = cfg.jnp_dtype
    W = C.WINDOW_SIZE
    hop = C.TEMPO_HOP
    s = batch.samples.astype(jnp.int32)
    _, L = s.shape
    n = batch.n_samples

    norm = _normalize_signal(s, n, cfg)  # [B, L], zero beyond n
    fb = tables.bandpass_filterbank(cfg.nb_bands, cfg.band_taps, cfg.filterbank)

    if cfg.tempo_energy_mode == "parseval":
        energy = _window_energy_blocked(norm, fb, cfg)  # [B, NB, NW]
    else:
        frames = frame_signal(norm, W, hop)  # [B, NW, W], NW = L//hop - 1
        per_band = [
            _window_energy(_fir_per_window(frames, dtype, fb[b]), cfg)
            for b in range(fb.shape[0])
        ]
        energy = jnp.stack(per_band, axis=1)
    NW = energy.shape[-1]

    trunc_n = n - n % W
    n_windows = -((-(trunc_n - W)) // hop)  # ceil(iteration_number / hop)
    wmask = jnp.arange(NW, dtype=jnp.int32)[None, :] < n_windows[:, None]
    energy = energy * wmask[:, None, :].astype(dtype)

    # Window energies land in nb_frames slots; trailing slots stay zero
    # (reference: filtered_array is calloc'd with nb_frames entries while
    # only ~nb_frames-2 windows run).
    NBF = L // hop
    return jnp.pad(energy, ((0, 0), (0, 0), (0, NBF - NW)))


def envelope_energies(batch: PCMBatch, cfg: AnalysisConfig) -> jnp.ndarray:
    """Single-band view of band_energies ([B, NBF]) — the device half of the
    hybrid tempo path (parity configuration)."""
    if cfg.nb_bands != 1:
        raise ValueError("envelope_energies is the single-band interface")
    return band_energies(batch, cfg)[:, 0]


def _window_energy_blocked(norm: jnp.ndarray, fb, cfg: AnalysisConfig):
    """Per-window spectral energies WITHOUT materializing the overlapped
    window tensor. Returns [B, NB, NW].

    Exploits two identities:
    - Parseval: sum_{k=0..W/2} |DFT(y)_k|^2 = (W/2)*sum(y^2)
      + ((sum y)^2 + (sum (-1)^t y)^2) / 2  — no FFT.
    - The window-reset FIR equals the global causal convolution z except at
      the first taps-1 warm-up positions of each window, where it differs by
      a small matmul of the preceding history
      (tables.fir_warmup_correction).

    So the whole stage is one convolution pass over the signal per band,
    blockwise partial sums, and tiny per-window corrections — ~6x less HBM
    traffic than framing at hop 256 (which doubles the data) and no
    [B, NW, 512] intermediate.
    """
    dtype = cfg.jnp_dtype
    B, L = norm.shape
    hop = C.TEMPO_HOP
    W = C.WINDOW_SIZE
    NBF = L // hop
    NW = NBF - 1
    taps = fb.shape[1]
    K = taps - 1

    xp = jnp.pad(norm, ((0, 0), (K, 0)))
    bands = []
    for b in range(fb.shape[0]):
        z = jnp.zeros_like(norm)
        for m in range(taps):
            z = z + jnp.asarray(fb[b, m], dtype) * xp[:, K - m : K - m + L]
        bands.append(z)
    z = jnp.stack(bands, axis=1)  # [B, NB, L]

    alt = jnp.asarray(
        tables.parseval_alt_sign()[:hop], dtype
    )  # (-1)^t pattern; blocks have even offsets so one period suffices
    zb = z.reshape(B, -1, NBF, hop)
    S2 = jnp.sum(zb * zb, axis=-1)
    S1 = jnp.sum(zb, axis=-1)
    SA = jnp.sum(zb * alt, axis=-1)

    # K-sample history before each block + the block's first K z values.
    hist = jnp.pad(norm, ((0, 0), (K, 0)))[:, :L].reshape(B, NBF, hop)[:, :, :K]
    zh = zb[..., :K]
    M = jnp.asarray(
        tables.fir_warmup_correction(cfg.nb_bands, cfg.band_taps, cfg.filterbank), dtype
    )
    # HIGHEST: delta must cancel z's history tail to f32 accuracy on TPU
    # (the default f32 einsum truncates to bf16 passes; see
    # kernels/fused_all.py for the failure mode).
    delta = jnp.einsum(
        "bwk,njk->bnwj", hist, M, precision=jax.lax.Precision.HIGHEST
    )
    altK = alt[:K]
    d_s2 = jnp.sum(2.0 * zh * delta + delta * delta, axis=-1)
    d_s1 = jnp.sum(delta, axis=-1)
    d_sa = jnp.sum(delta * altK, axis=-1)

    sum_y2 = S2[..., :NW] + S2[..., 1:] + d_s2[..., :NW]
    sum_y = S1[..., :NW] + S1[..., 1:] + d_s1[..., :NW]
    sum_a = SA[..., :NW] + SA[..., 1:] + d_sa[..., :NW]
    return (W / 2) * sum_y2 + (sum_y * sum_y + sum_a * sum_a) / 2.0


def envelope_scores(
    batch: PCMBatch, cfg: AnalysisConfig
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """([B] tempo, [B] attack), float32. Fully on-device."""
    return envelope_scores_from_energies(batch, band_energies(batch, cfg), cfg)


def envelope_scores_from_energies(
    batch: PCMBatch, fa: jnp.ndarray, cfg: AnalysisConfig,
    return_aux: bool = False,
):
    """Envelope finish from precomputed band energies fa [B, NB, NBF].

    With ``return_aux`` also returns the beat-detection aux
    ``(beat, r2, peaks, mid)`` so extended features share it (one envelope
    chain per program — see beat_metrics)."""
    return envelope_finish_device(
        fa, batch.n_samples, batch.durations, cfg, return_aux=return_aux
    )


def _envelope_pipeline(fa, n, cfg):
    """Shared envelope stage: band energies -> weighted envelope.

    Returns (wa [B, NB, 2*NBF], wa_edges, ss_src, last_excluded, j, n2)."""
    dtype = cfg.jnp_dtype
    B, NB, NBF = fa.shape
    nbf = (n - n % C.WINDOW_SIZE) // C.TEMPO_HOP  # reference nb_frames

    # --- envelope: log-compress, upsample x2, low-pass, rectified diff -----
    mu = jnp.asarray(C.MU, dtype)
    comp = jnp.log(1.0 + mu * fa) / jnp.log(1.0 + mu)
    u = jnp.stack([comp, jnp.zeros_like(comp)], axis=-1).reshape(B, NB, 2 * NBF)

    if cfg.iir_mode == "blocked":
        lp = lfilter_blocked(u, block=cfg.iir_block)
    elif cfg.iir_mode == "scan":
        lp = lfilter_scan(C.BUTTER_B, C.BUTTER_A, u)
    else:
        raise ValueError(f"unknown iir_mode {cfg.iir_mode}")

    diff = jnp.concatenate(
        [lp[..., :1], jnp.maximum(lp[..., 1:] - lp[..., :-1], 0.0)], axis=-1
    )
    wa = (
        jnp.asarray(C.ENV_LP_WEIGHT, dtype) * lp
        + jnp.asarray(C.ENV_DIFF_WEIGHT, dtype) * diff / 10.0
    )  # [B, NB, 2*NBF]

    n2 = 2 * nbf  # dynamic per-song envelope length
    j = jnp.arange(2 * NBF, dtype=jnp.int32)[None, :]
    last_excluded = j <= (n2 - 2)[:, None]  # sum runs to 2*nb_frames - 2

    # The band-summed envelope is smoothed; the reference's pass-1 output
    # buffer is weighted_average[0] — BAND 0's envelope — whose stale values
    # survive at the edge slots (reference: src/tempo_atk_sort.c:267-270,
    # true for any NB_BANDS).
    wa_edges = wa[:, 0]
    ss_src = jnp.sum(wa, axis=1)
    return wa, wa_edges, ss_src, last_excluded, j, n2


def envelope_finish_device(
    fa: jnp.ndarray, n: jnp.ndarray, durations: jnp.ndarray,
    cfg: AnalysisConfig, return_aux: bool = False,
):
    """On-device envelope finish: fa [B, NB, NBF], n/durations [B] ->
    ([B] tempo, [B] attack) in float32. Shared by the single-device and
    sharded (parallel/mesh.py) paths.

    tempo_finish="device_exact" routes to the double-single implementation
    (features/tempo_exact.py) — float64-grade beat exactness with only f32
    device ops; "device" is the plain working-dtype finish (epsilon-marginal
    peaks may flip in float32).

    With ``return_aux`` also returns ``(beat, r2, peaks, mid)`` — the beat
    count, smoothed envelope, full-length peak mask and valid-range mask —
    from the SAME detection that produced the tempo score."""
    if cfg.tempo_finish == "device_exact":
        from bliss_tpu.features.tempo_exact import envelope_finish_device_exact

        return envelope_finish_device_exact(
            fa, n, durations, cfg, return_aux=return_aux
        )
    dtype = cfg.jnp_dtype
    wa, wa_edges, ss_src, last_excluded, j, n2 = _envelope_pipeline(fa, n, cfg)

    # --- attack (summed over bands, reference :246-248) --------------------
    atk_sum = jnp.sum(
        wa * last_excluded[:, None, :].astype(dtype), axis=(1, 2)
    )

    if return_aux:
        beat, (r2, peaks_inner, mid) = _count_beats(
            ss_src, wa_edges, last_excluded, j, n2, cfg, return_aux=True
        )
        # peaks from _count_beats cover r2[:, 1:-1]; pad to full length so
        # every caller sees one aux layout (matches tempo_exact's aux)
        peaks = jnp.pad(peaks_inner, ((0, 0), (1, 1)))
        aux = (beat, r2, peaks, mid)
    else:
        beat = _count_beats(ss_src, wa_edges, last_excluded, j, n2, cfg)

    dur = durations.astype(dtype)
    tempo = (
        jnp.asarray(C.TEMPO_SCALE, dtype) * beat.astype(dtype) / dur
        + jnp.asarray(C.TEMPO_BIAS, dtype)
    )
    attack = (
        jnp.asarray(C.ATTACK_SCALE, dtype) * atk_sum / n.astype(dtype)
        + jnp.asarray(C.ATTACK_BIAS, dtype)
    )
    if return_aux:
        return tempo.astype(jnp.float32), attack.astype(jnp.float32), aux
    return tempo.astype(jnp.float32), attack.astype(jnp.float32)


def _normalize_signal(s: jnp.ndarray, n: jnp.ndarray, cfg: AnalysisConfig):
    """Zero-mean, divided-by-variance signal (reference :101-114)."""
    dtype = cfg.jnp_dtype
    L = s.shape[1]
    valid = jnp.arange(L, dtype=jnp.int32)[None, :] < n[:, None]
    sv = jnp.where(valid, s, 0)
    # C accumulates the mean in (wrapping) int; int32 matches.
    mean = c_div(jnp.sum(sv, axis=1, dtype=jnp.int32), n)
    d = jnp.where(valid, s - mean[:, None], 0)
    if cfg.dtype == "float64":
        # Exact int64 variance, truncated like C (parity mode).
        var = c_div(
            jnp.sum(d.astype(jnp.int64) ** 2, axis=1), n.astype(jnp.int64)
        ).astype(dtype)
    else:
        d2 = d.astype(dtype) ** 2
        var = jnp.trunc(jnp.sum(d2, axis=1) / n.astype(dtype))
    inv = jnp.asarray(1.0 / (1 << 15), dtype)
    mean_d = mean.astype(dtype) * inv
    var_d = var * inv * inv
    norm = (s.astype(dtype) * inv - mean_d[:, None]) / var_d[:, None]
    return jnp.where(valid, norm, 0.0)


def _fir_per_window(frames: jnp.ndarray, dtype, coeffs=None) -> jnp.ndarray:
    """Causal FIR with zero state at each window start."""
    if coeffs is None:
        coeffs = C.FIR_BANDPASS
    k = len(coeffs)
    fp = jnp.pad(frames, ((0, 0), (0, 0), (k - 1, 0)))
    W = frames.shape[-1]
    y = jnp.zeros_like(frames)
    for m in range(k):
        y = y + jnp.asarray(coeffs[m], dtype) * fp[..., k - 1 - m : k - 1 - m + W]
    return y


def _window_energy(y: jnp.ndarray, cfg: AnalysisConfig) -> jnp.ndarray:
    """sum_{k=0..W/2} |DFT(y)_k|^2 per window: [B, NW, W] -> [B, NW]."""
    dtype = cfg.jnp_dtype
    if cfg.tempo_energy_mode in ("parseval", "parseval_framed"):
        alt = jnp.asarray(tables.parseval_alt_sign(), dtype)
        total = jnp.sum(y * y, axis=-1)
        dc = jnp.sum(y, axis=-1)
        nyq = jnp.sum(y * alt, axis=-1)
        return (C.WINDOW_SIZE / 2) * total + (dc * dc + nyq * nyq) / 2.0
    if cfg.tempo_energy_mode == "fft_strict":
        # Replicates the reference's accumulator exactly: a float32 running
        # sum of float64 bin powers, rounded to float32 after every add
        # (`float sum_fft += double`, reference src/tempo_atk_sort.c:142-149).
        # This is the one place the golden values depend on accumulation
        # order; with it, beat counts match the reference bit-for-bit even
        # on epsilon-marginal peaks.
        X = jnp.fft.rfft(y.astype(jnp.float64), axis=-1)
        abs2 = jnp.real(X) ** 2 + jnp.imag(X) ** 2  # [..., W//2+1] float64

        def add(acc, col):
            return (acc.astype(jnp.float64) + col).astype(jnp.float32), None

        acc0 = jnp.zeros(abs2.shape[:-1], jnp.float32)
        total, _ = jax.lax.scan(add, acc0, jnp.moveaxis(abs2, -1, 0))
        return total.astype(dtype)
    if cfg.tempo_energy_mode != "fft":
        raise ValueError(f"unknown tempo_energy_mode {cfg.tempo_energy_mode}")
    X = jnp.fft.rfft(y, axis=-1)
    return jnp.sum(
        (jnp.real(X) ** 2 + jnp.imag(X) ** 2).astype(dtype), axis=-1
    )


def _count_beats(ss_src, wa, last_excluded, j, n2, cfg, return_aux=False):
    """Two rectangular filters + epsilon peak count (reference :258-280).

    ss_src: band-summed envelope; wa: the buffer whose stale values the
    reference's in-place pass 1 leaves at the edges. With return_aux, also
    returns (r2 smoothed envelope, peak mask over r2[:,1:-1], mid-valid
    mask) for the beat-loudness / BPM extended features."""
    dtype = cfg.jnp_dtype
    width = C.RECT_FILTER_WIDTH
    n2c = n2[:, None]

    # smoothed_sum: the envelope with its final slot zeroed.
    ss = ss_src * last_excluded.astype(dtype)
    box1 = box_sum_same(ss, width)
    # Pass 1 writes box sums into slots half-1..n-half-1 of the *envelope
    # buffer itself*; slot n-half accumulates the tail sum on top of the
    # stale envelope value; remaining edge slots keep stale envelope values.
    # All slots are then divided by the width.
    half = width // 2  # 9; the reference's half_smooth_w is 10
    edge = (j <= half - 1) | (j >= n2c - half)
    r1 = jnp.where(edge, wa, jnp.where(j == n2c - half - 1, wa + box1, box1))
    r1 = r1 / width

    box2 = box_sum_same(r1, width)
    # Pass 2 runs on a zeroed output buffer: only slots 9..n-10 get values
    # (slot n-10 again via the tail-sum accumulation, which over a zeroed
    # buffer equals its centered box sum).
    mid = (j >= half) & (j <= n2c - half - 1)
    r2 = jnp.where(mid, box2 / width, 0.0)

    d_prev = r2[:, 1:-1] - r2[:, :-2]
    d_next = r2[:, 1:-1] - r2[:, 2:]
    eps = jnp.asarray(C.PEAK_EPSILON, dtype)
    inrange = j[:, 1:-1] <= (n2 - 2)[:, None]
    peaks = (d_prev > eps) & (d_next > eps) & inrange
    beat = jnp.sum(peaks, axis=1).astype(jnp.int32)
    if return_aux:
        return beat, (r2, peaks, mid)
    return beat


def beat_metrics(
    fa: jnp.ndarray, n: jnp.ndarray, durations: jnp.ndarray,
    cfg: AnalysisConfig, aux=None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Extended ROADMAP beat features from band energies fa [B, NB, NBF]:
    ([B] bpm, [B] beat_loudness), float32.

    bpm: detected beats per minute, from the same epsilon-peak detector the
    tempo score counts (reference ROADMAP.md "BPM" — the reference only ever
    exposes the affine-scaled tempo score, never the rate itself).
    beat_loudness: mean smoothed-envelope value at the detected beat
    positions relative to the mean envelope over the valid range — >1 means
    beats stand out of the envelope, ~1 a flat envelope (reference
    ROADMAP.md "Beat loudness").

    ``aux``: precomputed ``(beat, r2, peaks, mid)`` from the core finish
    (envelope_finish_device(return_aux=True)) so core + extended share one
    envelope chain. When absent it is computed here through the SAME
    cfg-selected implementation the core tempo uses — under
    tempo_finish="device_exact" a plain-f32 pipeline loses the <1e-6
    envelope precision the epsilon peak detector needs and counts beats
    the core does not (caught by the extended differential fuzz, round 4:
    bpm disagreed with the core tempo score by 1-2 beats within one
    program).
    """
    dtype = cfg.jnp_dtype
    if aux is None:
        _, _, aux = envelope_finish_device(
            fa, n, durations, cfg, return_aux=True
        )
    beat, r2, peaks, mid = aux
    bpm = 60.0 * beat.astype(dtype) / durations.astype(dtype)
    # duration<=0 songs: the CORE tempo=inf is pinned reference behavior,
    # but the extended columns are a new surface — report 0 instead of
    # poisoning z-scored clustering (radio --extended), like beat_loudness.
    # The explicit duration>0 test (not just isfinite) keeps a NEGATIVE
    # container duration at 0 too, matching beat_metrics_host.
    bpm = jnp.where(
        jnp.isfinite(bpm) & (durations.astype(dtype) > 0), bpm, 0.0
    )
    pk = peaks.astype(dtype)
    peak_mean = jnp.sum(
        jnp.where(peaks, r2, 0.0), axis=1
    ) / jnp.maximum(jnp.sum(pk, axis=1), 1.0)
    midf = mid.astype(dtype)
    env_mean = jnp.sum(jnp.where(mid, r2, 0.0), axis=1) / jnp.maximum(
        jnp.sum(midf, axis=1), 1.0
    )
    loud = peak_mean / jnp.maximum(env_mean, jnp.asarray(1e-12, dtype))
    # degenerate songs (zero variance -> NaN envelope) report 0, matching
    # their zero beat count rather than poisoning the extended row
    loud = jnp.where(jnp.isfinite(loud), loud, 0.0)
    return bpm.astype(jnp.float32), loud.astype(jnp.float32)


def _box_sum_host(x, width):
    """Centered zero-padded box sums along the last axis, vectorized over
    leading axes. scipy.ndimage's C moving average; its float64 running-sum
    drift is ~2e-14 relative (measured) — eight orders below the 1e-6
    epsilon the peak detector compares at, and the differential fuzz vs the
    reference binary stays beat-exact."""
    from scipy.ndimage import uniform_filter1d

    return uniform_filter1d(
        x, size=width, axis=-1, mode="constant", cval=0.0
    ) * width


def beat_cols_from_host_aux(aux, durations):
    """([B] bpm, [B] beat_loudness) float32 from envelope_finish_host's
    ``return_aux`` triple ``(r2, peaks, mid)`` (peaks covers r2[:, 1:-1]).
    The float64 host analog of beat_metrics(aux=...): the hybrid paths use
    it to derive the extended beat columns from the SAME host envelope
    finish that produced the core tempo score, so the two never disagree
    within a row."""
    import numpy as np

    r2, peaks, mid = aux
    dur = np.asarray(durations, np.float64)
    beat = peaks.sum(axis=1)
    bpm = 60.0 * beat / np.where(dur > 0, dur, np.inf)
    pk_vals = np.where(peaks, r2[:, 1:-1], 0.0)
    peak_mean = pk_vals.sum(axis=1) / np.maximum(beat, 1.0)
    env_mean = np.where(mid, r2, 0.0).sum(axis=1) / np.maximum(
        mid.sum(axis=1), 1.0
    )
    loud = peak_mean / np.maximum(env_mean, 1e-12)
    loud = np.where(np.isfinite(loud), loud, 0.0)
    bpm = np.where(np.isfinite(bpm), bpm, 0.0)
    return bpm.astype(np.float32), loud.astype(np.float32)


def beat_metrics_host(fa, n_samples, durations):
    """Float64 host version of beat_metrics (bpm, beat_loudness) for the
    streaming path: [*, NB, NBF] energies -> ([B] bpm, [B] beat_loudness).
    Same definitions as the device beat_metrics, computed from the float64
    envelope chain."""
    import numpy as np

    fa = np.asarray(fa, np.float64)
    if fa.ndim == 2:
        fa = fa[:, None, :]
    n = np.asarray(n_samples, np.int64)
    dur = np.asarray(durations, np.float64)
    _, _, aux = envelope_finish_host(fa, n, dur, workers=1, return_aux=True)
    return beat_cols_from_host_aux(aux, dur)


def envelope_finish_host(
    fa, n_samples, durations, workers: int | None = None, return_aux=False
):
    """Host float64 finish of the tempo path: fa [B, NBF] (or [B, NB, NBF]
    multi-band) -> (tempo, attack).

    Rows are independent, so on multi-core hosts the batch splits across a
    thread pool (numpy/scipy release the GIL on the large ops); results are
    bitwise identical to the single-threaded path. ``workers=None`` sizes
    from os.cpu_count() (1 on this sandbox host — no-op here).

    The envelope post-processing is ~0.01% of the analyzer's FLOPs but the
    reference's epsilon-peak detection (eps=1e-6 on O(10..100) envelope
    values, src/tempo_atk_sort.c:275-280) needs ~2^-27 relative precision —
    beyond float32. Since the TPU backend has no float64, the hybrid
    pipeline runs this tiny sequential stage on the host in NumPy/SciPy,
    giving exact beat-count parity while the heavy stages stay on device.
    All stages are vectorized over the batch (one scipy call each).
    """
    import os as _os

    import numpy as np
    from scipy.signal import lfilter

    fa = np.asarray(fa, np.float64)
    if fa.ndim == 2:
        fa = fa[:, None, :]
    n = np.asarray(n_samples, np.int64)
    dur = np.asarray(durations, np.float64)
    B, NB, NBF = fa.shape

    if workers is None:
        workers = min(8, _os.cpu_count() or 1)
    if workers > 1 and B >= 2 * workers:
        from concurrent.futures import ThreadPoolExecutor

        bounds = np.linspace(0, B, workers + 1, dtype=int)
        with ThreadPoolExecutor(max_workers=workers) as pool:
            parts = list(
                pool.map(
                    lambda se: envelope_finish_host(
                        fa[se[0] : se[1]], n[se[0] : se[1]],
                        dur[se[0] : se[1]], workers=1,
                        return_aux=return_aux,
                    ),
                    zip(bounds[:-1], bounds[1:]),
                )
            )
        tempo = np.concatenate([p[0] for p in parts])
        attack = np.concatenate([p[1] for p in parts])
        if return_aux:
            # aux = (r2, peaks, mid): all batch-leading, width-identical
            # across chunks (NBF is shared), so plain concatenation is
            # bitwise identical to the single-threaded aux.
            aux = tuple(
                np.concatenate([p[2][i] for p in parts]) for i in range(3)
            )
            return tempo, attack, aux
        return tempo, attack
    nbf = (n - n % C.WINDOW_SIZE) // C.TEMPO_HOP
    n2 = 2 * nbf  # [B]

    u = np.zeros((B, NB, 2 * NBF))
    u[..., 0::2] = np.log(1.0 + C.MU * fa) / np.log(1.0 + C.MU)
    lp = lfilter(C.BUTTER_B, C.BUTTER_A, u, axis=-1)
    diff = np.concatenate(
        [lp[..., :1], np.maximum(lp[..., 1:] - lp[..., :-1], 0.0)], axis=-1
    )
    wa = C.ENV_LP_WEIGHT * lp + C.ENV_DIFF_WEIGHT * diff / 10.0  # [B, NB, 2NBF]

    j = np.arange(2 * NBF)[None, :]
    last_excluded = j <= (n2 - 2)[:, None]
    atk_sum = np.sum(wa * last_excluded[:, None, :], axis=(1, 2))

    # Band-summed envelope; the pass-1 edge slots keep the stale values of
    # the output buffer — band 0's envelope for ANY band count
    # (reference: src/tempo_atk_sort.c:267-270 smooths into
    # weighted_average[0]).
    wa_edges = wa[:, 0]
    ss = np.sum(wa, axis=1) * last_excluded
    width = C.RECT_FILTER_WIDTH
    half = width // 2
    box1 = _box_sum_host(ss, width)
    n2c = n2[:, None]
    edge = (j <= half - 1) | (j >= n2c - half)
    r1 = np.where(
        edge, wa_edges, np.where(j == n2c - half - 1, wa_edges + box1, box1)
    )
    r1 = r1 / width
    box2 = _box_sum_host(r1, width)
    mid = (j >= half) & (j <= n2c - half - 1)
    r2 = np.where(mid, box2 / width, 0.0)

    d_prev = r2[:, 1:-1] - r2[:, :-2]
    d_next = r2[:, 1:-1] - r2[:, 2:]
    inrange = j[:, 1:-1] <= (n2 - 2)[:, None]
    peaks = (d_prev > C.PEAK_EPSILON) & (d_next > C.PEAK_EPSILON) & inrange
    beat = np.sum(peaks, axis=1)

    with np.errstate(divide="ignore", invalid="ignore"):
        # dur <= 0 yields inf/nan tempo — the reference's own pinned
        # behavior (beat/duration with no guard); not a numeric error.
        tempo = C.TEMPO_SCALE * beat / dur + C.TEMPO_BIAS
        attack = C.ATTACK_SCALE * atk_sum / n + C.ATTACK_BIAS
    if return_aux:
        return (
            tempo.astype(np.float32),
            attack.astype(np.float32),
            (r2, peaks, mid),
        )
    return tempo.astype(np.float32), attack.astype(np.float32)
