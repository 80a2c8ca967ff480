"""Chunked analysis for arbitrarily long songs with O(1) compiled shapes.

The reference streams any song length through constant-state loops
(reference: src/tempo_atk_sort.c:117-154, src/decode.c:352-374). The
whole-shape TPU path instead pads each song to a bucketed length and
compiles per bucket — fine up to a few minutes of audio, but an 11-minute
song (L~29M interleaved samples) is its own giant shape costing a fresh
multi-minute compile through this sandbox's tunnel (CLAUDE.md).

This module runs the same analysis over FIXED-SIZE chunks with carried
state, so one compiled (chunk) shape serves every song length:

- pass 1 (one chunked sweep): amplitude weighted-dot partials + global
  trim bounds, frequency power-spectrum accumulation, and the tempo
  normalization sums. The C-exact integer statistics stream losslessly:
  the wrapping int32 sum is order-independent (mod 2^32), and the exact
  int64 sums of s and s^2 are reassembled on the host from per-256-sample
  int32 sub-block sums (bounded by 2^23/2^24 — no device int64 needed),
  with the variance recovered exactly via
  sum((s-mean)^2) = sum(s^2) - 2*mean*sum(s) + n*mean^2 (int64 identity,
  valid for ANY constant mean, including C's wrapped int mean).
- pass 2 (second chunked sweep, after mean/var are known): the blockwise
  Parseval window energies. Each chunk is given a (taps-1)-sample history
  prefix and a hop-sample lookahead, which makes every window's energy
  computable entirely inside one chunk — the global convolution values are
  bit-identical to the whole-shape program because the FIR is causal with
  reach taps-1.
- finish: the assembled [NB, NBF] energies (tiny — L/256 floats) run
  through the float64 host envelope finish, i.e. exact beat counts.

The amplitude trim is handled by summing over ALL valid samples and then
subtracting weight(0) times the count of trimmed leading/trailing zeros
(the trimmed samples are zeros by definition, so their total contribution
is exactly that).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from bliss_tpu import constants as C
from bliss_tpu import tables
from bliss_tpu.config import AnalysisConfig
from bliss_tpu.dsp.intops import c_div

# Default chunk: 2^22 interleaved samples (~95 s of stereo audio, 8 MB).
DEFAULT_CHUNK = 1 << 22

_SUB = 256  # sub-block for exact integer partial sums


def streaming_supports(cfg: AnalysisConfig) -> bool:
    """Whether a config's semantics are reproducible chunk-by-chunk.

    Every mode streams (so this returns True; it remains the pipeline's
    routing hook). The strict parity modes pin whole-shape SEQUENTIAL
    accumulation orders, but those orders are chunk-decomposable too:
    frequency's strict float32 running sum carries across in-order chunks
    (masked tail frames add exact +0.0 no-ops), the iterative amplitude's
    301 smoothing passes run on the assembled length-independent cropped
    histogram, and fft/fft_strict tempo windows are window-reset FIRs
    whose strict order is over BINS WITHIN a window — windows never cross
    state, so they compute chunk-locally with a one-hop lookahead."""
    return True


@functools.partial(jax.jit, static_argnames=("cfg", "extended"))
def _pass1_chunk(
    chunk: jnp.ndarray,
    base: jnp.ndarray,
    n: jnp.ndarray,
    freq_acc: jnp.ndarray,
    cfg: AnalysisConfig,
    extended: bool = False,
):
    """One [CH] int16 chunk -> dict of streaming partials (see module
    docstring).

    base: global index of chunk[0]; n: song's true sample count.
    freq_acc: the carried [W//2+1] float32 strict-frequency running sum
    (threaded through and returned updated when cfg.strict_accumulation;
    ignored otherwise). With ``extended``, also returns the
    ROADMAP-feature partials (RMS sum, zero-cross flips, per-frame
    rolloff/flatness/MFCC accumulations) — everything else the extended
    set needs is host-derivable from the accumulated full spectrum.
    """
    dtype = cfg.jnp_dtype
    CH = chunk.shape[0]
    s = chunk.astype(jnp.int32)
    gidx = base + jnp.arange(CH, dtype=jnp.int32)
    valid = gidx < n
    sv = jnp.where(valid, s, 0)
    out: dict = {}

    # --- amplitude partials ------------------------------------------------
    if cfg.amplitude_mode == "iterative":
        # exact cropped histogram counts; trimmed zeros are subtracted from
        # the zero bin on the host (they are zeros by definition), and the
        # 301 smoothing passes run once on the assembled total
        from bliss_tpu.features.amplitude import hist_crop_counts

        out["amp_hist"] = hist_crop_counts(sv[None], valid[None])[0]
    else:
        if cfg.amplitude_mode == "table":
            w = jnp.asarray(tables.amplitude_weight_table(), dtype)
            wv = jnp.take(w, s + (1 << 15), axis=0)
        else:  # poly (gather-free), shared with features/amplitude.py
            from bliss_tpu.features.amplitude import poly_weight

            wv = poly_weight(s.astype(dtype), dtype)
        out["amp_dot"] = jnp.sum(wv * valid.astype(dtype))

    nz = (sv != 0) & valid
    any_nz = jnp.any(nz)
    out["first"] = jnp.where(
        any_nz, base + jnp.argmax(nz).astype(jnp.int32), jnp.int32(2**31 - 1)
    )
    out["last"] = jnp.where(
        any_nz,
        base + CH - 1 - jnp.argmax(nz[::-1]).astype(jnp.int32),
        jnp.int32(-1),
    )

    # --- tempo normalization partials --------------------------------------
    out["sum_wrap"] = jnp.sum(sv, dtype=jnp.int32)  # wrapping mod 2^32
    sub = sv.reshape(CH // _SUB, _SUB)
    out["sub_s"] = jnp.sum(sub, axis=1, dtype=jnp.int32)  # |.| <= 2^23
    s2 = sv * sv  # <= 2^30, exact int32
    out["sub_lo"] = jnp.sum(
        (s2 & 0xFFFF).reshape(CH // _SUB, _SUB), axis=1, dtype=jnp.int32
    )  # <= 2^24
    out["sub_hi"] = jnp.sum(
        (s2 >> 16).reshape(CH // _SUB, _SUB), axis=1, dtype=jnp.int32
    )  # <= 2^22

    # --- frequency power accumulation (FULL spectrum; the core score
    # zeroes the Nyquist bin host-side, which equals the whole-shape
    # zero-column DFT because power accumulates per-bin) ---------------------
    W = C.WINDOW_SIZE
    fpc = CH // (W * C.CHANNELS)
    fr = chunk.reshape(fpc, W, C.CHANNELS).astype(jnp.int32)
    mono = c_div(fr[..., 0] + fr[..., 1], 2)
    hann = jnp.asarray(tables.hann_window(), dtype)
    x = mono.astype(dtype) * hann
    n_frames = (n // C.CHANNELS) // W
    gframe = base // (W * C.CHANNELS) + jnp.arange(fpc, dtype=jnp.int32)
    fmask = gframe < n_frames
    x = x * fmask[:, None].astype(dtype)
    hp = jax.lax.Precision.HIGHEST
    if cfg.spectrum_mode == "fft":
        X = jnp.fft.rfft(x, axis=-1)
        re = jnp.real(X).astype(dtype)
        im = jnp.imag(X).astype(dtype)
        # same literal-op semantics as frequency.py's fft branch (the
        # reference never accumulates the Nyquist bin)
        re = re.at[..., -1].set(0.0)
        im = im.at[..., -1].set(0.0)
    else:
        dre, dim = tables.rdft_matrices()
        re = jnp.matmul(x, jnp.asarray(dre, dtype), precision=hp)
        im = jnp.matmul(x, jnp.asarray(dim, dtype), precision=hp)
    pframe = re * re + im * im  # [fpc, W//2+1]
    if cfg.strict_accumulation:
        # the reference's float32 running sum over frames, continued
        # across chunks: rounding after every add, frames in global order
        # (masked tail frames contribute exact +0.0 no-ops)
        raw = (re.astype(jnp.float32) ** 2 + im.astype(jnp.float32) ** 2)

        def add(acc, frame):
            return acc + frame, None

        out["freq_acc"], _ = jax.lax.scan(add, freq_acc, raw)
    else:
        out["power"] = jnp.sum(pframe, axis=0)  # [W//2+1]

    if not extended:
        return out

    # --- extended-feature partials (mirrors features/extended.py) -----------
    sumsq = jnp.sum((sv.astype(dtype) / 32768.0) ** 2)
    monov = jnp.where(
        (base // 2 + jnp.arange(CH // 2, dtype=jnp.int32)) < n // 2,
        c_div(
            chunk.reshape(CH // 2, 2)[:, 0].astype(jnp.int32)
            + chunk.reshape(CH // 2, 2)[:, 1].astype(jnp.int32),
            2,
        ),
        0,
    )
    mvalid = (base // 2 + jnp.arange(CH // 2, dtype=jnp.int32)) < n // 2
    sign = jnp.where(monov >= 0, 1, -1)
    flips = jnp.sum(
        ((sign[1:] != sign[:-1]) & mvalid[1:] & mvalid[:-1]).astype(jnp.int32)
    )

    bin_hz = jnp.asarray(np.arange(W // 2 + 1) * C.SAMPLE_RATE / W, dtype)
    frame_energy = jnp.sum(pframe, axis=-1)  # [fpc]
    fe = jnp.maximum(frame_energy, 1e-12)[:, None]
    csum = jnp.cumsum(pframe, axis=-1)
    roll_idx = jnp.argmax(csum >= 0.95 * fe, axis=-1)
    roll_num = jnp.sum(jnp.take(bin_hz, roll_idx) * frame_energy)

    eps = jnp.asarray(1e-12, dtype)
    nb = pframe.shape[-1]
    log_gm = jnp.sum(jnp.log(pframe + eps), axis=-1) / nb
    flat_f = jnp.exp(log_gm) / jnp.maximum(frame_energy / nb, 1e-12)
    flat_num = jnp.sum(flat_f * frame_energy)

    from bliss_tpu.features.extended import dct_ii_matrix, mel_filterbank

    mel = jnp.matmul(pframe, jnp.asarray(mel_filterbank(), dtype), precision=hp)
    mfcc = jnp.matmul(
        jnp.log(mel + eps), jnp.asarray(dct_ii_matrix(), dtype), precision=hp
    )  # [fpc, 13]
    fm = fmask.astype(dtype)[:, None]
    out.update(
        sumsq=sumsq,
        flips=flips,
        roll_num=roll_num,
        flat_num=flat_num,
        mfcc_sum=jnp.sum(mfcc * fm, axis=0),
        mfcc_sq=jnp.sum(mfcc * mfcc * fm, axis=0),
    )
    return out


def _normalized_seg(s, valid, mean, var, dtype):
    """(s/2^15 - mean/2^15) / (var/2^30), zeroed outside the song — the
    whole-shape _normalize_signal's scaling, shared by both pass-2
    kernels."""
    inv = jnp.asarray(1.0 / (1 << 15), dtype)
    mean_d = mean.astype(dtype) * inv
    var_d = var.astype(dtype) * inv * inv
    norm = (s.astype(dtype) * inv - mean_d) / var_d
    return jnp.where(valid, norm, 0.0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _pass2_chunk(
    seg: jnp.ndarray,
    base: jnp.ndarray,
    n: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    cfg: AnalysisConfig,
):
    """Window energies for one chunk: seg = [K history | CH payload | hop
    lookahead] int16 -> [NB, CH//hop] energies, bit-matching the
    whole-shape blocked Parseval program on the same samples."""
    dtype = cfg.jnp_dtype
    K = cfg.band_taps - 1
    hop = C.TEMPO_HOP
    W = C.WINDOW_SIZE
    CH = seg.shape[0] - K - hop
    nblk = CH // hop + 1  # payload blocks + lookahead block

    s = seg.astype(jnp.int32)
    gidx = (base - K) + jnp.arange(seg.shape[0], dtype=jnp.int32)
    valid = (gidx >= 0) & (gidx < n)
    norm = _normalized_seg(s, valid, mean, var, dtype)  # [K + CH + hop]

    fb = tables.bandpass_filterbank(cfg.nb_bands, cfg.band_taps, cfg.filterbank)
    NB = fb.shape[0]
    L = CH + hop  # conv output region (history drives the first K samples)
    bands = []
    for b in range(NB):
        z = jnp.zeros((L,), dtype)
        for m in range(fb.shape[1]):
            z = z + jnp.asarray(fb[b, m], dtype) * norm[K - m : K - m + L]
        bands.append(z)
    z = jnp.stack(bands, axis=0)  # [NB, L]

    alt = jnp.asarray(tables.parseval_alt_sign()[:hop], dtype)
    zb = z.reshape(NB, nblk, hop)
    S2 = jnp.sum(zb * zb, axis=-1)
    S1 = jnp.sum(zb, axis=-1)
    SA = jnp.sum(zb * alt, axis=-1)

    # K-sample history before each block (raw norm) + block's first K z.
    hist = norm[:L].reshape(nblk, hop)[:, :K]  # norm[K..] shifted back K
    zh = zb[..., :K]
    M = jnp.asarray(
        tables.fir_warmup_correction(cfg.nb_bands, cfg.band_taps, cfg.filterbank),
        dtype,
    )
    # HIGHEST: see kernels/fused_all.py — the correction must cancel the
    # conv's history tail to f32 accuracy on TPU.
    delta = jnp.einsum(
        "wk,njk->nwj", hist, M, precision=jax.lax.Precision.HIGHEST
    )
    altK = alt[:K]
    d_s2 = jnp.sum(2.0 * zh * delta + delta * delta, axis=-1)
    d_s1 = jnp.sum(delta, axis=-1)
    d_sa = jnp.sum(delta * altK, axis=-1)

    NW = nblk - 1  # = CH // hop windows fully computable in this chunk
    sum_y2 = S2[:, :NW] + S2[:, 1:] + d_s2[:, :NW]
    sum_y = S1[:, :NW] + S1[:, 1:] + d_s1[:, :NW]
    sum_a = SA[:, :NW] + SA[:, 1:] + d_sa[:, :NW]
    return (W / 2) * sum_y2 + (sum_y * sum_y + sum_a * sum_a) / 2.0


@functools.partial(jax.jit, static_argnames=("cfg",))
def _pass2_chunk_framed(
    seg: jnp.ndarray,
    base: jnp.ndarray,
    n: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    cfg: AnalysisConfig,
):
    """Window energies for one chunk in the FRAMED tempo modes
    (parseval_framed / fft / fft_strict): seg = [CH payload | 2*hop
    lookahead] int16 -> [NB, CH//hop] energies.

    These modes replicate the reference's window-reset FIR (each window is
    filtered from zero state using only its own W samples,
    reference: src/tempo_atk_sort.c:117-154), so windows carry NO state
    across chunks — no history prefix, no warm-up corrections; a window
    starting at the last payload hop merely reads W-hop samples of
    lookahead. The per-window energy op (including fft_strict's
    strictly-ordered float32 bin accumulation) is shared with the
    whole-shape path (features/tempo._window_energy)."""
    from bliss_tpu.dsp.framing import frame_signal
    from bliss_tpu.features.tempo import _fir_per_window, _window_energy

    dtype = cfg.jnp_dtype
    hop = C.TEMPO_HOP
    W = C.WINDOW_SIZE
    CH = seg.shape[0] - 2 * hop

    s = seg.astype(jnp.int32)
    gidx = base + jnp.arange(seg.shape[0], dtype=jnp.int32)
    valid = gidx < n
    norm = _normalized_seg(s, valid, mean, var, dtype)  # [CH + 2*hop]

    frames = frame_signal(norm[None], W, hop)[0][: CH // hop]  # [nw, W]
    fb = tables.bandpass_filterbank(cfg.nb_bands, cfg.band_taps, cfg.filterbank)
    energies = [
        _window_energy(_fir_per_window(frames[None], dtype, fb[b]), cfg)[0]
        for b in range(fb.shape[0])
    ]
    return jnp.stack(energies, axis=0)  # [NB, CH//hop]


def analyze_song_streaming(
    samples: np.ndarray,
    duration: int,
    cfg: AnalysisConfig,
    chunk_samples: int = DEFAULT_CHUNK,
    extended: bool = False,
) -> np.ndarray:
    """Analyze ONE song of arbitrary length with fixed [chunk] compiled
    shapes; returns the [4] float32 force vector (tempo, amplitude,
    frequency, attack), or [4 + n_ext] with ``extended`` (the ROADMAP set
    appended in EXTENDED_FEATURE_NAMES order, its beat features from the
    float64 host envelope). Beat counts are float64-exact (host finish).

    Every analysis mode streams, including the strict parity modes (see
    streaming_supports for why their sequential accumulation orders
    decompose over in-order chunks).
    """
    if chunk_samples % (C.WINDOW_SIZE * C.CHANNELS):
        raise ValueError("chunk_samples must be a multiple of 1024")

    samples = np.ascontiguousarray(np.asarray(samples, np.int16))
    n = int(samples.shape[0])
    CH = int(chunk_samples)
    n_chunks = max(1, -(-n // CH))
    K = cfg.band_taps - 1
    hop = C.TEMPO_HOP

    n_j = jnp.asarray(np.int32(n))

    # --- pass 1 -------------------------------------------------------------
    amp_dot = 0.0
    first, last = 2**31 - 1, -1
    sum_wrap = 0  # python int kept wrapped to int32 range by hand
    sum_s = 0
    sum_s2 = 0
    power = np.zeros(C.WINDOW_SIZE // 2 + 1, np.float64)
    sumsq = 0.0
    flips = 0
    roll_num = 0.0
    flat_num = 0.0
    mfcc_sum = np.zeros(13, np.float64)
    mfcc_sq = np.zeros(13, np.float64)
    from bliss_tpu.features.amplitude import _CROP_W

    amp_hist = np.zeros(_CROP_W, np.int64)  # iterative mode: exact counts
    freq_acc = jnp.zeros(C.WINDOW_SIZE // 2 + 1, jnp.float32)  # strict carry
    for ci in range(n_chunks):
        lo = ci * CH
        payload = samples[lo : lo + CH]
        if payload.shape[0] < CH:
            payload = np.pad(payload, (0, CH - payload.shape[0]))
        out = _pass1_chunk(
            jnp.asarray(payload), jnp.asarray(np.int32(lo)), n_j, freq_acc,
            cfg, extended=extended,
        )
        first = min(first, int(out["first"]))
        last = max(last, int(out["last"]))
        v = (sum_wrap + int(out["sum_wrap"])) & 0xFFFFFFFF  # wrap like C
        sum_wrap = v - (1 << 32) if v >= (1 << 31) else v
        sum_s += int(np.asarray(out["sub_s"]).astype(np.int64).sum())
        sum_s2 += int(
            np.asarray(out["sub_hi"]).astype(np.int64).sum()
        ) * 65536 + int(np.asarray(out["sub_lo"]).astype(np.int64).sum())
        if "amp_hist" in out:
            amp_hist += np.asarray(out["amp_hist"]).astype(np.int64)
        else:
            amp_dot += float(out["amp_dot"])
        if "freq_acc" in out:
            freq_acc = out["freq_acc"]  # stays on device between chunks
        else:
            power += np.asarray(out["power"]).astype(np.float64)
        if extended:
            sumsq += float(out["sumsq"])
            flips += int(out["flips"])
            roll_num += float(out["roll_num"])
            flat_num += float(out["flat_num"])
            mfcc_sum += np.asarray(out["mfcc_sum"]).astype(np.float64)
            mfcc_sq += np.asarray(out["mfcc_sq"]).astype(np.float64)
            # cross-boundary zero-cross pair (host: two mono samples)
            if ci > 0 and lo < n and lo >= 2:
                m_prev = _c_div_int(
                    int(samples[lo - 2]) + int(samples[lo - 1]), 2
                )
                m_cur = _c_div_int(int(samples[lo]) + int(samples[lo + 1]), 2)
                if (m_prev >= 0) != (m_cur >= 0):
                    flips += 1

    # --- host: scalar statistics -------------------------------------------
    mean = _c_div_int(sum_wrap, max(n, 1))
    var_num = sum_s2 - 2 * mean * sum_s + n * mean * mean  # exact int64 id.
    var = _c_div_int(var_num, max(n, 1))

    # amplitude: the trimmed leading/trailing samples are zeros by
    # definition, so their whole contribution is removable post-hoc —
    # weight(0) * count from the weighted dot, or count from the zero bin
    # of the iterative histogram
    if first > last:  # all-zero song
        first, last = 0, max(n - 1, 0)
    trimmed = first + (n - 1 - last)
    span = max(last - first, 1)
    if cfg.amplitude_mode == "iterative":
        from bliss_tpu.features.amplitude import _CROP_LO, integral_from_hist

        zero_bin = (1 << 15) - _CROP_LO  # sample value 0's histogram bin
        amp_hist[zero_bin] -= trimmed
        integral = float(
            integral_from_hist(
                jnp.asarray(amp_hist[None].astype(np.float32)),
                jnp.asarray(np.float32(span))[None],
                cfg,
            )[0]
        )
    else:
        w0 = float(tables.amplitude_weight_table()[1 << 15])
        integral = (amp_dot - w0 * trimmed) * 100.0 / span
    amplitude = np.float32(
        np.float32(C.AMPLITUDE_SCALE) * np.float32(integral)
        + np.float32(C.AMPLITUDE_BIAS)
    )

    # frequency: peak-relative dB + band score on the accumulated spectrum
    # (Nyquist zeroed — the reference never accumulates that bin); in
    # strict mode the carried float32 running sum IS the whole-shape
    # accumulator, bit for bit
    if cfg.strict_accumulation:
        power = np.asarray(freq_acc).astype(np.float64)
    power_core = power.copy()
    power_core[-1] = 0.0
    frequency = _frequency_score_from_power(power_core)

    # --- pass 2 + envelope finish ------------------------------------------
    from bliss_tpu.features.tempo import envelope_finish_host

    mean_j = jnp.asarray(np.int32(mean))
    # var in the config dtype: float32 production, float64 parity (the
    # whole-shape path casts its exact int64 variance the same way —
    # a float32 round here would break fft_strict's bit parity)
    var_j = jnp.asarray(np.array(var, dtype=np.dtype(cfg.dtype)))
    framed = cfg.tempo_energy_mode != "parseval"
    energies = []
    for ci in range(n_chunks):
        lo = ci * CH
        if framed:
            # window-reset FIR: no history, W-hop lookahead (padded to
            # 2*hop so the chunk length stays a multiple of the frame)
            seg = np.zeros(CH + 2 * hop, np.int16)
            payload = samples[lo : lo + CH + 2 * hop]
            seg[: payload.shape[0]] = payload
            e = _pass2_chunk_framed(
                jnp.asarray(seg), jnp.asarray(np.int32(lo)), n_j,
                mean_j, var_j, cfg,
            )
        else:
            seg = np.zeros(K + CH + hop, np.int16)
            pre = samples[max(lo - K, 0) : lo]
            seg[K - pre.shape[0] : K] = pre
            payload = samples[lo : lo + CH + hop]
            seg[K : K + payload.shape[0]] = payload
            e = _pass2_chunk(
                jnp.asarray(seg), jnp.asarray(np.int32(lo)), n_j,
                mean_j, var_j, cfg,
            )
        energies.append(np.asarray(e))
    fa = np.concatenate(energies, axis=1)[None]  # [1, NB, n_chunks*CH//hop]

    # window mask (same formula as the whole-shape path)
    trunc_n = n - n % C.WINDOW_SIZE
    n_windows = max(-(-(trunc_n - C.WINDOW_SIZE) // hop), 0)
    fa[:, :, n_windows:] = 0.0

    n_arr = np.array([n], np.int64)
    dur_arr = np.array([duration], np.float64)
    if not extended:
        tempo, attack = envelope_finish_host(fa, n_arr, dur_arr)
        return np.array(
            [tempo[0], amplitude, frequency, attack[0]], np.float32
        )
    # one float64 envelope chain serves both the core tempo and the
    # extended beat columns (same invariant as the batched paths)
    tempo, attack, beat_aux = envelope_finish_host(
        fa, n_arr, dur_arr, return_aux=True
    )
    core = np.array([tempo[0], amplitude, frequency, attack[0]], np.float32)

    # --- extended features from the streamed partials -----------------------
    from bliss_tpu.features.extended import (
        EXTENDED_FEATURE_NAMES,
        chroma_matrix,
    )
    from bliss_tpu.features.tempo import beat_cols_from_host_aux

    W = C.WINDOW_SIZE
    rms = np.sqrt(sumsq / max(n, 1))
    loudness_db = 20.0 * np.log10(max(rms, 1e-10))
    zcr = flips / max(n // 2 - 1, 1)

    bin_hz = np.arange(W // 2 + 1) * C.SAMPLE_RATE / W
    total_energy = max(float(power.sum()), 1e-12)
    centroid = float((power * bin_hz).sum()) / total_energy
    rolloff = roll_num / total_energy
    flatness = flat_num / total_energy

    n_frames = max((n // C.CHANNELS) // W, 1)
    mfcc_mean = mfcc_sum / n_frames
    mfcc_std = np.sqrt(np.maximum(mfcc_sq / n_frames - mfcc_mean**2, 0.0))

    bpm, beat_loud = beat_cols_from_host_aux(beat_aux, dur_arr)

    chroma = power @ np.asarray(chroma_matrix(), np.float64)
    chroma = chroma / max(float(chroma.sum()), 1e-12)

    ext = np.concatenate(
        [
            [zcr, loudness_db, centroid, rolloff, flatness,
             float(bpm[0]), float(beat_loud[0])],
            mfcc_mean,
            mfcc_std,
            chroma,
        ]
    ).astype(np.float32)
    assert ext.shape[0] == len(EXTENDED_FEATURE_NAMES)
    return np.concatenate([core, ext])


def _c_div_int(a: int, b: int) -> int:
    """C integer division (truncate toward zero) on python ints."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _frequency_score_from_power(power: np.ndarray) -> np.float32:
    """Band score from the accumulated power spectrum (host float64;
    mirrors features/frequency.py past the accumulation)."""
    W = C.WINDOW_SIZE
    p = np.sqrt(power[1:] / float(W))
    peak = max(float(np.max(p)), 1e-300)
    with np.errstate(divide="ignore"):
        db = 20.0 * np.log10(p / peak) - (-C.DB_ATTENUATION)
    d = lambda k: db[k - 1]  # noqa: E731
    b0 = (d(2) + d(4)) / 2.0
    b1 = (d(6) + d(8)) / 2.0
    lo, ls, hi, hs = (
        C.FREQ_LOW_INF,
        C.FREQ_LOW_SUP,
        C.FREQ_HIGH_INF,
        C.FREQ_HIGH_SUP,
    )
    b2 = np.sum(db[lo - 1 : ls]) / (ls - lo)
    b3 = np.sum(db[ls:hi]) / (hi - (ls + 1))
    b4 = np.sum(db[hi:hs]) / (hs - (hi + 1))
    score = b4 + b3 + b2 - b0 - b1
    return np.float32(C.FREQUENCY_SCALE * score + C.FREQUENCY_BIAS)
