"""Precomputed operator tables derived from the analysis constants.

These collapse the reference's sequential host loops into single dense
operators that map onto TPU compute units:

- The 301-pass histogram smoothing (reference: src/amplitude_sort.c:41-59) is
  a fixed linear operator; composing the 7-tap kernel with itself 301 times
  and summing over the integral window reduces the whole amplitude analysis
  to ONE weighted sum over sample values (a table lookup + reduction).
- The per-window FFT energy of the tempo analyzer
  (reference: src/tempo_atk_sort.c:140-152) reduces via Parseval's theorem to
  a quadratic form in the FIR output — no FFT needed:
      sum_{k=0..256} |X_k|^2 = 256*sum(y^2) + ((sum y)^2 + (sum (-1)^n y)^2)/2
- The sequential Butterworth IIR (reference: src/tempo_atk_sort.c:200-218)
  becomes a blocked linear recurrence: per-block dense matrices turn a
  T-step scalar loop into a handful of MXU matmuls with seq_len/T sequential
  steps (see dsp/iir.py).

All tables are computed once in float64 NumPy and cached.
"""

from __future__ import annotations

import functools

import numpy as np

from bliss_tpu import constants as C


@functools.lru_cache(maxsize=None)
def smoothing_kernel_iterated() -> np.ndarray:
    """The 7-tap binomial-like kernel composed with itself 301 times.

    Length 301*6 + 1 = 1807, centered, sums to 1 (within f64).
    """
    k = np.array([1.0])
    base = C.SMOOTH_KERNEL
    for _ in range(C.N_SMOOTH_PASSES + 1):
        k = np.convolve(k, base)
    return k


@functools.lru_cache(maxsize=None)
def amplitude_weight_table() -> np.ndarray:
    """w[j] = sum over the integral window of the iterated smoothing kernel.

    amplitude = AMPLITUDE_SCALE * (100/(end-start)) * sum_i w[s_i + 2^15]
                + AMPLITUDE_BIAS
    exactly reproduces histogram -> 301x smoothing -> windowed integral
    (boundary handling in the reference cannot reach the integral window:
    the kernel support is +-903 bins while the window sits >=30864 bins from
    either edge).
    """
    K = smoothing_kernel_iterated()
    half = (len(K) - 1) // 2  # 903
    Sp = np.concatenate([[0.0], np.cumsum(K)])
    js = np.arange(C.HISTOGRAM_SIZE)
    lo = np.clip(C.INTEGRAL_INF - js + half, 0, len(K))
    hi = np.clip(C.INTEGRAL_SUP - js + half + 1, 0, len(K))
    return Sp[hi] - Sp[lo]


@functools.lru_cache(maxsize=None)
def amplitude_cdf_poly(degree: int = 18, halfwidth: int = 200):
    """Chebyshev fits of the smoothing kernel's CDF for gather-free
    amplitude evaluation on the VPU.

    The weight w[j] = T(33767-j) - T(31766-j) where T is the iterated
    kernel's CDF; T saturates to exactly 0/1 outside +-halfwidth. Each half
    of the transition is fit with a degree-`degree` Chebyshev series (max
    error ~2.5e-7 — below float32 resolution of the table). Returns
    (halfwidth, coeffs_neg, coeffs_pos) with each coeff array indexed
    ascending.
    """
    from numpy.polynomial import chebyshev as Ch

    K = smoothing_kernel_iterated()
    Sp = np.concatenate([[0.0], np.cumsum(K)])
    half = (len(K) - 1) // 2  # 903

    def T(m):
        return Sp[np.clip(m + half + 1, 0, len(K))]

    A = halfwidth
    m_neg = np.arange(-A, 1)
    m_pos = np.arange(0, A + 1)
    t_neg = (2.0 * m_neg + A) / A
    t_pos = (2.0 * m_pos - A) / A
    c_neg = Ch.chebfit(t_neg, T(m_neg), degree)
    c_pos = Ch.chebfit(t_pos, T(m_pos), degree)
    return A, c_neg, c_pos


@functools.lru_cache(maxsize=None)
def hann_window() -> np.ndarray:
    """Hann window as the reference computes it
    (reference: src/frequency_sort.c:40-42), float64."""
    i = np.arange(C.WINDOW_SIZE)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * i / (C.WINDOW_SIZE - 1)))


@functools.lru_cache(maxsize=None)
def rdft_matrices(zero_nyquist: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT matrices [WINDOW_SIZE, WINDOW_SIZE//2 + 1].

    X = x @ (re + i*im) equals numpy's unnormalized rfft. Expressing the
    512-point DFT as a matmul keeps the spectral analysis on the MXU instead
    of a host FFT library (the TPU-native analog of av_rdft/FFTW use in the
    reference).

    zero_nyquist=True zeroes the last (Nyquist) column: the reference's
    av_rdft packs the Nyquist real part into bin 0's imaginary slot and its
    accumulation loop never writes power_spectrum[256]
    (reference: src/frequency_sort.c:86-93), so the frequency analyzer's
    peak normalization must run over bins 1..255 only. The extended
    features use the mathematically complete spectrum (default False).
    """
    n = C.WINDOW_SIZE
    k = np.arange(n // 2 + 1)
    t = np.arange(n)
    ang = -2.0 * np.pi * np.outer(t, k) / n
    re, im = np.cos(ang), np.sin(ang)
    if zero_nyquist:
        re = re.copy()
        im = im.copy()
        re[:, -1] = 0.0
        im[:, -1] = 0.0
    return re, im


@functools.lru_cache(maxsize=None)
def bandpass_filterbank(
    nb_bands: int = 1, taps: int = 17, kind: str = "firwin"
) -> np.ndarray:
    """[nb_bands, taps] FIR bandpass filterbank for the tempo analyzer.

    nb_bands=1, taps=17 is the reference's published single band
    (constants.FIR_BANDPASS — parity mode). For nb_bands > 1,
    kind="firwin" designs a fresh log-spaced filterbank with
    scipy.signal.firwin, while kind="reference5"/"reference36" return the
    reference author's own commented-out filterbanks
    (constants_filterbanks, from reference include/bandpass_coeffs.h) —
    realizing the multi-band Klapuri front-end the reference's comments
    describe cutting to one band "for CPU-consumption reasons"
    (reference: src/tempo_atk_sort.c:13-14) — affordable on TPU.
    """
    from bliss_tpu import constants as C

    if kind != "firwin":
        from bliss_tpu import constants_filterbanks as FB

        table = {"reference5": FB.REFERENCE5, "reference36": FB.REFERENCE36}[
            kind
        ]
        if table.shape != (nb_bands, taps):
            raise ValueError(
                f"filterbank {kind!r} is {table.shape}, not "
                f"({nb_bands}, {taps})"
            )
        return table
    if nb_bands == 1 and taps == 17:
        return C.FIR_BANDPASS[None, :]
    from scipy.signal import firwin

    nyq = C.SAMPLE_RATE / 2.0
    edges = np.geomspace(50.0, nyq * 0.92, nb_bands + 1)
    rows = [
        firwin(taps, [edges[i], edges[i + 1]], pass_zero=False, fs=C.SAMPLE_RATE)
        for i in range(nb_bands)
    ]
    return np.stack(rows)


@functools.lru_cache(maxsize=None)
def fir_warmup_correction(
    nb_bands: int = 1, taps: int = 17, kind: str = "firwin"
) -> np.ndarray:
    """[nb_bands, taps-1, taps-1] matrices M with delta = M @ history.

    The tempo analyzer resets its FIR state at every 512-sample window
    (hop 256). Since windows overlap, the per-window FIR output equals the
    GLOBAL causal convolution z everywhere except the first taps-1 warm-up
    positions, where the window output y differs by
        delta_j = y_w[j] - z[b+j] = -sum_{k=j..K-1} c_{j+K-k} * h_k,
    (K = taps-1) with h the K samples preceding the window. M encodes that
    sum, so the whole warm-up correction is one tiny matmul per window —
    this is what lets the energy computation run blockwise without
    materializing the 2x-overlapped window tensor.
    """
    fb = bandpass_filterbank(nb_bands, taps, kind)
    K = taps - 1
    M = np.zeros((nb_bands, K, K))
    for b in range(nb_bands):
        for j in range(K):
            for k in range(j, K):
                M[b, j, k] = -fb[b, j + K - k]
    return M


@functools.lru_cache(maxsize=None)
def conv_band_matrix(taps: int = 17, blk: int = 256) -> np.ndarray:
    """[blk + taps - 1, blk] banded matrix realizing the causal FIR on a
    halo-extended block: z = ext @ T with ext = [K-sample history | block].
    Lets the fused Pallas kernel run the convolution as ONE MXU matmul
    instead of taps unaligned vector shifts."""
    from bliss_tpu import constants as C

    c = C.FIR_BANDPASS
    K = taps - 1
    T = np.zeros((blk + K, blk))
    for t in range(blk):
        for m in range(taps):
            T[K + t - m, t] = c[m]
    return T


@functools.lru_cache(maxsize=None)
def conv_band_matrices(
    nb_bands: int = 1, taps: int = 17, kind: str = "firwin", blk: int = 256
) -> np.ndarray:
    """[nb_bands*(blk+taps-1), blk] stacked banded FIR matrices, one per
    filterbank band. The fused Pallas kernel's BlockSpec pages band b's
    [blk+K, blk] slice in as its grid's innermost (band) dimension — VMEM
    stays constant in the band count."""
    fb = bandpass_filterbank(nb_bands, taps, kind)
    K = taps - 1
    out = np.zeros((nb_bands * (blk + K), blk))
    for b in range(nb_bands):
        T = out[b * (blk + K) : (b + 1) * (blk + K)]
        for t in range(blk):
            for m in range(taps):
                T[K + t - m, t] = fb[b, m]
    return out


@functools.lru_cache(maxsize=None)
def parseval_alt_sign() -> np.ndarray:
    """(-1)^n vector for the Nyquist-bin term of the Parseval identity."""
    s = np.ones(C.WINDOW_SIZE)
    s[1::2] = -1.0
    return s


@functools.lru_cache(maxsize=None)
def iir_block_operator(
    block: int = 256, kind: str = "butter"
) -> tuple[np.ndarray, ...]:
    """Dense block operator (L, Z, M, N) for the Butterworth low-pass.

    For a block of T inputs u and incoming direct-form-II-transposed state z
    (dimension 6):   y = u @ L.T + z @ Z.T     z' = u @ M.T + z @ N.T

    L [T,T] lower-triangular Toeplitz of the impulse response; Z [T,6] the
    zero-input responses; M [6,T] state response to each in-block impulse;
    N [6,6] the state transition. Computed with scipy.signal.lfilter probes.

    ``kind``: "butter" is the full (BUTTER_B, BUTTER_A) filter; "recursive"
    is the pure-AR solve (b=[1], same denominator) — the A^-1 operator used
    by the double-single iterative-refinement filter (dsp.iir.lfilter_dd).
    """
    from scipy.signal import lfilter

    if kind == "butter":
        b, a = C.BUTTER_B, C.BUTTER_A
    elif kind == "recursive":
        b, a = np.array([1.0]), C.BUTTER_A
    else:
        raise ValueError(f"unknown iir operator kind {kind!r}")
    order = len(a) - 1
    T = block

    imp = np.zeros(T)
    imp[0] = 1.0
    h = lfilter(b, a, imp)
    L = np.zeros((T, T))
    for j in range(T):
        L[j:, j] = h[: T - j]

    Z = np.zeros((T, order))
    N = np.zeros((order, order))
    for k in range(order):
        zi = np.zeros(order)
        zi[k] = 1.0
        y, zf = lfilter(b, a, np.zeros(T), zi=zi)
        Z[:, k] = y
        N[:, k] = zf

    M = np.zeros((order, T))
    for j in range(T):
        u = np.zeros(T)
        u[j] = 1.0
        _, zf = lfilter(b, a, u, zi=np.zeros(order))
        M[:, j] = zf

    return L, Z, M, N
