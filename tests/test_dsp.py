"""DSP primitive unit tests against NumPy/SciPy oracles."""

import numpy as np
import jax.numpy as jnp
from scipy.signal import lfilter

from bliss_tpu import constants as C
from bliss_tpu import tables
from bliss_tpu.dsp import box_sum_same, c_div, frame_signal, lfilter_blocked, lfilter_scan


def test_c_div_truncates_toward_zero():
    a = jnp.array([7, -7, 7, -7, 6, -6, 0, -1])
    b = jnp.array([2, 2, -2, -2, 3, 3, 5, 2])
    got = np.asarray(c_div(a, b))
    want = np.array([3, -3, -3, 3, 2, -2, 0, 0])  # C semantics
    np.testing.assert_array_equal(got, want)


def test_frame_signal_hop_half():
    x = jnp.arange(4096.0)
    fr = np.asarray(frame_signal(x, 512, 256))
    assert fr.shape == (15, 512)
    for w in range(15):
        np.testing.assert_array_equal(fr[w], np.arange(w * 256, w * 256 + 512))


def test_frame_signal_batched():
    x = jnp.arange(2.0 * 2048).reshape(2, 2048)
    fr = np.asarray(frame_signal(x, 512, 256))
    assert fr.shape == (2, 7, 512)
    np.testing.assert_array_equal(fr[1, 3], np.asarray(x)[1, 768:1280])


def test_box_sum_same_matches_convolve():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 200)
    got = np.asarray(box_sum_same(jnp.asarray(x), 19))
    for b in range(3):
        want = np.convolve(x[b], np.ones(19), mode="same")
        np.testing.assert_allclose(got[b], want, atol=1e-12)


def test_lfilter_scan_matches_scipy():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 500)
    got = np.asarray(lfilter_scan(C.BUTTER_B, C.BUTTER_A, jnp.asarray(x)))
    want = lfilter(C.BUTTER_B, C.BUTTER_A, x, axis=1)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_lfilter_blocked_matches_scipy():
    rng = np.random.RandomState(2)
    for T in (256, 300, 1000, 4096):
        x = rng.randn(2, T)
        got = np.asarray(lfilter_blocked(jnp.asarray(x), block=256))
        want = lfilter(C.BUTTER_B, C.BUTTER_A, x, axis=1)
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_amplitude_weight_table_is_exact_linear_collapse():
    # Brute-force 301 smoothing passes of a unit impulse vs the table weight.
    k = C.SMOOTH_KERNEL
    for j in (31767 - 80, 31767 + 40, 32768, 33767 - 40, 33767 + 80):
        h = np.zeros(C.HISTOGRAM_SIZE)
        h[j] = 1.0
        for _ in range(C.N_SMOOTH_PASSES + 1):
            h = np.convolve(h, k, mode="same")
        want = h[C.INTEGRAL_INF : C.INTEGRAL_SUP + 1].sum()
        got = tables.amplitude_weight_table()[j]
        np.testing.assert_allclose(got, want, rtol=1e-8)


def test_parseval_identity():
    rng = np.random.RandomState(3)
    y = rng.randn(512)
    X = np.fft.rfft(y)
    direct = np.sum(np.abs(X) ** 2)
    alt = tables.parseval_alt_sign()
    via = 256 * np.sum(y * y) + (y.sum() ** 2 + (y * alt).sum() ** 2) / 2
    np.testing.assert_allclose(via, direct, rtol=1e-12)


def test_rdft_matrices_match_rfft():
    rng = np.random.RandomState(4)
    x = rng.randn(512)
    re, im = tables.rdft_matrices()
    X = np.fft.rfft(x)
    np.testing.assert_allclose(x @ re, X.real, atol=1e-9)
    np.testing.assert_allclose(x @ im, X.imag, atol=1e-9)
