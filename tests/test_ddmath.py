"""Unit tests: double-single arithmetic vs a float64 oracle.

The dd layer (dsp/ddmath.py) must deliver ~2^-48 relative precision from
f32 pairs; float64 (2^-52) is a valid oracle for asserting at the 1e-12
level. These run on CPU like the rest of the suite, but the ops are all
plain IEEE f32 adds/muls so the behavior carries to the TPU VPU (modulo
denormal flush, which tests stay far above).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bliss_tpu import constants as C
from bliss_tpu.dsp import ddmath as dd
from bliss_tpu.dsp.iir import lfilter_dd


def _mk(v):
    """f64 array -> dd pair holding it to ~2^-48."""
    hi = v.astype(np.float32)
    lo = (v - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def _val(d):
    return np.asarray(d[0], np.float64) + np.asarray(d[1], np.float64)


@pytest.fixture(scope="module")
def rand():
    rng = np.random.RandomState(42)
    x = rng.uniform(1.0, 1e8, 5000)
    y = rng.uniform(0.1, 1e6, 5000)
    return x, y


def test_add_sub_mul_div(rand):
    x64, y64 = rand
    X, Y = _mk(x64), _mk(y64)
    for got, ref in [
        (dd.add(X, Y), x64 + y64),
        (dd.sub(X, Y), x64 - y64),
        (dd.mul(X, Y), x64 * y64),
        (dd.div(X, Y), x64 / y64),
    ]:
        rel = np.abs(_val(got) - ref) / np.abs(ref).clip(1e-300)
        assert rel.max() < 1e-12


def test_log(rand):
    x64, _ = rand
    rel = np.abs(_val(dd.log(_mk(x64))) - np.log(x64)) / np.abs(np.log(x64))
    assert rel.max() < 1e-13


def test_log_near_one():
    """The comp use case: log(1 + mu*fa) with tiny fa — absolute accuracy."""
    rng = np.random.RandomState(0)
    t64 = 1.0 + 100.0 * rng.uniform(0, 1e-6, 5000)
    err = np.abs(_val(dd.log(_mk(t64))) - np.log(t64))
    assert err.max() < 1e-14


def test_log_special_values():
    x = (jnp.asarray([np.inf, np.nan, 1.0], np.float32), jnp.zeros(3, np.float32))
    out = _val(dd.log(x))
    assert np.isposinf(out[0]) and np.isnan(out[1]) and out[2] == 0.0


def test_sum_last(rand):
    x64, _ = rand
    got = _val(dd.sum_last(_mk(x64.reshape(4, 1250))))
    ref = x64.reshape(4, 1250).sum(axis=1)
    assert np.abs((got - ref) / ref).max() < 1e-13


def test_compare_and_max0():
    x64 = np.array([1.0 + 2e-9, 1.0 - 2e-9, 1.0, np.nan])
    t = dd.sub(_mk(x64), _mk(np.ones(4)))
    pos = np.asarray(dd.cgt(t, np.float32(0.0)))
    assert list(pos) == [True, False, False, False]
    m = dd.max0(t)
    v = _val(m)
    assert v[0] > 0 and v[1] == 0 and v[2] == 0 and np.isnan(v[3])


def test_lfilter_dd_vs_scipy_f64():
    """The refinement IIR must sit at the dd floor (~1e-11 abs here),
    five orders below the 1e-6 peak epsilon."""
    from scipy.signal import lfilter

    rng = np.random.RandomState(7)
    T = 2048
    u64 = np.zeros((4, T))
    u64[:, 0::2] = np.abs(rng.randn(4, T // 2)) * rng.uniform(0.1, 3.0, (4, 1))
    y = lfilter_dd(_mk(u64))
    ref = lfilter(C.BUTTER_B, C.BUTTER_A, u64, axis=-1)
    assert np.abs(_val(y) - ref).max() < 1e-9


def test_lfilter_dd_long():
    """No error growth with sequence length (stable filter: bounded gain)."""
    from scipy.signal import lfilter

    rng = np.random.RandomState(11)
    T = 65536
    u64 = np.zeros((1, T))
    u64[:, 0::2] = np.abs(rng.randn(1, T // 2))
    y = lfilter_dd(_mk(u64))
    ref = lfilter(C.BUTTER_B, C.BUTTER_A, u64, axis=-1)
    assert np.abs(_val(y) - ref).max() < 1e-9
