"""Double-single ("dd") arithmetic: ~2^-48-relative precision from pairs of
float32s, entirely with VPU-native f32 ops.

Why: the reference's envelope finish runs in C ``double`` end-to-end and its
epsilon-peak compare (eps=1e-6 against O(10..100) envelope values,
reference: src/tempo_atk_sort.c:275-280) needs ~2^-27 relative precision —
past float32, and the TPU backend has no float64 (x64 programs hang at
compile through this sandbox's tunnel, and real TPUs emulate f64 slowly).
Representing each value as an unevaluated sum hi+lo of two float32s gives
~49 mantissa bits, comfortably past the requirement, while every operation
stays a handful of IEEE f32 adds/muls the VPU executes natively.

The algorithms are the classical error-free transformations (Dekker 1971,
Knuth TAOCP v2, and the double-double arithmetic of Hida/Li/Bailey's QD
library): two_sum, Dekker split/two_prod (no FMA primitive is exposed by
JAX, so products use the 4097-split), and the derived add/mul/div. dd_log
uses frexp range reduction to m in [1/sqrt2, sqrt2) and the atanh series
2*atanh((m-1)/(m+1)) with dd coefficients.

Values are (hi, lo) tuples of same-shape float32 arrays with the normalized
invariant |lo| <= ulp(hi)/2, so ``hi`` alone IS the correctly rounded f32 of
the represented value. NaN/Inf propagate through hi like ordinary f32.

Caveat (TPU): denormals flush to zero, so components below ~1e-38 are lost;
for the envelope finish (values O(1e-6..100)) this is 30+ orders of
magnitude below the precision target.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_F32 = jnp.float32
_SPLITTER = np.float32(4097.0)  # 2^12 + 1 for binary32 Dekker splits


def const(v: float) -> tuple[np.float32, np.float32]:
    """Split a python/f64 constant into a dd (hi, lo) pair of f32s."""
    hi = np.float32(v)
    lo = np.float32(np.float64(v) - np.float64(hi))
    return hi, lo


def from_f32(a) -> tuple[jnp.ndarray, jnp.ndarray]:
    a = jnp.asarray(a, _F32)
    return a, jnp.zeros_like(a)


def to_f32(x) -> jnp.ndarray:
    """Round dd -> f32. For normalized pairs hi is already that rounding."""
    return x[0]


def two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """two_sum under the precondition |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    t = _SPLITTER * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def add(x, y):
    """dd + dd (accurate variant: ~2 ulp of dd)."""
    s1, s2 = two_sum(x[0], y[0])
    t1, t2 = two_sum(x[1], y[1])
    s2 = s2 + t1
    s1, s2 = quick_two_sum(s1, s2)
    s2 = s2 + t2
    return quick_two_sum(s1, s2)


def neg(x):
    return -x[0], -x[1]


def sub(x, y):
    return add(x, neg(y))


def add_f(x, a):
    """dd + f32 array/scalar."""
    s1, s2 = two_sum(x[0], jnp.asarray(a, _F32))
    s2 = s2 + x[1]
    return quick_two_sum(s1, s2)


def mul(x, y):
    """dd * dd."""
    p, e = two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return quick_two_sum(p, e)


def mul_f(x, a):
    """dd * exact-f32 array/scalar (a carries no dd low part)."""
    a = jnp.asarray(a, _F32)
    p, e = two_prod(x[0], a)
    e = e + x[1] * a
    return quick_two_sum(p, e)


def mul_pow2(x, k: float):
    """dd * exact power of two (error-free)."""
    k = np.float32(k)
    return x[0] * k, x[1] * k


def div(x, y):
    """dd / dd (three-term long division)."""
    q1 = x[0] / y[0]
    r = sub(x, mul_f(y, q1))
    q2 = r[0] / y[0]
    r = sub(r, mul_f(y, q2))
    q3 = r[0] / y[0]
    s, e = two_sum(q1, q2)
    e = e + q3
    return quick_two_sum(s, e)


def where(c, x, y):
    return jnp.where(c, x[0], y[0]), jnp.where(c, x[1], y[1])


def cgt(x, t):
    """dd > t for an exact-f32 threshold t. False for NaN (like IEEE)."""
    d = add_f(x, jnp.float32(-t)) if not isinstance(t, tuple) else sub(x, t)
    return (d[0] > 0) | ((d[0] == 0) & (d[1] > 0))


def max0(x):
    """max(x, 0) elementwise (NaN passes through hi like jnp.maximum)."""
    pos = cgt(x, np.float32(0.0))
    hi = jnp.where(pos, x[0], jnp.zeros_like(x[0]))
    # preserve NaN propagation: jnp.where(False, NaN, 0) -> 0, but the
    # reference's fmax(NaN, 0)=... C fmax(NaN,0)=0; numpy maximum gives NaN.
    # The host finish uses np.maximum -> NaN propagates; mirror that.
    hi = jnp.where(jnp.isnan(x[0]), x[0], hi)
    lo = jnp.where(pos, x[1], jnp.zeros_like(x[1]))
    return hi, lo


def fence(x, anchor):
    """Materialization fence for deep dd expression graphs.

    XLA's CPU fusion pass duplicates a producer graph into each consumer
    fusion; dd graphs are chains of two_sum/two_prod diamonds, so a deep dd
    value fanned out to several consumers (compares, slices at different
    offsets, band loops) makes that duplication multiplicative-to-
    exponential — compiles that hang for minutes at >10 GB even on [2, 128]
    inputs (measured round 3; plain f32 graphs are unaffected). A trip-2
    while loop is a boundary no pass removes: the body select's
    ``anchor == anchor`` predicate is only foldable under a no-NaN
    assumption XLA won't make, trip 2 is past the unroller's threshold, and
    loop carries are materialized buffers. Runtime cost: two extra passes
    over the arrays (~us); compile cost: the deep graph is emitted once.

    ``x``: a dd pair (or any tuple of same-shape arrays). ``anchor``: any
    traced f32 scalar from the program's inputs (NOT a constant — a
    constant predicate folds and the loop unrolls away).
    """
    import jax

    # nan_to_num keeps a NaN anchor from flipping the select (which would
    # silently add +1 to every fenced value batch-wide); the compare is
    # still unfoldable — XLA cannot prove the computed operand non-NaN.
    anchor = jnp.nan_to_num(jnp.asarray(anchor, jnp.float32))
    flag = anchor == anchor

    def body(i, c):
        return tuple(jnp.where(flag, v, v + jnp.asarray(i, v.dtype)) for v in c)

    return jax.lax.fori_loop(0, 2, body, tuple(x))


def sum_last(x):
    """Sum over the last axis by pairwise dd folding: [..., N] -> [...]."""
    hi, lo = x
    n = hi.shape[-1]
    p = 1
    while p < n:
        p *= 2
    if p != n:
        pad = [(0, 0)] * (hi.ndim - 1) + [(0, p - n)]
        hi = jnp.pad(hi, pad)
        lo = jnp.pad(lo, pad)
    while p > 1:
        half = p // 2
        hi, lo = add(
            (hi[..., :half], lo[..., :half]), (hi[..., half:], lo[..., half:])
        )
        p = half
    return hi[..., 0], lo[..., 0]


# --- logarithm ---------------------------------------------------------------

_LOG2 = const(float(np.log(np.float64(2.0))))
_SQRT_HALF = np.float32(np.sqrt(0.5))
# atanh series coefficients 1/(2k+1) as dd constants; r^2 <= 0.0295 so 12
# terms reach ~r^25/25 ~ 5e-20 relative — below the dd epsilon.
_ATANH_COEFFS = [const(1.0 / (2 * k + 1)) for k in range(12)]


def log(x):
    """dd natural log for x > 0 (NaN/Inf propagate through hi).

    Range-reduce x = m * 2^e with m in [1/sqrt2, sqrt2), then
    log m = 2 atanh(r), r = (m-1)/(m+1), via the odd series in dd.
    """
    hi, lo = x
    m, e = jnp.frexp(hi)  # m in [0.5, 1)
    small = m < _SQRT_HALF
    m = jnp.where(small, m + m, m)
    e = (e - small.astype(e.dtype)).astype(_F32)
    # scale lo by the same 2^-e (exact)
    mlo = jnp.ldexp(lo, -e.astype(jnp.int32))
    md = (m, mlo)

    r = div(add_f(md, np.float32(-1.0)), add_f(md, np.float32(1.0)))
    s = mul(r, r)
    acc = (
        jnp.full_like(m, _ATANH_COEFFS[-1][0]),
        jnp.full_like(m, _ATANH_COEFFS[-1][1]),
    )
    for chi, clo in _ATANH_COEFFS[-2::-1]:
        acc = mul(acc, s)
        acc = add_f(add_f(acc, chi), clo)
    logm = mul_pow2(mul(r, acc), 2.0)
    out = add(
        mul_f((jnp.full_like(m, _LOG2[0]), jnp.full_like(m, _LOG2[1])), e), logm
    )
    # log(+inf) = +inf (the series path yields NaN there); host f64 matches.
    ohi = jnp.where(jnp.isposinf(hi), hi, out[0])
    olo = jnp.where(jnp.isposinf(hi), jnp.zeros_like(hi), out[1])
    return ohi, olo
