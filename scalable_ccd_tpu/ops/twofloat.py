"""Double-word (two-float) f32 arithmetic — the TPU answer to USE_DOUBLE.

The reference builds with ``Scalar = double`` by default
(``/root/reference/CMakeLists.txt:69``, ``src/scalable_ccd/scalar.hpp:13-26``)
and its narrow-phase filter constants assume f64
(``cuda/narrow_phase/root_finder.cu:92-100``).  TPU vector units have no
f64, so the precision escape hatch here is **double-word arithmetic**: a
value is an unevaluated sum ``hi + lo`` of two f32 with
``|lo| <= ulp(hi)/2``, giving ~48 effective mantissa bits (vs f32's 24,
f64's 53) from pure f32 adds/muls — every op below lowers to plain VPU
arithmetic and runs unmodified under jit, shard_map, and (if ever needed)
inside Mosaic kernels.

Algorithms are the classical error-free transforms (Dekker 1971, Knuth) and
the double-word operations of Joldes, Muller & Popescu, *Tight and rigorous
error bounds for basic building blocks of double-word arithmetic* (ACM TOMS
2017), **without FMA** (XLA has no fused-multiply-add HLO; products are
split exactly via Veltkamp splitting).  Error bounds with u = 2^-24:

- ``two_sum`` / ``two_prod``: exact (error-free) for any f32 inputs
  (``two_prod`` barring overflow of the 2^12+1 split, |a| > ~2^115).
- ``add`` (AccurateDWPlusDW): relative error <= 3 u^2.
- ``mul_f`` (DWTimesFP1): relative error <= 2 u^2.

A chain of k such ops keeps relative error < ~3 k u^2; the inclusion
function's longest chain is ~10 ops, so 2^-44 (= 256 u^2) is a safely
conservative per-op-chain epsilon for the narrow-phase error filter
(``narrow_phase.types.numerical_error_bound(compensated=True)``).

Caveats (documented, covered by the filter):

- XLA preserves the written float operation sequence (no unsafe
  reassociation by default), which the transforms rely on; validated
  against f64 in ``tests/test_twofloat.py`` and on real TPU hardware
  (``tools/hw_compensated_probe.py``).
- TPU flushes f32 denormals: a ``lo`` term below ~1.2e-38 flushes to 0,
  losing its correction.  That costs accuracy only for |value| < ~1e-31,
  where the compensated epsilon's absolute floor in the error filter
  (the reference clamps coordinate magnitude to >= 1, so the filter is
  >= k * 2^-44) dwarfs any flushed bit.

All functions are elementwise and broadcast like jnp; a double-word number
is an ordinary ``(hi, lo)`` tuple of arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "two_sum", "fast_two_sum", "two_prod",
    "from_f", "add", "sub", "neg", "add_f", "sub_f", "f_sub", "mul_f",
    "minimum", "maximum", "sign_hi", "hi",
]

#: Veltkamp split constant for f32 (p = 24 -> 2^ceil(p/2) + 1)
_SPLIT = 4097.0


def two_sum(a, b):
    """Error-free sum: returns (s, e) with s = fl(a+b), s + e == a + b."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free sum assuming |a| >= |b| (or a == 0): 3 flops."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    t = _SPLIT * a
    h = t - (t - a)
    return h, a - h


def two_prod(a, b):
    """Error-free product without FMA: (p, e) with p = fl(a*b),
    p + e == a * b (Dekker)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ---------------------------------------------------------------------------
# double-word numbers: (hi, lo) tuples, |lo| <= ulp(hi)/2 after each op


def from_f(a):
    """Promote an exact f32 array to double-word."""
    return a, jnp.zeros_like(a)


def hi(x):
    return x[0]


def add(x, y):
    """AccurateDWPlusDW (Joldes et al. alg. 6): rel. error <= 3 u^2."""
    s, e = two_sum(x[0], y[0])
    t, f = two_sum(x[1], y[1])
    e = e + t
    s, e = fast_two_sum(s, e)
    e = e + f
    return fast_two_sum(s, e)


def neg(x):
    return -x[0], -x[1]


def sub(x, y):
    return add(x, neg(y))


def add_f(x, b):
    """DW + f32 (DWPlusFP): rel. error <= 2 u^2."""
    s, e = two_sum(x[0], b)
    e = e + x[1]
    return fast_two_sum(s, e)


def sub_f(x, b):
    return add_f(x, -b)


def f_sub(a, b):
    """Exact f32 - f32 as a double-word (two_sum is error-free)."""
    return two_sum(a, -b)


def mul_f(x, b):
    """DW * f32 (DWTimesFP1): rel. error <= 2 u^2."""
    p, e = two_prod(x[0], b)
    e = e + x[1] * b
    return fast_two_sum(p, e)


def sign_hi(x):
    """The hi word of a normalized double-word carries the sign of the
    value (fast_two_sum leaves hi = fl(hi + lo)), so comparisons reduce
    to a subtraction and a sign test on hi."""
    return x[0]


def _lt(x, y):
    """x < y for normalized double-words (lexicographic)."""
    return (x[0] < y[0]) | ((x[0] == y[0]) & (x[1] < y[1]))


def minimum(x, y):
    take_x = _lt(x, y)
    return jnp.where(take_x, x[0], y[0]), jnp.where(take_x, x[1], y[1])


def maximum(x, y):
    take_x = _lt(y, x)
    return jnp.where(take_x, x[0], y[0]), jnp.where(take_x, x[1], y[1])
