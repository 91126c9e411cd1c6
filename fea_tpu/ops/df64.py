"""Double-f32 ("df64") vector arithmetic for the TPU Krylov loop.

XLA's emulated f64 on TPU decomposes every elementwise op into many
f32 passes with materialized intermediates; at the 1M-DOF bench the
FCG loop's f64 vector algebra (3 axpys + 4 dots per iteration) cost
~26 ms/iteration — more than the operator apply and the V-cycle
combined (docs/PERF.md).  This module represents each vector as an
unevaluated f32 pair ``(hi, lo)`` with ``hi + lo`` carrying ~2^-48
relative accuracy, and implements the CG vector ops with error-free
transformations (Dekker/Veltkamp products, TwoSum additions) — a few
fused f32 elementwise passes instead of emulated-f64 ops, so each
axpy/dot runs at HBM speed on half the f64 traffic.

Accuracy notes (why this is safe for a 1e-8 solver tolerance):
  * axpy/add renormalize, so recurrence updates carry ~2^-48 relative
    error — the CG residual recurrence stays consistent with the true
    residual far below the 1e-8 target (same argument as f64).
  * dots accumulate EXACT f32 products (Dekker) in an f64-accumulator
    tree reduction — effectively f64-exact.
  * alpha/beta stay f64 scalars (O(1) emulated ops are free); their
    hi/lo split enters the axpys exactly, and CG's self-consistency
    makes the residual recurrence exact for ANY step scalar as long as
    x and r use the same one — which they structurally do.

Requires x64 enabled only for the f64 SCALARS (dots, tolerances); all
vector arrays are f32.  Used by ``solvers.cg.fpcg_dd`` and the
transposed-layout solve path; pinned against the f64 reference solver
in tests/test_transposed.py.

Representable-range assumption (ADVICE r1): the Veltkamp split computes
``4097 * a`` in f32, which overflows to inf for |a| > ~8.3e34 (and the
Dekker cross products underflow below ~1e-31).  Inputs must therefore
be scaled so displacements/forces stay within ~[1e-30, 1e34] — true for
any SI- or imperial-unit structural model by dozens of orders of
magnitude.  A model outside that range would surface as inf/NaN in
dot/axpy and stop the solver via the blow-up guard; pre-scale b and x
by a power of two (exact, O(1)) before entering pair space if you ever
need such units.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "split",
    "combine",
    "add",
    "axpy",
    "dot",
    "from_f32",
    "two_prod",
    "neg",
    "scale",
    "mul",
]

_SPLITTER = jnp.float32(4097.0)  # 2^12 + 1: Veltkamp splitter for f32


def _veltkamp(a):
    """a -> (a1, a2), a = a1 + a2 exactly, a1 holding the top ~12 bits."""
    c = _SPLITTER * a
    a1 = c - (c - a)
    return a1, a - a1


def _two_sum(a, b):
    """(s, e) with s = fl(a + b) and a + b = s + e exactly."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def _renorm(hi, lo):
    """Fast two-sum renormalization: |lo| <= ulp(hi)/2 afterwards."""
    s = hi + lo
    return s, lo - (s - hi)


def split(x64: jax.Array) -> tuple[jax.Array, jax.Array]:
    """f64 array -> (hi, lo) f32 pair with hi + lo == x to f64 rounding."""
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(x64.dtype)).astype(jnp.float32)
    return hi, lo


def combine(v: tuple[jax.Array, jax.Array], dtype=jnp.float64) -> jax.Array:
    """(hi, lo) pair -> f64 array."""
    hi, lo = v
    return hi.astype(dtype) + lo.astype(dtype)


def from_f32(x32: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Lift an exact-f32 array (e.g. a V-cycle output) into a pair."""
    return x32, jnp.zeros_like(x32)


def add(u, v):
    """Pair + pair, renormalized (~2^-48 relative)."""
    uh, ul = u
    vh, vl = v
    s, e = _two_sum(uh, vh)
    return _renorm(s, ul + vl + e)


def axpy(alpha: jax.Array, p, y):
    """y + alpha * p for pairs, alpha an f64 scalar; renormalized.

    The scalar splits exactly into f32 (ah + al); the product ah * p_hi
    is accumulated from its four EXACT 12x12-bit sub-products through a
    TwoSum chain — ~35 fused f32 elementwise ops, still HBM-bound.

    FMA-contraction proofness (hard-won): XLA's CPU codegen contracts a
    multiply feeding an add into an fma INSIDE fused loops — no HLO-level
    barrier prevents it — which silently breaks the classic Dekker form
    ``s = y + main; err = exact(a*p) - main`` because ``s`` sees the
    UNROUNDED product while ``err`` sees the rounded one (measured:
    pair accuracy degraded to 2^-26 and the extruded solver's recurrence
    went optimistic by 3500x vs the true residual).  The rule applied
    here: only EXACT products may feed additions — contracting an exact
    product into an fma is bit-identical to the strict evaluation, so
    every two_sum below is immune; the ``small`` cross terms sit at the
    2^-48 tail where contraction noise is irrelevant.
    """
    ph, pl = p
    yh, yl = y
    ah32 = alpha.astype(jnp.float32)
    al32 = (alpha - ah32.astype(alpha.dtype)).astype(jnp.float32)
    a1, a2 = _veltkamp(ah32)
    p1, p2 = _veltkamp(ph)
    # exact sub-products of ah32 * ph (each fits 24 mantissa bits)
    s0, e0 = _two_sum(a1 * p1, a1 * p2)
    s1, e1 = _two_sum(s0, a2 * p1)
    s2, e2 = _two_sum(s1, a2 * p2)  # s2 + (e0+e1+e2) == ah32 * ph exactly
    s3, e3 = _two_sum(yh, s2)
    small = ah32 * pl + al32 * ph
    return _renorm(s3, yl + (e3 + (e0 + (e1 + e2)) + small))


def two_prod(a: jax.Array, b: jax.Array):
    """(p, e) with a * b == p + e exactly and |e| <~ ulp(p) (f32 EFT).

    NOT the classic Dekker form ``p = fl(a*b); e = exact - p``: callers
    feed ``p`` into subsequent additions (TwoSum accumulation chains),
    and XLA:CPU's LLVM contracts a multiply feeding an add into an fma —
    the fma's UNROUNDED product would then disagree with the ``e``
    computed against the rounded one (the exact failure mode measured on
    :func:`axpy`, see module docstring).  Instead ``p`` is itself
    accumulated from the four EXACT 12x12-bit sub-products through a
    TwoSum chain (contracting an exact product into an fma is
    bit-identical), so every downstream use is contraction-proof.
    Operands broadcast; the Veltkamp splits happen at the pre-broadcast
    shapes.
    """
    a1, a2 = _veltkamp(a)
    b1, b2 = _veltkamp(b)
    s0, e0 = _two_sum(a1 * b1, a1 * b2)
    s1, e1 = _two_sum(s0, a2 * b1)
    s2, e2 = _two_sum(s1, a2 * b2)
    return s2, e0 + (e1 + e2)


def neg(v):
    """-v for pairs (exact)."""
    return -v[0], -v[1]


def scale(s64: jax.Array, v):
    """f64 scalar (or array) * pair -> pair, first-order EFT (~2^-48).

    The scalar splits exactly into f32 (sh + sl); sh * v_hi is a Dekker
    product, the sh*v_lo + sl*v_hi cross terms stay plain f32 (2^-48
    tail).  Drops the O(2^-48^2) sl*v_lo term.
    """
    vh, vl = v
    sh = s64.astype(jnp.float32)
    sl = (s64 - sh.astype(s64.dtype)).astype(jnp.float32)
    p, e = two_prod(sh, vh)
    return _renorm(p, e + (sh * vl + sl * vh))


def mul(u, v):
    """pair * pair -> pair, first-order EFT (drops the u_lo*v_lo term)."""
    uh, ul = u
    vh, vl = v
    p, e = two_prod(uh, vh)
    return _renorm(p, e + (uh * vl + ul * vh))


def dot(u, v) -> jax.Array:
    """<u, v> for pairs as an f64 scalar, effectively f64-exact.

    Element products use Dekker EFT (exact f32 product + error), summed
    by an f64-accumulator tree reduction — errors only from the 2^-48
    cross terms.  Traffic-bound: four f32 reads.
    """
    uh, ul = u
    vh, vl = v
    u1, u2 = _veltkamp(uh)
    v1, v2 = _veltkamp(vh)
    main = uh * vh
    err = ((u1 * v1 - main) + u1 * v2 + u2 * v1) + u2 * v2
    cross = uh * vl + ul * vh
    return jnp.sum(main, dtype=jnp.float64) + jnp.sum(err + cross, dtype=jnp.float64)
