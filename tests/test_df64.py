"""Double-f32 pair arithmetic accuracy — UNDER JIT, on this backend.

Regression for a hard-won bug: XLA:CPU's codegen FMA-contracts a
multiply feeding an add inside fused loops (no HLO-level barrier
prevents it), which broke the classic Dekker-product axpy to 2^-26
accuracy under jit while the same ops were exact eagerly — the
extruded pair-space solver's recurrence then went optimistic by 3500x
against the true residual.  df64.axpy is now written so only EXACT
products feed additions (contraction of an exact product is
bit-identical), making it compiler-agnostic; these tests pin ~2^-48
pair accuracy for the jitted forms on whatever backend the suite runs.
(TPU was measured unaffected either way: old and new forms both
~6e-15 on-chip.)
"""
import jax
import jax.numpy as jnp
import numpy as np

from fea_tpu.ops import df64

RNG = np.random.default_rng(7)
N = 20000


def _vals():
    y = RNG.standard_normal(N)
    p = RNG.standard_normal(N)
    return y, p


def test_jit_axpy_pair_accuracy():
    y64, p64 = _vals()
    alpha = 1.2345678912345678
    yp = df64.split(jnp.asarray(y64))
    pp = df64.split(jnp.asarray(p64))
    h, l = jax.jit(df64.axpy)(jnp.asarray(alpha), pp, yp)
    got = np.asarray(h, np.float64) + np.asarray(l, np.float64)
    ref = y64 + alpha * p64
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert rel < 1e-13  # ~2^-48 + accumulation; 2^-26 when broken


def test_jit_axpy_inside_larger_program():
    """The contraction fired only inside larger fused bodies — pin the
    composed form (axpy feeding a dot, as the CG loop uses it)."""
    y64, p64 = _vals()
    alpha = -0.87654321987654321

    def step(alpha, p, y):
        r = df64.axpy(alpha, p, y)
        return r, df64.dot(r, r)

    yp = df64.split(jnp.asarray(y64))
    pp = df64.split(jnp.asarray(p64))
    (h, l), rr = jax.jit(step)(jnp.asarray(alpha), pp, yp)
    got = np.asarray(h, np.float64) + np.asarray(l, np.float64)
    ref = y64 + alpha * p64
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-13
    assert abs(float(rr) - float(ref @ ref)) / abs(float(ref @ ref)) < 1e-13


def test_jit_dot_accuracy():
    y64, p64 = _vals()
    yp = df64.split(jnp.asarray(y64))
    pp = df64.split(jnp.asarray(p64))
    got = float(jax.jit(df64.dot)(yp, pp))
    ref = float(y64 @ p64)
    assert abs(got - ref) / abs(ref) < 1e-13


def test_jit_add_and_roundtrip():
    y64, p64 = _vals()
    yp = df64.split(jnp.asarray(y64))
    pp = df64.split(jnp.asarray(p64))
    h, l = jax.jit(df64.add)(yp, pp)
    got = np.asarray(h, np.float64) + np.asarray(l, np.float64)
    ref = y64 + p64
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-13
    back = np.asarray(jax.jit(lambda v: df64.combine(v, jnp.float64))(yp))
    assert np.max(np.abs(back - y64)) < 1e-13


def test_jit_two_prod_pair_accuracy():
    """p + e == a * b to ~2^-47 under jit (the contraction-proof chain
    form rounds only when combining the exact sub-products' e-terms) —
    the product EFT used by the pair-space quadrature apply
    (ops/ddq.py).  Checked in f64, where f32 products are exact."""
    y64, p64 = _vals()
    a = jnp.asarray(y64, jnp.float32)
    b = jnp.asarray(p64, jnp.float32)
    p, e = jax.jit(df64.two_prod)(a, b)
    want = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    denom = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / denom < 1e-13


def test_jit_scale_and_mul_accuracy():
    y64, p64 = _vals()
    yp = df64.split(jnp.asarray(y64))
    pp = df64.split(jnp.asarray(p64))
    s = -3.0000000123456789
    h, l = jax.jit(df64.scale)(jnp.asarray(s), yp)
    got = np.asarray(h, np.float64) + np.asarray(l, np.float64)
    ref = s * y64
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-13
    h, l = jax.jit(df64.mul)(yp, pp)
    got = np.asarray(h, np.float64) + np.asarray(l, np.float64)
    ref = y64 * p64
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-13
