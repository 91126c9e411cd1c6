"""Dtype policy for mixed-precision FEA on TPU.

TPU f64 is emulated and slow; the compute path therefore runs in f32 by
default, with reductions (CG dot products, residual norms) accumulated in
the widest *enabled* dtype.  On CPU test runs with ``jax_enable_x64`` the
policy transparently upgrades accumulation to f64, which is what the
1e-8-relative-residual acceptance tests use.

The reference (jjrreett/fea) runs everything in NumPy default f64
(``/root/reference/utils.py:127-239``); this module is where the new
framework's precision strategy diverges deliberately (SURVEY.md §7
"Hard parts: Precision").
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["Policy", "default_policy", "x64_enabled", "precise_dot"]


def x64_enabled() -> bool:
    """True when jax_enable_x64 is active (f64 arrays are representable)."""
    return bool(jax.config.jax_enable_x64)


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy threaded through assembly and solvers.

    Attributes:
      compute: dtype of element arrays, gathered displacements, SpMV.
      accum:   dtype for inner products / scalar recurrences in CG.
      index:   dtype for connectivity / gather-scatter plans.
    """

    compute: jnp.dtype = jnp.float32
    accum: jnp.dtype = jnp.float32
    index: jnp.dtype = jnp.int32

    def widest(self) -> jnp.dtype:
        return self.accum if jnp.finfo(self.accum).bits >= jnp.finfo(self.compute).bits else self.compute


def default_policy() -> Policy:
    """f32 compute everywhere; f64 accumulation when x64 is enabled."""
    accum = jnp.float64 if x64_enabled() else jnp.float32
    return Policy(compute=jnp.dtype(jnp.float32), accum=jnp.dtype(accum))


def precise_dot(a: jax.Array, b: jax.Array, accum_dtype) -> jax.Array:
    """<a, b> accumulated in ``accum_dtype``.

    XLA lowers the sum to a tree reduction, so even the f32 path has
    O(log n)·eps rounding rather than the serial O(n)·eps — enough for
    CG scalar recurrences at 10^6 DOF.  The f64 path (CPU tests, or TPU
    with x64 emulation accepted) is exact to f64.
    """
    a = a.ravel()
    b = b.ravel()
    if jnp.dtype(accum_dtype) != a.dtype:
        a = a.astype(accum_dtype)
        b = b.astype(accum_dtype)
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)
