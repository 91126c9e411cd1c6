"""Dense masked solve — small systems, oracles, and the CG cross-check.

The jit-compatible equivalent of the reference's reduce-and-solve
(``/root/reference/fea.py:99-105``): instead of slicing free rows/columns
(data-dependent shapes), the dense matrix of the *masked* operator
A = diag(F) K diag(F) + diag(1-F) is solved directly — same solution on
free DOFs, prescribed values on fixed ones.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .cg import SolveStats
from ..dtypes import Policy, default_policy, precise_dot

__all__ = ["dense_solve", "masked_dense_matrix"]


def masked_dense_matrix(K: jax.Array, free_flat: jax.Array) -> jax.Array:
    """A = diag(F) K diag(F) + diag(1-F) for a flat 0/1 free mask."""
    F = free_flat.astype(K.dtype)
    A = K * F[:, None] * F[None, :]
    return A + jnp.diag(1.0 - F)


def dense_solve(
    K: jax.Array,
    b_flat: jax.Array,
    free_flat: jax.Array,
    policy: Policy | None = None,
) -> tuple[jax.Array, SolveStats]:
    """Solve the masked dense system; returns (x_flat, SolveStats)."""
    policy = policy or default_policy()
    A = masked_dense_matrix(K, free_flat)
    x = jnp.linalg.solve(A, b_flat)
    r = b_flat - A @ x
    acc = policy.accum
    rnorm = jnp.sqrt(precise_dot(r, r, acc))
    bnorm = jnp.sqrt(precise_dot(b_flat, b_flat, acc))
    safe_b = jnp.where(bnorm > 0, bnorm, jnp.asarray(1.0, acc))
    stats = SolveStats(
        iterations=jnp.asarray(1, jnp.int32),
        residual_norm=rnorm,
        relative_residual=rnorm / safe_b,
        converged=jnp.asarray(True),
    )
    return x, stats
