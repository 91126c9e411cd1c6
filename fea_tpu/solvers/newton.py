"""Newton-Krylov solver for geometrically nonlinear problems.

The convergent replacement for the reference's pseudo-dynamic relaxation
loop (``/root/reference/truss.py:95-119``), which never terminates (no
convergence break) and blocks on a matplotlib window every iteration.

TPU-native design: the tangent operator is never assembled — Newton's
linear system J(u) d = -R(u) is solved by CG whose matvec is a
``jax.jvp`` of the residual (a functional-transform capability the NumPy
reference cannot express).  The outer loop is a ``lax.while_loop`` so the
whole nonlinear solve is one compiled program.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .cg import pcg
from ..dtypes import Policy, default_policy, precise_dot

__all__ = ["NewtonStats", "newton_krylov"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NewtonStats:
    iterations: jax.Array  # () int32 — Newton steps taken
    residual_norm: jax.Array  # () accum dtype, ||R(u)||
    converged: jax.Array  # () bool


def newton_krylov(
    residual: Callable[[jax.Array], jax.Array],
    u0: jax.Array,
    *,
    tol: float = 1e-10,
    max_newton_iters: int = 50,
    max_cg_iters: int = 500,
    cg_tol: float = 1e-6,
    policy: Optional[Policy] = None,
) -> tuple[jax.Array, NewtonStats]:
    """Solve residual(u) = 0 by Newton's method with a matrix-free inner CG.

    ``residual`` must have a symmetric positive(-semi)definite Jacobian on
    the relevant subspace (true for elastic internal-force residuals of
    the form F*(K_t(u) du) near stable equilibria, with masked fixed DOFs
    as identity rows).  Convergence is relative to the initial residual:
    ||R(u)|| <= tol * ||R(u0)|| (a zero initial residual converges
    immediately).
    """
    policy = policy or default_policy()
    acc = policy.accum

    def rnorm(u):
        R = residual(u)
        return jnp.sqrt(precise_dot(R, R, acc))

    r0 = rnorm(u0)
    scale = jnp.where(r0 > 0, r0, jnp.asarray(1.0, acc))

    def cond(state):
        u, k = state
        return jnp.logical_and(rnorm(u) > tol * scale, k < max_newton_iters)

    def body(state):
        u, k = state
        R = residual(u)

        def jv(v):
            return jax.jvp(residual, (u,), (v,))[1]

        delta, _ = pcg(
            jv, -R, tol=cg_tol, max_iters=max_cg_iters, policy=policy
        )
        return (u + delta, k + 1)

    u, k = jax.lax.while_loop(cond, body, (u0, jnp.asarray(0, jnp.int32)))
    final = rnorm(u)
    stats = NewtonStats(
        iterations=k, residual_norm=final, converged=final <= tol * scale
    )
    return u, stats
