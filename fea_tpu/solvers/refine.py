"""Mixed-precision iterative refinement around the f32 PCG core.

Why this exists (SURVEY.md §7 "Hard parts: Precision"): on a slender,
finely meshed elasticity problem the attainable *true* relative residual
of an all-f32 CG is ~eps_f32 * kappa — measured on this hardware the f32
recurrence "converges" to 1e-8 while the actual residual stagnates orders
of magnitude higher and the tip deflection is wrong by >10x.  TPU f64 is
emulated but available for the few operations that need it, so the
textbook mixed-precision fix applies:

    repeat (outer, f64):   r  = b - A_hi x          # true residual
           (inner, f32):   d ~= A_lo^-1 r           # Jacobi-PCG, loose tol
           (outer, f64):   x += d

Each outer step costs one f64 operator apply; the inner f32 PCG does the
heavy lifting.  Converges to f64-level residuals whenever
kappa(A) * eps_f32 < 1 (comfortably true for Jacobi-preconditioned
voxel elasticity at 10^6 DOF), with total inner-iteration count close to
a hypothetical all-f64 CG at a fraction of its bandwidth cost.

Requires x64 enabled.  Fully jit-compatible (outer loop is a
lax.while_loop).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..dtypes import Policy, precise_dot
from .cg import SolveStats, pcg

__all__ = ["pcg_refined"]


def pcg_refined(
    apply_hi: Callable[[jax.Array], jax.Array],
    apply_lo: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    precond_diag_lo: Optional[jax.Array] = None,
    precond_lo: Optional[Callable[[jax.Array], jax.Array]] = None,
    tol: float = 1e-8,
    max_outer: int = 25,
    inner_tol: float = 1e-3,
    inner_iters: int = 4000,
    lo_dtype=jnp.float32,
    hi_dtype=jnp.float64,
) -> tuple[jax.Array, SolveStats]:
    """Solve A x = b to ``tol`` relative residual *measured in f64*.

    apply_hi / apply_lo are the same SPD operator at high / low precision.
    Returns (x in hi dtype, SolveStats) where ``iterations`` counts the
    total inner CG iterations (the dominant cost) and
    ``relative_residual`` is the true f64 relative residual.
    """
    hi = jnp.dtype(hi_dtype)
    lo = jnp.dtype(lo_dtype)
    b = b.astype(hi)
    x = jnp.zeros_like(b) if x0 is None else x0.astype(hi)

    lo_policy = Policy(compute=lo, accum=hi)
    b_norm = jnp.sqrt(precise_dot(b, b, hi))
    safe_b = jnp.where(b_norm > 0, b_norm, jnp.asarray(1.0, hi))

    def true_residual(xk):
        return b - apply_hi(xk)

    r = true_residual(x)
    rnorm = jnp.sqrt(precise_dot(r, r, hi))

    def cond(state):
        _, _, rn, k, _ = state
        return jnp.logical_and(rn > tol * safe_b, k < max_outer)

    def body(state):
        xk, rk, rn, k, inner_total = state
        d, stats = pcg(
            apply_lo,
            rk.astype(lo),
            precond_diag=precond_diag_lo,
            precond=precond_lo,
            tol=inner_tol,
            max_iters=inner_iters,
            policy=lo_policy,
        )
        xn = xk + d.astype(hi)
        rn_vec = true_residual(xn)
        rn_norm = jnp.sqrt(precise_dot(rn_vec, rn_vec, hi))
        return (xn, rn_vec, rn_norm, k + 1, inner_total + stats.iterations)

    state = (x, r, rnorm, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    x, r, rnorm, outers, inner_total = jax.lax.while_loop(cond, body, state)

    stats = SolveStats(
        iterations=inner_total,
        residual_norm=rnorm,
        relative_residual=rnorm / safe_b,
        converged=rnorm <= tol * safe_b,
    )
    return x, stats


def pcg_refined_host(
    apply_hi: Callable[[jax.Array], jax.Array],
    apply_lo: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    precond_diag_lo: Optional[jax.Array] = None,
    precond_lo: Optional[Callable[[jax.Array], jax.Array]] = None,
    tol: float = 1e-8,
    max_outer: int = 25,
    inner_tol: float = 1e-3,
    inner_iters: int = 4000,
    lo_dtype=jnp.float32,
    hi_dtype=jnp.float64,
) -> tuple[jax.Array, SolveStats]:
    """Same algorithm as :func:`pcg_refined` but with the outer loop on the
    host, calling two separately jitted device programs (the f64 residual
    step and the f32 inner solve).

    Two reasons to prefer this on the tunneled TPU backend: the split
    halves the size of each XLA program (the monolithic one can take
    >10 min in this toolchain's compiler), and the handful of outer
    iterations makes per-call dispatch overhead negligible.
    """
    hi = jnp.dtype(hi_dtype)
    lo = jnp.dtype(lo_dtype)
    lo_policy = Policy(compute=lo, accum=hi)
    b = b.astype(hi)
    x = jnp.zeros_like(b) if x0 is None else x0.astype(hi)

    @jax.jit
    def residual_step(xk):
        r = b - apply_hi(xk)
        return r, jnp.sqrt(precise_dot(r, r, hi))

    @jax.jit
    def inner_solve(rk):
        d, st = pcg(
            apply_lo,
            rk.astype(lo),
            precond_diag=precond_diag_lo,
            precond=precond_lo,
            tol=inner_tol,
            max_iters=inner_iters,
            policy=lo_policy,
        )
        return d, st.iterations

    b_norm = float(jnp.sqrt(precise_dot(b, b, hi)))
    safe_b = b_norm if b_norm > 0 else 1.0
    inner_total = 0
    r, rnorm = residual_step(x)
    for _ in range(max_outer):
        if float(rnorm) <= tol * safe_b:
            break
        d, iters = inner_solve(r)
        inner_total += int(iters)
        x = x + d.astype(hi)
        r, rnorm = residual_step(x)

    rn = float(rnorm)
    stats = SolveStats(
        iterations=jnp.asarray(inner_total, jnp.int32),
        residual_norm=jnp.asarray(rn, hi),
        relative_residual=jnp.asarray(rn / safe_b, hi),
        converged=jnp.asarray(rn <= tol * safe_b),
    )
    return x, stats
