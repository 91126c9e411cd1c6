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
           (outer, f64):   x += alpha* d            # line-searched step

Each outer step costs one f64 operator apply (w = A_hi d, which serves
both the optimal step length alpha* = <r,w>/<w,w> and the residual
update r <- r - alpha* w).  The line search is the divergence guard:
||r_new||^2 = ||r||^2 - <r,w>^2/<w,w> <= ||r||^2, so the outer residual
is monotonically non-increasing BY CONSTRUCTION — an inner solve that
returns garbage (the round-1 failure mode: a mis-windowed Chebyshev
smoother at 1M DOF) yields alpha* ~ 0 instead of a 10^14x residual
explosion, and the stall detector exits with converged=False.  When the
inner solve is good, w ~ r and alpha* ~ 1: plain refinement.

Converges to f64-level residuals ONLY while kappa(A) * eps_f32 < 1.
Measured on the benchmark cantilever: per-outer true-residual reduction
is ~0.18 at 140k DOF (kappa ~ 3e6) and approaches 1 at 1M DOF
(kappa ~ 1e7) — the solve stalls near 1e-5 there regardless of inner
quality.  For large/ill-conditioned systems use
:func:`fea_tpu.solvers.cg.fpcg` (f64 flexible-PCG with the f32 V-cycle
as preconditioner), which replaced this as the production path in
round 2; refinement remains correct and cheap at small-to-mid scale.

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

    r = b - apply_hi(x)
    rnorm = jnp.sqrt(precise_dot(r, r, hi))

    def cond(state):
        _, _, rn, k, _, progressing = state
        return jnp.logical_and(
            jnp.logical_and(rn > tol * safe_b, k < max_outer), progressing
        )

    def body(state):
        xk, rk, rn, k, inner_total, _ = state
        d, stats = pcg(
            apply_lo,
            rk.astype(lo),
            precond_diag=precond_diag_lo,
            precond=precond_lo,
            tol=inner_tol,
            max_iters=inner_iters,
            policy=lo_policy,
        )
        # sanitize: a broken inner solve may hand back NaN/inf entries
        d = d.astype(hi)
        d = jnp.where(jnp.isfinite(d), d, jnp.asarray(0.0, hi))
        w = apply_hi(d)
        rw = precise_dot(rk, w, hi)
        ww = precise_dot(w, w, hi)
        good = jnp.logical_and(jnp.isfinite(ww), ww > 0)
        alpha = jnp.where(good, rw / jnp.where(good, ww, 1.0), jnp.asarray(0.0, hi))
        xn = xk + alpha * d
        rn_vec = rk - alpha * w
        rn_norm = jnp.sqrt(precise_dot(rn_vec, rn_vec, hi))
        # A healthy outer step shrinks ||r|| by ~inner_tol; anything over
        # 0.99x is a stall (inner solver broken or f64 floor reached).
        progressing = rn_norm < 0.99 * rn
        return (xn, rn_vec, rn_norm, k + 1, inner_total + stats.iterations, progressing)

    state = (
        x, r, rnorm, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
        jnp.asarray(True),
    )
    x, r, rnorm, outers, inner_total, _ = jax.lax.while_loop(cond, body, state)

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
    def init_residual(xk):
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

    @jax.jit
    def outer_step(xk, rk, d):
        # line-searched update: monotone ||r|| by construction (see module
        # docstring) — the divergence guard for a broken inner solve
        d = d.astype(hi)
        d = jnp.where(jnp.isfinite(d), d, jnp.asarray(0.0, hi))
        w = apply_hi(d)
        rw = precise_dot(rk, w, hi)
        ww = precise_dot(w, w, hi)
        good = jnp.logical_and(jnp.isfinite(ww), ww > 0)
        alpha = jnp.where(good, rw / jnp.where(good, ww, 1.0), jnp.asarray(0.0, hi))
        xn = xk + alpha * d
        rn = rk - alpha * w
        return xn, rn, jnp.sqrt(precise_dot(rn, rn, hi))

    b_norm = float(jnp.sqrt(precise_dot(b, b, hi)))
    safe_b = b_norm if b_norm > 0 else 1.0
    inner_total = 0
    r, rnorm = init_residual(x)
    for _ in range(max_outer):
        if float(rnorm) <= tol * safe_b:
            break
        d, iters = inner_solve(r)
        inner_total += int(iters)
        rnorm_prev = float(rnorm)
        x, r, rnorm = outer_step(x, r, d)
        if float(rnorm) >= 0.99 * rnorm_prev:
            break  # stalled: inner solver broken or f64 floor reached

    rn = float(rnorm)
    stats = SolveStats(
        iterations=jnp.asarray(inner_total, jnp.int32),
        residual_norm=jnp.asarray(rn, hi),
        relative_residual=jnp.asarray(rn / safe_b, hi),
        converged=jnp.asarray(rn <= tol * safe_b),
    )
    return x, stats
