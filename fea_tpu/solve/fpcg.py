"""Operator-level solver entry points: f64 flexible-PCG with an f32
multigrid preconditioner, and the legacy mixed-precision refinement
wrappers."""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ._types import Solution

@partial(
    jax.jit,
    static_argnames=("config", "tol", "max_outer", "inner_tol", "inner_iters"),
)
def solve_operator_refined(
    op_hi,
    op_lo,
    loads: jax.Array,
    prescribed: jax.Array,
    precond_lo=None,
    *,
    config=None,
    tol: Optional[float] = None,
    max_outer: Optional[int] = None,
    inner_tol: Optional[float] = None,
    inner_iters: Optional[int] = None,
) -> Solution:
    """Mixed-precision solve: f64 true-residual refinement wrapped around
    the f32 Jacobi-PCG (see fea_tpu.solvers.refine).  ``op_hi`` must be
    built at f64 and ``op_lo`` is its cast (``op_hi.astype(jnp.float32)``).

    This is the production path for ill-conditioned/large systems where
    an all-f32 recurrence reports fake convergence (slender cantilevers at
    fine resolution — measured on TPU, SURVEY.md §7 'Precision').
    Requires x64 enabled.
    """
    from ..config import DEFAULT_CONFIG
    from ..solvers.refine import pcg_refined

    cfg = config if config is not None else DEFAULT_CONFIG
    tol = cfg.tol if tol is None else tol
    max_outer = cfg.max_outer if max_outer is None else max_outer
    inner_tol = cfg.inner_tol if inner_tol is None else inner_tol
    inner_iters = cfg.inner_iters if inner_iters is None else inner_iters
    hi = op_hi.free.dtype
    loads = loads.astype(hi)
    prescribed = prescribed.astype(hi)
    b = op_hi.rhs(loads, prescribed)
    x0 = (1.0 - op_hi.free) * prescribed
    diag_lo = None if precond_lo is not None else op_lo.diag_masked()
    u, stats = pcg_refined(
        op_hi.apply,
        op_lo.apply,
        b,
        x0,
        precond_diag_lo=diag_lo,
        precond_lo=precond_lo,
        tol=tol,
        max_outer=max_outer,
        inner_tol=inner_tol,
        inner_iters=inner_iters,
        lo_dtype=op_lo.free.dtype,
        hi_dtype=hi,
    )
    reactions = op_hi.apply_raw(u)
    return Solution(displacements=u, reactions=reactions, stats=stats)


def solve_operator_refined_host(
    op_hi,
    op_lo,
    loads: jax.Array,
    prescribed: jax.Array,
    precond_lo=None,
    *,
    config=None,
    tol: Optional[float] = None,
    max_outer: Optional[int] = None,
    inner_tol: Optional[float] = None,
    inner_iters: Optional[int] = None,
) -> Solution:
    """Host-outer-loop variant of :func:`solve_operator_refined` (two
    smaller device programs instead of one monolith — see
    fea_tpu.solvers.refine.pcg_refined_host for why)."""
    from ..config import DEFAULT_CONFIG
    from ..solvers.refine import pcg_refined_host

    cfg = config if config is not None else DEFAULT_CONFIG
    tol = cfg.tol if tol is None else tol
    max_outer = cfg.max_outer if max_outer is None else max_outer
    inner_tol = cfg.inner_tol if inner_tol is None else inner_tol
    inner_iters = cfg.inner_iters if inner_iters is None else inner_iters
    hi = op_hi.free.dtype
    loads = loads.astype(hi)
    prescribed = prescribed.astype(hi)
    b = op_hi.rhs(loads, prescribed)
    x0 = (1.0 - op_hi.free) * prescribed
    diag_lo = None if precond_lo is not None else op_lo.diag_masked()
    u, stats = pcg_refined_host(
        op_hi.apply,
        op_lo.apply,
        b,
        x0,
        precond_diag_lo=diag_lo,
        precond_lo=precond_lo,
        tol=tol,
        max_outer=max_outer,
        inner_tol=inner_tol,
        inner_iters=inner_iters,
        lo_dtype=op_lo.free.dtype,
        hi_dtype=hi,
    )
    reactions = op_hi.apply_raw(u)
    return Solution(displacements=u, reactions=reactions, stats=stats)


@partial(jax.jit, static_argnames=("tol", "max_iters"))
def solve_operator_fpcg(
    op_hi,
    loads: jax.Array,
    prescribed: jax.Array,
    precond_lo,
    *,
    tol: float = 1e-8,
    max_iters: int = 300,
) -> Solution:
    """f64 flexible-PCG with a low-precision (f32 multigrid) preconditioner
    — the production large-scale path.

    Replaces mixed-precision *refinement* at scale: refinement's per-outer
    gain is ~kappa*eps_f32 which stalls near 1e-5 at 10^6 DOF, while FCG's
    f64 recurrence converges to 1e-8+ true residual in the same ~10-15
    V-cycles (see solvers.cg.fpcg).  One jitted program, no host loop.
    ``op_hi`` must be built at f64; ``precond_lo`` maps f32 (N,3)->(N,3).
    """
    from ..solvers.cg import fpcg

    hi = op_hi.free.dtype
    loads = loads.astype(hi)
    prescribed = prescribed.astype(hi)
    b = op_hi.rhs(loads, prescribed)
    x0 = (1.0 - op_hi.free) * prescribed

    def M(r):
        return precond_lo(r.astype(jnp.float32)).astype(hi)

    u, stats = fpcg(op_hi.apply, b, x0, precond=M, tol=tol, max_iters=max_iters)
    reactions = op_hi.apply_raw(u)
    return Solution(displacements=u, reactions=reactions, stats=stats)


