"""Solver configuration (SURVEY.md §5.6: "a small dataclass-based
scene/solver config — no heavyweight flag framework warranted").

One place for the tolerance / iteration-budget / refinement knobs that
round 1 duplicated across solve.py, bench.py and __graft_entry__.py with
drifting per-call-site defaults (VERDICT.md weak: config).  All solver
entry points accept ``config=``; explicit keyword arguments win over the
config, which wins over the built-in defaults.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

__all__ = ["SolverConfig", "DEFAULT_CONFIG"]


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Tolerances and budgets for the linear solvers.

    Attributes:
      tol:         target relative residual (f64-true for refined solves).
      max_iters:   CG iteration cap; None -> heuristic from n_dof.
      method:      'auto' | 'cg' | 'dense' (solve()).
      precondition: Jacobi preconditioning for plain CG.
      inner_tol:   inner f32 solve tolerance per refinement outer step.
      inner_iters: inner CG iteration cap per outer step.
      max_outer:   refinement outer-step cap.
      mg_degree:   Chebyshev smoother degree for multigrid.
      on_nonconverged: 'warn' | 'raise' | 'ignore' (host-facing solves).
      debug_nans:  run the solve under ``jax.debug_nans`` so the FIRST
                   NaN-producing primitive raises FloatingPointError with
                   its location, instead of the NaN surfacing later as a
                   blow-up bail-out (SURVEY.md §5.2's sanitizer analog;
                   costs a re-trace + per-output checks — debugging only).
    """

    tol: float = 1e-8
    max_iters: Optional[int] = None
    method: str = "auto"
    precondition: bool = True
    inner_tol: float = 1e-3
    inner_iters: int = 2000
    max_outer: int = 25
    mg_degree: int = 4
    on_nonconverged: str = "warn"
    debug_nans: bool = False
    # sharded: None -> auto (take the z-sharded flagship solver when the
    # backend is TPU with >1 device); True forces it on any multi-device
    # backend (tests / dryrun use this on the 8-virtual-CPU mesh, with
    # the Pallas kernels in interpreter mode); False pins single-device.
    sharded: Optional[bool] = None


DEFAULT_CONFIG = SolverConfig()
