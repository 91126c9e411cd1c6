"""Solvers: matrix-free PCG (the workhorse), dense fallback, Newton-Krylov.

The reference solves with dense ``np.linalg.solve`` (O(n^3),
``/root/reference/fea.py:105``) and its author left ``# TODO iterative
solver`` right under it (fea.py:106); the relaxation loop in truss.py is
its embryonic nonlinear solver.  These modules are those TODOs, built
TPU-first.
"""
from .cg import SolveStats, fpcg, pcg  # noqa: F401
from .dense import dense_solve  # noqa: F401
from .newton import newton_krylov  # noqa: F401
from .refine import pcg_refined  # noqa: F401

__all__ = ["pcg", "fpcg", "SolveStats", "dense_solve", "newton_krylov", "pcg_refined"]
