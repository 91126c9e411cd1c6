"""fea-tpu: TPU-native finite-element structural analysis.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference FEA prototype (jjrreett/fea — see SURVEY.md): linear static
analysis of truss bars, Euler-Bernoulli beams, and 8-node hexahedral
solids, from the same array-oriented scene description
(nodes / elements / per-DOF constraint mask / nodal loads), plus the
things the reference only gestured at: a matrix-free iterative solver,
a convergent nonlinear (Newton-Krylov) path, batched design sweeps,
multi-device sharding, and performance observability.

Quick start::

    import fea_tpu as ft

    nodes, elements = ft.mesh.box_hex_mesh(4, 4, 49, 0.1, 0.1, 1.0)
    fixed = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, dofs_per_node=3)
    loads = ...                                   # (N, 3) nodal forces
    scene = ft.make_scene(nodes, elements, fixed, loads,
                          ft.Material(E=10e6 * ft.units.psi, nu=0.3))
    sol = ft.solve(scene, tol=1e-8)
    sol.displacements, sol.reactions, sol.stats
"""
from __future__ import annotations

import numpy as _np

from . import assembly, mesh, ops, parallel, post, utils, viz
from .config import DEFAULT_CONFIG, SolverConfig
from .dtypes import Policy, default_policy
from .materials import Material, units
from .operator import StiffnessOperator, build_operator
from .scene import FAMILIES, ElementFamily, Scene, make_scene
from .ops.twolevel import (
    TwoLevelChebPrecond,
    TwoLevelPrecond,
    build_two_level,
    build_two_level_cheb,
)
from .solve import (
    Solution,
    build_curvilinear,
    build_extruded,
    solve_curvilinear,
    solve_extruded,
    solve,
    solve_displacements,
    solve_many,
    solve_nonlinear,
    solve_operator,
    solve_operator_fpcg,
    solve_operator_refined,
)
from .solvers import SolveStats, dense_solve, newton_krylov, pcg

__version__ = "0.1.0"

__all__ = [
    "SolverConfig",
    "build_curvilinear",
    "build_extruded",
    "build_two_level",
    "build_two_level_cheb",
    "TwoLevelPrecond",
    "TwoLevelChebPrecond",
    "solve_curvilinear",
    "solve_extruded",
    "solve_many",
    "DEFAULT_CONFIG",
    "Material",
    "units",
    "Scene",
    "make_scene",
    "ElementFamily",
    "FAMILIES",
    "StiffnessOperator",
    "build_operator",
    "Solution",
    "solve",
    "solve_operator",
    "solve_displacements",
    "solve_nonlinear",
    "solve_operator_fpcg",
    "solve_operator_refined",
    "pcg",
    "dense_solve",
    "newton_krylov",
    "SolveStats",
    "Policy",
    "default_policy",
    "mesh",
    "assembly",
    "post",
    "ops",
    "parallel",
    "utils",
    "viz",
    "fix_where",
]


def fix_where(nodes, predicate, dofs_per_node: int):
    """Constraint-mask builder: fix all DOFs of nodes selected by
    ``predicate(nodes) -> (N,) bool`` (reference pattern B1:
    /root/reference/fea.py:119-121 fixes all z==0 nodes)."""
    nodes = _np.asarray(nodes)
    sel = _np.asarray(predicate(nodes)).astype(bool)
    mask = _np.zeros((nodes.shape[0], dofs_per_node), dtype=bool)
    mask[sel] = True
    return mask
