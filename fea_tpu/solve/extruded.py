"""Extruded-family solve — the reference's tube family
(``/root/reference/fea.py:28-65``, ``utils.py:356-376``) at scale:
semi-structured MXU operator + z-semicoarsened multigrid with the
section-RBM coarse space (ops/extruded*.py)."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..scene import Scene
from ._types import Solution
from .cache import _cached_build

def build_extruded(scene: Scene, detected=None, *, degree: int = 3,
                   device_build: bool = True, section_coarse: bool = True,
                   section_aggregates: int = 64):
    """One-time setup for :func:`solve_extruded`: returns ``(op, mg)``.

    By default the hierarchy's O(b^3) block algebra (section-block
    inverses, lambda_max bound, Thomas factors) runs on device
    (ops/extruded_mg.py device path); the host does only the O(Q2) Ke
    integrations.  Callers solving many load cases on one mesh build
    once and pass the result via ``solve_extruded(..., prebuilt=...)``.
    ``device_build=False`` selects the all-host f64 NumPy build.

    ``section_coarse`` (default) composes the z-resolved section-RBM
    coarse space multiplicatively with the V-cycle — the component that
    removes the shell-bending modes z-only coarsening cannot see
    (~1.7-2x fewer FCG iterations on thin tubes; ops/extruded_mg.py
    ``SectionCoarse``)."""
    from ..ops.extruded import build_extruded_operator, infer_extruded
    from ..ops.extruded_mg import (
        ComposedExtrudedPrecond,
        build_extruded_multigrid,
        build_section_coarse,
    )

    detected = detected if detected is not None else infer_extruded(scene)
    if detected is None:
        raise ValueError(
            "scene is not a layer-major uniform extrusion; build it with "
            "fea_tpu.mesh.extrude_quads (reference stack_faces_2d ordering)"
        )
    op = build_extruded_operator(scene, detected, dtype=jnp.float64)
    mg = build_extruded_multigrid(scene, detected, degree=degree,
                                  device_build=device_build)
    if section_coarse:
        sc = build_section_coarse(
            scene, detected, target_section_aggregates=section_aggregates
        )
        mg = ComposedExtrudedPrecond(mg=mg, sc=sc)
    return op, mg


def solve_extruded(
    scene: Scene,
    detected=None,
    *,
    tol: float = 1e-8,
    max_iters: int = 300,
    degree: int = 3,
    prebuilt=None,
    krylov: str = "dd",
) -> Solution:
    """Scale path for extruded (layer-major) meshes — the reference's tube
    family (/root/reference/fea.py:28-65, utils.py:356-376) at resolutions
    the generic gather/scatter + Jacobi path cannot reach.

    Flexible-PCG whose preconditioner is the f32 z-semicoarsened
    multigrid V-cycle with per-layer section-block Chebyshev smoothing
    and an exact block-tridiagonal coarse solve (ops/extruded_mg.py).
    The operator apply is one batched MXU einsum over (layers, section
    quads) — no per-element gather/scatter (ops/extruded.py).

    ``krylov`` selects the vector arithmetic of the outer recurrence:

    * ``"dd"`` (default): every Krylov vector is a double-f32 pair and
      the axpys/dots run in ``ops.df64`` EFT arithmetic; ONLY the
      operator apply itself runs in (emulated) f64 — still the exact
      operator, so there is no dd-operator tolerance floor here.
      Measured at tube scale (591k DOF): 26.6 -> ~7 ms per iteration —
      the TPU-emulated f64 vector algebra was ~4x the cost of the apply
      and V-cycle combined.
    * ``"f64"``: all-f64 recurrence (the reference semantics twin;
      pinned against "dd" in tests).

    ``detected`` is ``infer_extruded(scene)`` output (re-detected when
    None).  Raises ValueError if the scene is not a uniform layer-major
    extrusion or its layer count cannot coarsen to a block-tridiagonal
    direct solve (pick an element-layer count of the form k * 2^m with
    k <= 16).  ``prebuilt``: an ``(op, mg)`` pair from
    :func:`build_extruded` — skips the host hierarchy build (seconds)
    when solving many load cases on one mesh.
    """
    op, mg = (
        prebuilt if prebuilt is not None
        else _cached_build(
            ("extruded", degree), scene,
            lambda: build_extruded(scene, detected, degree=degree),
        )
    )
    loads = scene.loads.astype(jnp.float64)
    prescribed = scene.prescribed_or_zero(jnp.float64)
    solver_jit = _solve_extruded_dd_jit if krylov == "dd" else _solve_extruded_jit
    sol = solver_jit(
        op, mg, loads, prescribed, tol=tol, max_iters=max_iters
    )
    if scene.prescribed is not None:
        fixed = (1.0 - op.free) > 0
        u = jnp.where(fixed, prescribed, sol.displacements)
        sol = Solution(
            displacements=u, reactions=sol.reactions, stats=sol.stats
        )
    return sol


def extruded_mg_coarsenable(n_element_layers: int, thomas_layers: int = 17) -> bool:
    """True when the z hierarchy reaches a block-tridiagonal direct solve
    (<= 64 node layers): halve while even and above the Thomas target."""
    lz = n_element_layers
    while lz > thomas_layers - 1 and lz % 2 == 0:
        lz //= 2
    return lz + 1 <= 64


@partial(jax.jit, static_argnames=("tol", "max_iters"))
def _solve_extruded_jit(op, mg, loads, prescribed, *, tol, max_iters):
    from ..solvers.cg import fpcg

    b = op.rhs(loads, prescribed)
    x0 = (1.0 - op.free) * prescribed

    def precond(r64):
        return mg(r64.astype(jnp.float32)).astype(jnp.float64)

    u, stats = fpcg(op.apply, b, x0, precond=precond, tol=tol, max_iters=max_iters)
    reactions = op.apply_raw(u)
    return Solution(displacements=u, reactions=reactions, stats=stats)


@partial(jax.jit, static_argnames=("tol", "max_iters"))
def _solve_extruded_dd_jit(op, mg, loads, prescribed, *, tol, max_iters):
    """Hybrid pair-space extruded solve (solvers/cg.py::fpcg_dd64):
    double-f32 EFT vector algebra around the EXACT emulated-f64 operator
    apply, with the iterate accumulated in true f64 — same answer and
    true-residual tracking as the all-f64 fpcg at ~1/4 the per-iteration
    cost (26.6 -> ~7 ms at 591k DOF)."""
    from ..solvers.cg import fpcg_dd64

    b = op.rhs(loads, prescribed)
    x0 = (1.0 - op.free) * prescribed
    u, stats = fpcg_dd64(
        op.apply, b, x0, precond32=mg, tol=tol, max_iters=max_iters
    )
    reactions = op.apply_raw(u)
    return Solution(displacements=u, reactions=reactions, stats=stats)


