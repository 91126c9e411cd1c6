"""Curvilinear-family solve: topologically structured meshes (grid
connectivity, arbitrary node positions) through the variable-weight
block stencil + Galerkin-RAP multigrid (ops/curvilinear.py), with host
IEEE-f64 certification through the native C++ kernel."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..scene import Scene
from ._types import Solution
from .cache import _cached_build
from .fpcg import solve_operator_fpcg

def _curv_host_pack(op):
    """Host-side (w_np, packed-native) weight pack for the curvilinear
    certification tier, pulled from the device ONCE per operator and
    cached on the (frozen) operator object — repeat solves on one mesh
    (the reference's own use pattern) pay the ~0.5 GB/812k-DOF pull and
    node-major repack exactly once."""
    import numpy as np

    from .. import native

    pack = getattr(op, "_host_pack", None)
    if pack is None:
        w_np = np.asarray(op.w, np.float64)
        Wn = native.pack_var_weights(w_np) if native.available() else None
        free_np = np.asarray(op.free, np.float64).reshape(-1, 3)
        pack = (w_np, Wn, free_np)
        object.__setattr__(op, "_host_pack", pack)
    return pack


def _host_certify_curvilinear(op, pair_op, mg_t, b64, u, stats, *, tol,
                              max_iters, say=lambda s: None,
                              max_host_passes: int = 2, w_np=None):
    """Host IEEE-f64 certification (+ corrections) for the curvilinear
    family — the flagship's host tier (solve.py::_refine_true) adapted
    to variable weights (round-4, VERDICT r3 #2).

    The on-device certification apply is emulated f64 with a ~2^-48
    noise floor that at 812k-DOF conditioning sits at ~1.5e-8
    host-visible (docs/PERF.md round 3); residuals here are recomputed
    on the HOST in exact IEEE f64 through the native variable-weight
    C++ kernel (fea_tpu/native, ~0.5 s/812k DOF; NumPy twin fallback),
    and corrections run through the fast device pipeline until the
    HOST residual meets tol.  Pulls the weight field to the host once
    (~0.5 GB at 812k — pass ``w_np`` to reuse an existing pull).

    Returns ``(u, stats)`` with stats reporting the host-certified
    residual."""
    import numpy as np

    from .. import native
    from ..ops.curvilinear import curv_apply_np
    from ..solvers.cg import SolveStats, fpcg_dd64_staged

    nx, ny, nz = op.dims
    Z, Y, X = nz + 1, ny + 1, nx + 1
    if w_np is not None:
        Wn = native.pack_var_weights(w_np) if native.available() else None
        free_np = np.asarray(op.free, np.float64).reshape(-1, 3)
    else:
        w_np, Wn, free_np = _curv_host_pack(op)
    b_np = np.asarray(b64, np.float64).reshape(-1, 3)
    b_norm = float(np.linalg.norm(free_np * b_np))
    safe_b = b_norm if b_norm > 0 else 1.0
    total_iters = int(stats.iterations)
    rel_h = float("nan")
    Au = None
    for hp in range(max_host_passes + 1):
        u_np = np.asarray(u, np.float64).reshape(-1, 3)
        if Wn is not None:
            r_np, rn, Au = native.var_stencil_residual_host(
                Wn, u_np, b_np, free_np
            )
        else:
            Au = curv_apply_np(w_np, u_np.reshape(Z, Y, X, 3)).reshape(-1, 3)
            r_np = free_np * (b_np - Au)
            rn = float(np.linalg.norm(r_np))
        rel_h = rn / safe_b
        if rel_h <= tol or hp == max_host_passes or not np.isfinite(rel_h):
            break
        say(f"host-certify pass {hp}: true rel_res {rel_h:.3e}, correcting")
        corr_tol = float(np.clip(0.3 * tol / rel_h, 1e-12, 0.1))
        du, dstats = fpcg_dd64_staged(
            pair_op, jnp.asarray(r_np), jnp.zeros_like(b64),
            precond=mg_t, tol=corr_tol, max_iters=max_iters,
            pair_apply=True,
        )
        u = u + du
        total_iters += int(dstats.iterations)
    stats = SolveStats(
        iterations=jnp.asarray(total_iters, jnp.int32),
        residual_norm=jnp.asarray(rel_h * safe_b, jnp.float64),
        relative_residual=jnp.asarray(rel_h, jnp.float64),
        converged=jnp.asarray(bool(rel_h <= tol), bool),
    )
    # the final certification pass's raw apply IS the reaction field —
    # exact IEEE f64, returned as the HOST array (pushing 20 MB/812k
    # back through the tunnel costs more than every consumer, which
    # pulls reactions host-side anyway)
    return u, stats, Au


def build_curvilinear(scene: Scene, detected=None, *, degree: int = 2,
                      check_jacobians: bool = True, progress=None):
    """One-time setup for :func:`solve_curvilinear`: returns ``(op, mg)``.

    ``op`` is the f64 variable-coefficient block-stencil operator
    (device-assembled weight field) and ``mg`` the re-discretized
    geometric V-cycle over it (ops/curvilinear.py).  Callers solving
    many load cases on one mesh build once and pass the result via
    ``solve_curvilinear(..., prebuilt=...)``."""
    import numpy as np

    from ..ops.curvilinear import (
        build_curv_multigrid,
        build_curv_operator,
        infer_topo_dims,
    )

    detected = detected if detected is not None else infer_topo_dims(scene)
    if detected is None:
        raise ValueError(
            "scene connectivity is not a topological box grid; build it "
            "with fea_tpu.mesh.box_hex_mesh ordering (arbitrary node "
            "positions are fine — only the connectivity must be the grid)"
        )
    op = build_curv_operator(
        scene, detected, dtype=jnp.float64, check_jacobians=check_jacobians,
        progress=progress,
    )
    free_np = 1.0 - np.asarray(scene.fixed, np.float64)
    mg = build_curv_multigrid(
        np.asarray(scene.nodes, np.float64), detected, free_np,
        scene.material, w0=op.w, degree=degree, progress=progress,
    )
    return op, mg


def solve_curvilinear(
    scene: Scene,
    detected=None,
    *,
    tol: float = 1e-8,
    max_iters: int = 300,
    degree: int = 2,
    prebuilt=None,
    check_jacobians: bool = True,
    host_certify: Optional[bool] = None,
) -> Solution:
    """Scale path for TOPOLOGICALLY structured meshes (grid connectivity,
    arbitrary/distorted node positions) — the general-mesh shape every
    reference-style generator produces (`/root/reference/utils.py:356-376`
    extrusion of `cubebeam.py:28-57` grids, with nodes moved anywhere).

    f64 flexible-PCG whose in-loop apply is the exact XLA f64
    variable-coefficient 27-offset block stencil (no gather/scatter
    anywhere; the recurrence residual IS the true residual — pinned by
    test against the host IEEE apply) and whose preconditioner is the
    re-discretized geometric V-cycle, fine level in f32.
    """
    op, mg = (
        prebuilt if prebuilt is not None
        else _cached_build(
            # check_jacobians is part of the key (ADVICE r4): a cache hit
            # from a check_jacobians=False build must not silently skip
            # the inverted-element validation a later caller requested
            ("curvilinear", degree, bool(check_jacobians)), scene,
            lambda: build_curvilinear(scene, detected, degree=degree,
                                      check_jacobians=check_jacobians),
        )
    )
    if jax.default_backend() == "tpu":
        # TPU production pipeline: the fused variable-weight Pallas
        # kernels in the transposed layout (ops/pallas_varstencil.py) —
        # XLA's own lowerings of this stencil run 500-5000x off the HBM
        # floor and the elementwise forms miscompile (curv_apply_grid).
        # Structure mirrors the unstructured route: pair-space staged
        # FCG around the dd kernel, f32-kernel V-cycle preconditioner,
        # certified/corrected against the exact XLA f64 apply.
        from ..ops.curvilinear import (
            build_curv_pair_operator,
            transpose_curv_multigrid,
        )

        loads = scene.loads.astype(jnp.float64)
        prescribed = scene.prescribed_or_zero(jnp.float64)
        b = op.rhs(loads, prescribed)
        x0 = (1.0 - op.free) * prescribed
        pair_op = build_curv_pair_operator(op)
        mg_t = transpose_curv_multigrid(mg)
        # Certification tier note (measured at 812k): the loop certifies
        # against the on-device (emulated-)f64 apply; its ~2^-48 noise
        # floors the HOST-IEEE-visible residual at ~1.5e-8 at this
        # kappa regardless of how far the device recurrence is pushed
        # (device 6.1e-9 -> host 1.56e-8; device 3.1e-9 -> host 1.47e-8)
        # — the same device-certification tier the voxel flagship uses
        # below the ~8M-DOF host-tier crossover (docs/PERF.md).
        from ..solvers.cg import fpcg_dd64_staged

        # pass 1: pair-space FCG to the var-dd kernel's true-accuracy
        # floor (measured 4.0e-5 true against a 1.3e-9 recurrence claim
        # at 182k — recurrence progress past the floor is fictitious)
        u, stats = fpcg_dd64_staged(
            pair_op, b, x0, precond=mg_t, tol=max(0.3 * tol, 3e-5),
            max_iters=max_iters, pair_apply=True,
        )
        # certification authority (round-4): HOST exact-IEEE residuals
        # through the native variable-weight C++ kernel, corrections
        # through the fast device pipeline.  The device's emulated-f64
        # certify was both slower (0.45-2.3 s/pass at 812k) and floored
        # at ~2e-8 by its own 2^-48 noise at this conditioning; the
        # host apply is exact and its final pass doubles as the
        # reaction field.  (host_certify=False: skip — raw pass-1
        # result, recurrence-quality stats, reactions via the device
        # apply.)
        if host_certify is None or host_certify:
            u, stats, reactions = _host_certify_curvilinear(
                op, pair_op, mg_t, b, u, stats, tol=tol,
                max_iters=max_iters, max_host_passes=3,
            )
            if reactions is None:
                reactions = op.apply_raw(u)
        else:
            reactions = op.apply_raw(u)
            # ADVICE r4: pass 1 ran at the loosened dd-floor tolerance
            # max(0.3*tol, 3e-5); its `converged` flag refers to THAT
            # floor.  Re-judge against the caller's tol so a tol=1e-8
            # request can never be reported converged off a ~3e-5-quality
            # recurrence — and note the stats are recurrence-quality.
            from ..solvers.cg import SolveStats as _SS

            rel = float(stats.relative_residual)
            stats = _SS(
                iterations=stats.iterations,
                residual_norm=stats.residual_norm,
                relative_residual=stats.relative_residual,
                converged=jnp.asarray(rel <= tol, bool),
            )
            if rel > tol:
                import warnings

                warnings.warn(
                    f"solve_curvilinear(host_certify=False): recurrence "
                    f"residual {rel:.3e} does not meet tol {tol:g}; the "
                    "dd-kernel recurrence floors near 3e-5 — rerun with "
                    "host_certify=True for an exact-IEEE certificate",
                    RuntimeWarning, stacklevel=2,
                )
        return Solution(displacements=u, reactions=reactions, stats=stats)
    return solve_operator_fpcg(
        op,
        scene.loads.astype(jnp.float64),
        scene.prescribed_or_zero(jnp.float64),
        mg,
        tol=tol,
        max_iters=max_iters,
    )


