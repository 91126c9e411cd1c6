"""Top-level solve API — the framework's equivalent of the reference's
``solve(nodes, elements, constraints, forces)`` (``/root/reference/
fea.py:86-115``, the core public API per SURVEY.md §2 S1).

    solution = fea_tpu.solve(scene)
    solution.displacements   # (N, dpn), prescribed values on fixed DOFs
    solution.reactions       # (N, dpn) = K @ u over ALL DOFs (parity with
                             #   fea.py:113 — applied loads at free DOFs,
                             #   support reactions at fixed ones)
    solution.stats           # iterations / residual / convergence record

Split into a host-side builder (index plans, congruence detection — once
per topology) and a jit-pure core ``solve_operator`` so that parameter
sweeps are one ``jax.vmap`` away (see sweep helpers below).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..dtypes import Policy, default_policy
from ..operator import StiffnessOperator, build_operator
from ..scene import Scene
from ..solvers.cg import SolveStats, pcg
from ..solvers.dense import dense_solve

# Re-exported package surface: the pre-split monolithic fea_tpu/solve.py
# module's entire namespace lives on the package so every existing
# `from fea_tpu.solve import X` / `fea_tpu.solve.X` keeps working
# (including test monkeypatch targets).
from ._types import Solution  # noqa: F401
from .cache import _BUILD_CACHE, _BUILD_CACHE_MAX, _cached_build  # noqa: F401
from .certify import (  # noqa: F401
    _DD_RECURRENCE_FLOOR,
    _host_residual_delta_streamed,
    _host_true_residual,
    _host_true_residual_streamed,
    _refine_true,
    _t_certify_pair,
    _t_true_residual,
    _warn_dd_tol_floor,
)
from .curv import (  # noqa: F401
    _curv_host_pack,
    _host_certify_curvilinear,
    build_curvilinear,
    solve_curvilinear,
)
from .extruded import (  # noqa: F401
    _solve_extruded_dd_jit,
    _solve_extruded_jit,
    build_extruded,
    extruded_mg_coarsenable,
    solve_extruded,
)
from .fpcg import (  # noqa: F401
    solve_operator_fpcg,
    solve_operator_refined,
    solve_operator_refined_host,
)
from .many import (  # noqa: F401
    _solve_many_jit,
    _solve_many_staged,
    _st_setup_homog_many,
    _t_certify_pair_many,
    solve_many,
)
from .staged import (  # noqa: F401
    _fpcg_t_f64_jit,
    _solve_fpcg_t_staged_once,
    _st_apply_dot,
    _st_apply_dot_chunked,
    _st_apply_dot_xla,
    _st_k_steps,
    _st_k_steps_core,
    _st_k_steps_many,
    _st_mask_pair,
    _st_pair_norm2,
    _st_precond_p,
    _st_rhs_inhomog,
    _st_setup_homog,
    _st_split_fixed,
    _st_update_xr,
    _staged_k,
    solve_operator_fpcg_t,
    solve_operator_fpcg_t_staged,
)
from .unstructured import (  # noqa: F401
    _UNSTRUCT_RES_PROGRAMS,
    _solve_unstructured_amg,
    _solve_unstructured_ddq,
    _unstruct_residual_prog,
    build_amg_setup,
)

__all__ = [
    "Solution",
    "solve",
    "solve_operator",
    "solve_displacements",
    "solve_operator_fpcg",
    "solve_operator_fpcg_t",
    "solve_operator_fpcg_t_staged",
    "solve_extruded",
    "build_curvilinear",
    "solve_curvilinear",
    "solve_many",
]


# solve()'s unstructured-CG fallthrough switches from scalar to nodal 3x3
# block-Jacobi at this size (tests monkeypatch it to exercise the route)
_BLOCK_PRECOND_MIN_DOF = 50_000

# auto-routing considers the structured/extruded/curvilinear/canonical
# large-mesh families from this size (tests monkeypatch it)
_STRUCTURED_MIN_DOF = 50_000


@partial(jax.jit, static_argnames=("method", "tol", "max_iters", "precondition"))
def solve_operator(
    op: StiffnessOperator,
    loads: jax.Array,
    prescribed: jax.Array,
    *,
    method: str = "cg",
    tol: float = 1e-8,
    max_iters: int = 20_000,
    precondition: bool = True,
    precond=None,
) -> Solution:
    """Jit-pure solve given a prebuilt operator.  vmap-able over loads,
    prescribed values, and material-dependent operator leaves.

    ``precondition``: True (scalar Jacobi), False, or "block" (nodal 3x3
    block-Jacobi — captures the x/y/z Poisson coupling scalar Jacobi
    drops, SURVEY.md §7 "Jacobi adequacy").  ``precond``: an SPD callable
    pytree (e.g. :class:`fea_tpu.ops.twolevel.TwoLevelPrecond`) — when
    given it wins over ``precondition``."""
    # Compute dtype follows the operator (set at build_operator time);
    # accumulation upgrades to f64 whenever x64 is enabled.
    base = default_policy()
    compute = jnp.dtype(op.free.dtype)
    policy = Policy(compute=compute, accum=base.accum if jnp.finfo(base.accum).bits >= jnp.finfo(compute).bits else compute)
    loads = loads.astype(policy.compute)
    prescribed = prescribed.astype(policy.compute)
    b = op.rhs(loads, prescribed)

    if method == "cg":
        x0 = (1.0 - op.free) * prescribed  # fixed rows exact from step 0
        if precond is None and precondition == "block":
            Binv = op.block_diag_inv_masked()
            precond = lambda r: jnp.einsum(  # noqa: E731
                "nij,nj->ni", Binv, r, precision=jax.lax.Precision.HIGHEST
            )
        if precond is not None:
            u, stats = pcg(
                op.apply, b, x0, precond=precond, tol=tol, max_iters=max_iters,
                policy=policy,
            )
        else:
            diag = op.diag_masked() if precondition else None
            u, stats = pcg(
                op.apply, b, x0, precond_diag=diag, tol=tol, max_iters=max_iters,
                policy=policy,
            )
    elif method == "dense":
        K = op.dense()
        x_flat, stats = dense_solve(K, b.reshape(-1), op.free.reshape(-1), policy)
        u = x_flat.reshape(loads.shape)
    else:
        raise ValueError(f"unknown method {method!r} (expected 'cg' or 'dense')")

    reactions = op.apply_raw(u)
    return Solution(displacements=u, reactions=reactions, stats=stats)


def solve(
    scene: Scene,
    *,
    config: Optional["SolverConfig"] = None,
    method: Optional[str] = None,
    tol: Optional[float] = None,
    max_iters: Optional[int] = None,
    dtype=None,
    check_jacobians: bool = True,
    operator: Optional[StiffnessOperator] = None,
    on_nonconverged: Optional[str] = None,
    debug_nans: Optional[bool] = None,
) -> Solution:
    """Solve a linear static scene end-to-end.

    method 'auto' picks dense for small systems (< 2000 DOF, where the
    O(n^3) factorization beats CG's latency) and matrix-free PCG above;
    large regular voxel-box hex8 scenes (>= 50k DOF, detected from the
    node grid + connectivity, x64 on) automatically take the flagship
    structured-stencil multigrid fpcg path (~12 iterations regardless of
    mesh size); extruded layer-major meshes (the tube family) the
    z-semicoarsened multigrid; and any other large mesh flexible CG with
    an f64-true pair-space recurrence and the Chebyshev-smoothed
    multiplicative two-level preconditioner (rigid-body-mode coarse
    space, all smoothing in f32 — ops/twolevel.py).
    ``check_jacobians`` hosts-asserts min detJ > 0 for hex8 scenes — the
    jit-safe version of the reference's ValueError (utils.py:212-215).
    ``on_nonconverged`` is 'warn' (default), 'raise', or 'ignore': a solve
    that exits without reaching ``tol`` must never be silent — callers who
    want the raw Solution regardless pass 'ignore' (or use the jit-pure
    ``solve_operator`` directly, which cannot sync device scalars).

    Defaults come from ``config`` (a :class:`fea_tpu.SolverConfig`,
    itself defaulting to ``DEFAULT_CONFIG``); explicit keywords win.
    """
    from ..config import DEFAULT_CONFIG

    cfg = config if config is not None else DEFAULT_CONFIG
    if debug_nans is None:
        debug_nans = cfg.debug_nans
    if debug_nans:
        # Sanitizer mode (SURVEY.md §5.2): the first NaN-producing
        # primitive raises FloatingPointError at its source instead of
        # the NaN surfacing iterations later as a blow-up bail-out.
        with jax.debug_nans(True):
            return solve(
                scene, config=config, method=method, tol=tol,
                max_iters=max_iters, dtype=dtype,
                check_jacobians=check_jacobians, operator=operator,
                on_nonconverged=on_nonconverged, debug_nans=False,
            )
    method = cfg.method if method is None else method
    tol = cfg.tol if tol is None else tol
    max_iters = cfg.max_iters if max_iters is None else max_iters
    on_nonconverged = cfg.on_nonconverged if on_nonconverged is None else on_nonconverged
    if on_nonconverged not in ("warn", "raise", "ignore"):
        raise ValueError("on_nonconverged must be 'warn', 'raise', or 'ignore'")
    # default: inherit the scene's floating dtype (f64 scenes stay f64 on
    # CPU; TPU scenes are built f32 and accumulate per policy)
    dtype = dtype or scene.nodes.dtype

    def check(sol: Solution, method_name: str) -> Solution:
        if on_nonconverged != "ignore" and not bool(sol.stats.converged):
            import warnings

            msg = (
                f"solve did not converge: {int(sol.stats.iterations)} iterations, "
                f"relative residual {float(sol.stats.relative_residual):.3e} "
                f"(target {tol:g}, method {method_name!r}, {scene.n_dof} DOF)"
            )
            if on_nonconverged == "raise":
                raise RuntimeError(msg)
            warnings.warn(msg, RuntimeWarning, stacklevel=3)
        return sol

    auto_requested = method == "auto"
    if method == "auto":
        # Large voxel-box hex8 scenes (detected, not declared) take the
        # flagship path automatically: structured stencil operator + f64
        # flexible-PCG with the f32 multigrid V-cycle preconditioner.
        # Requires x64 for the f64 outer recurrence.
        from ..dtypes import x64_enabled

        if operator is None and (
            scene.n_dof >= _STRUCTURED_MIN_DOF or cfg.sharded
        ):
            from ..ops.structured import build_structured_operator, infer_box_dims

            dims = infer_box_dims(scene)
            ext = None
            if dims is None:
                from ..ops.extruded import infer_extruded

                ext = infer_extruded(scene)
                if ext is not None and not extruded_mg_coarsenable(ext[2] - 1):
                    ext = None  # layer count can't reach the coarse solve
            if ext is not None:
                if not x64_enabled():
                    raise RuntimeError(
                        f"solve(): a {scene.n_dof}-DOF extruded scene needs "
                        "the f64-recurrence multigrid path, which requires "
                        "x64 (jax.config.update('jax_enable_x64', True) "
                        "before first jax use).  The all-f32 fallback "
                        "reports fake convergence at this scale, so it is "
                        "not taken automatically."
                    )
                sol = solve_extruded(
                    scene, ext, tol=tol,
                    max_iters=max_iters if max_iters is not None else 300,
                )
                return check(sol, "fpcg-extruded-multigrid")
            if dims is None and ext is None:
                # neither a voxel box nor extruded: if the CONNECTIVITY
                # is still the box grid (mapped/distorted geometry — the
                # common way reference-style meshes are "unstructured"),
                # the variable-coefficient block stencil serves it with
                # no gather/scatter at all and ~flagship-class speed
                # (ops/curvilinear.py; measured ~30x the index-based
                # apply).  Requires x64 for the same honesty reason as
                # the other large-mesh routes.
                from ..ops.curvilinear import curv_coarsenable, infer_topo_dims

                tdims = infer_topo_dims(scene)
                if tdims is not None and curv_coarsenable(tdims):
                    if not x64_enabled():
                        raise RuntimeError(
                            f"solve(): a {scene.n_dof}-DOF topologically-"
                            "structured scene needs the f64-recurrence "
                            "multigrid path, which requires x64 "
                            "(jax.config.update('jax_enable_x64', True) "
                            "before first jax use).  The all-f32 fallback "
                            "reports fake convergence at this scale, so "
                            "it is not taken automatically."
                        )
                    sol = solve_curvilinear(
                        scene, tdims, tol=tol,
                        max_iters=max_iters if max_iters is not None else 300,
                        check_jacobians=check_jacobians,
                    )
                    return check(sol, "fpcg-curvilinear-multigrid")
                if tdims is None:
                    # connectivity is not the canonical grid as-given —
                    # but it may be a grid under node RENUMBERING
                    # (partitioners, optimizers, file round-trips): the
                    # canonicalization pass recovers the permutation by
                    # pure index arithmetic and verifies it exactly
                    # (round-4, VERDICT r3 #5), so the scene solves
                    # through the kernel-class curvilinear pipeline with
                    # O(N) permute bookkeeping instead of the ~30x-
                    # slower arbitrary-topology route
                    from ..ops.canonical import (
                        canonicalize_scene,
                        infer_renumbered_grid,
                    )

                    det = infer_renumbered_grid(scene)
                    if det is not None and curv_coarsenable(det[0]) and x64_enabled():
                        import numpy as np

                        cdims, perm = det
                        # the canonicalized Scene is cached on the
                        # ORIGINAL scene's identity so repeat solves
                        # reuse the same nodes/elements/fixed arrays —
                        # and therefore hit the downstream curvilinear
                        # build cache too.  The cache key does NOT cover
                        # loads/prescribed (ADVICE r4 high): the cached
                        # Scene is only a topology/geometry carrier, and
                        # the CURRENT call's loads/prescribed are
                        # permuted in fresh on every call, so "one mesh,
                        # many loads" can never replay a stale load case.
                        sc_base = _cached_build(
                            "canonical-scene", scene,
                            lambda: canonicalize_scene(scene, cdims, perm),
                        )
                        inv = np.empty_like(perm)
                        inv[perm] = np.arange(perm.size)
                        loads_c = jnp.asarray(
                            np.asarray(scene.loads)[inv], sc_base.loads.dtype
                        )
                        presc_c = (
                            None if scene.prescribed is None
                            else jnp.asarray(
                                np.asarray(scene.prescribed)[inv],
                                sc_base.loads.dtype,
                            )
                        )
                        sc = dataclasses.replace(
                            sc_base, loads=loads_c, prescribed=presc_c
                        )
                        sol_c = solve(
                            sc, config=config, method="auto", tol=tol,
                            max_iters=max_iters, dtype=dtype,
                            check_jacobians=check_jacobians,
                            on_nonconverged="ignore",
                        )
                        reactions = sol_c.reactions
                        if isinstance(reactions, np.ndarray):
                            reactions = reactions[perm]
                        elif reactions is not None:
                            reactions = reactions[jnp.asarray(perm)]
                        sol = Solution(
                            displacements=sol_c.displacements[jnp.asarray(perm)],
                            reactions=reactions,
                            stats=sol_c.stats,
                        )
                        return check(sol, "fpcg-canonicalized-grid")
            if dims is not None and not x64_enabled():
                # Round-2 guard (VERDICT.md weak #6): without x64 this
                # scene would silently drop to the all-f32 Jacobi-PCG
                # path, which provably reports fake convergence at this
                # scale (tests/test_refine.py::
                # test_f32_only_cg_is_insufficient_here).  Fail loudly.
                raise RuntimeError(
                    f"solve(): a {scene.n_dof}-DOF structured voxel scene "
                    "needs the f64-recurrence multigrid path, which "
                    "requires x64 (jax.config.update('jax_enable_x64', "
                    "True) before first jax use).  The all-f32 fallback "
                    "reports fake convergence at this scale, so it is "
                    "not taken automatically; pass method='cg' (and "
                    "validate residuals yourself) to force it."
                )
            if dims is not None:
                import numpy as np

                from ..ops.multigrid import build_multigrid

                op_hi = build_structured_operator(scene, dims, dtype=jnp.float64)
                free_np = 1.0 - np.asarray(scene.fixed, np.float64)
                # Multi-device: route to the z-sharded flagship solver
                # (VERDICT.md r2 #4) — the production Pallas pipeline
                # with explicit halo exchange, sharded certification,
                # and no full-mesh array on any single device.  Auto on
                # a >1-device TPU backend; cfg.sharded=True forces it
                # elsewhere (tests/dryrun: 8 virtual CPU devices,
                # kernels in interpreter mode).
                n_dev = len(jax.devices())
                want_shard = (
                    cfg.sharded if cfg.sharded is not None
                    else jax.default_backend() == "tpu" and n_dev > 1
                )
                if want_shard and n_dev > 1 and dims[2] + 1 >= 16:
                    from jax.sharding import Mesh

                    from ..ops.transposed import build_multigrid_t
                    from ..parallel.halo import build_zsharded_solver

                    interp = jax.default_backend() != "tpu"
                    mg_t = build_multigrid_t(
                        op_hi.astype(jnp.float32), dtype=jnp.float32,
                        use_pallas=not interp, free_np=free_np,
                        pallas_min_dof=50_000, interpret=interp,
                        # small forced-sharded scenes (dryrun/tests) still
                        # need a >= 2-level hierarchy to shard
                        coarse_dof_limit=min(3000, max(300, scene.n_dof // 8)),
                    )
                    if len(mg_t.levels) >= 2:
                        mesh = Mesh(np.array(jax.devices()), ("z",))
                        solver = build_zsharded_solver(
                            op_hi, mg_t, mesh, interpret=interp
                        )
                        sol = solver.solve(
                            scene.loads.astype(jnp.float64),
                            None if scene.prescribed is None
                            else scene.prescribed.astype(jnp.float64),
                            tol=tol,
                            max_iters=max_iters if max_iters is not None else 300,
                        )
                        return check(sol, "fpcg-multigrid-zsharded")
                # Pallas-pipeline gate (ADVICE r1): the fused stencil
                # kernels put Z on the 128-wide lane axis; degenerate
                # extents (a >=50k-DOF flat slab can have Z=2) are
                # untested on-chip and risk pathological Mosaic tilings,
                # so thin-Z scenes take the shape-agnostic XLA fpcg path.
                if jax.default_backend() == "tpu" and dims[2] + 1 >= 16:
                    # transposed-layout pipeline: fused Pallas stencil in
                    # the V-cycle + double-f32 f64-accurate apply.  The
                    # STAGED driver (host outer loop over compact
                    # programs) is the default: same algorithm and
                    # convergence as the fused one-jit program, minutes
                    # instead of tens of minutes of cold-cache compile
                    # (fused available via bench.py --solver fused).
                    from ..ops.transposed import build_multigrid_t

                    mg_t = build_multigrid_t(
                        op_hi.astype(jnp.float32), dtype=jnp.float32,
                        use_pallas=True, free_np=free_np,
                        # sub-50k-DOF levels: XLA pad-add is just as
                        # fast and the executable stays ~40 s cheaper
                        # to cold-compile (docs/PERF.md)
                        pallas_min_dof=50_000,
                    )
                    presc = (
                        None if scene.prescribed is None
                        else scene.prescribed.astype(jnp.float64)
                    )
                    sol = solve_operator_fpcg_t_staged(
                        op_hi,
                        scene.loads.astype(jnp.float64),
                        presc,
                        mg_t,
                        tol=tol,
                        max_iters=max_iters if max_iters is not None else 300,
                    )
                    return check(sol, "fpcg-multigrid-transposed-staged")
                mg = build_multigrid(
                    op_hi.astype(jnp.float32), dtype=jnp.float32, free_np=free_np
                )
                sol = solve_operator_fpcg(
                    op_hi,
                    scene.loads.astype(jnp.float64),
                    scene.prescribed_or_zero(jnp.float64),
                    mg,
                    tol=tol,
                    max_iters=max_iters if max_iters is not None else 300,
                )
                return check(sol, "fpcg-multigrid")
        method = "dense" if scene.n_dof < 2000 else "cg"
    if max_iters is None:
        max_iters = max(1000, 10 * scene.n_dof) if method == "cg" else 1
        max_iters = min(max_iters, 100_000)

    # AUTO-routed large hex8 scenes whose connectivity is a box-grid
    # SUBSET (L-domains, steps, holes — no full-grid detector matched,
    # but the cells embed in a bounding box): solve through the
    # curvilinear stencil pipeline on the box with zero weights in the
    # void (solve/embed.py) — slice-shift data movement instead of the
    # gather-rate-walled BCSR apply.  Detection is exact index
    # arithmetic; FEA_TPU_NO_EMBED=1 opts out (honest-gather benches).
    if (
        auto_requested
        and method == "cg"
        and operator is None
        and scene.n_dof >= _BLOCK_PRECOND_MIN_DOF
        and scene.family == "hex8"
        and scene.elements.shape[1] == 8
    ):
        import os as _os

        from ..dtypes import x64_enabled

        if x64_enabled() and not _os.environ.get("FEA_TPU_NO_EMBED"):
            from ..ops.canonical import infer_subgrid_embedding
            from ..ops.curvilinear import curv_coarsenable
            from .embed import build_subgrid_embedded, solve_subgrid_embedded

            # a FULL grid (valid.all()) never embeds here: the upstream
            # structured/curvilinear/canonical detectors already saw it
            # and fell through on their own size/shape gates — embedding
            # it would silently override those decisions
            built = _cached_build(
                ("subgrid-embed", bool(check_jacobians)), scene,
                lambda: (lambda det: (
                    None
                    if det is None or bool(det[2].all())
                    or not curv_coarsenable(det[0])
                    else build_subgrid_embedded(
                        scene, det, check_jacobians=check_jacobians
                    )
                ))(infer_subgrid_embedding(scene)),
            )
            if built is not None:
                sol = solve_subgrid_embedded(
                    scene, built, tol=tol,
                    max_iters=max_iters if max_iters else 300,
                )
                return check(sol, "fpcg-subgrid-embedded")

    # AUTO-routed large ARBITRARY-topology hex8 scenes (no structure
    # detector matched above): the AMG/BCSR route (round-5, VERDICT r4
    # #3) — assembled node-major block-CSR apply (gather + einsum, no
    # scatter) + multilevel smoothed-aggregation V-cycle + host
    # exact-IEEE certification.  Falls back to the ddq/two-level route
    # below on any build failure.  FEA_TPU_NO_AMG=1 opts out (route
    # comparison benches).
    if (
        auto_requested
        and method == "cg"
        and operator is None
        and scene.n_dof >= _BLOCK_PRECOND_MIN_DOF
        and scene.family == "hex8"
        and scene.elements.shape[1] == 8
    ):
        import os as _os

        from ..dtypes import x64_enabled

        if not x64_enabled():
            # same guard as every other large-mesh route (VERDICT r2 #6)
            raise RuntimeError(
                f"solve(): a {scene.n_dof}-DOF unstructured scene needs an "
                "f64 recurrence, which requires x64 "
                "(jax.config.update('jax_enable_x64', True) before first "
                "jax use).  The all-f32 fallback can report fake "
                "convergence at this scale; pass method='cg' explicitly "
                "(and validate residuals yourself) to force it."
            )
        if not _os.environ.get("FEA_TPU_NO_AMG"):
            try:
                amg_setup = _cached_build(
                    ("amg", bool(check_jacobians)), scene,
                    lambda: build_amg_setup(
                        scene, check_jacobians=check_jacobians
                    ),
                )
            except Exception as exc:
                import warnings

                warnings.warn(
                    f"AMG setup failed ({exc}); falling back to the "
                    "two-level route",
                    RuntimeWarning, stacklevel=2,
                )
            else:
                sol = _solve_unstructured_amg(
                    scene, amg_setup, tol=tol, max_iters=max_iters,
                )
                return check(sol, "fpcg-amg-bcsr")

    op = operator if operator is not None else build_operator(scene, dtype=dtype)
    if check_jacobians and op.geom is not None:
        min_detj = float(op.geom.min_detj)
        if min_detj <= 0.0:
            raise ValueError(
                f"Non-positive Jacobian determinant (min detJ = {min_detj:g}); "
                "check element shapes / node ordering."
            )

    # AUTO-routed large unstructured hex8 CG solves get the two-level
    # preconditioner (rigid-body-mode coarse space + nodal 3x3
    # block-Jacobi, measured 3.6-12x fewer iterations than block-Jacobi
    # alone — ops/twolevel.py); its O(E) build amortizes over the
    # hundreds of applies such solves cost.  The solve runs in f64
    # regardless of scene dtype (the f64 recurrence is what makes the
    # reported residual trustworthy at this scale — an f32 scene would
    # otherwise sit on a ~1e-7 roundoff floor).  Any build failure falls
    # back to block-Jacobi.  An EXPLICIT method='cg' skips all of this —
    # it is the documented escape hatch for plain (f32-tolerant) CG.
    if (
        auto_requested
        and method == "cg"
        and scene.n_dof >= _BLOCK_PRECOND_MIN_DOF
        and op.dofs_per_node == 3
        and op.elements.shape[1] == 8
    ):
        from ..dtypes import x64_enabled

        if not x64_enabled():
            # same guard as the structured/extruded paths (VERDICT.md
            # round-2 #6): an all-f32 recurrence at this scale can report
            # fake convergence; fail loudly instead of silently degrading
            raise RuntimeError(
                f"solve(): a {scene.n_dof}-DOF unstructured scene needs an "
                "f64 recurrence, which requires x64 "
                "(jax.config.update('jax_enable_x64', True) before first "
                "jax use).  The all-f32 fallback can report fake "
                "convergence at this scale; pass method='cg' explicitly "
                "(and validate residuals yourself) to force it."
            )
        op64 = op if op.free.dtype == jnp.float64 else op.astype(jnp.float64)
        loads64 = scene.loads.astype(jnp.float64)
        presc64 = scene.prescribed_or_zero(jnp.float64)
        try:
            from ..ops.twolevel import build_two_level_cheb

            # one-time per operator (~30-130 s at scale): cached on the
            # scene's array identity like the other families (r4 #6)
            tl = _cached_build(
                "twolevel", scene,
                lambda: build_two_level_cheb(op64, scene.nodes),
            )
        except Exception as exc:  # geometry/aggregation corner cases
            import warnings

            warnings.warn(
                f"two-level preconditioner build failed ({exc}); "
                "falling back to block-Jacobi",
                RuntimeWarning, stacklevel=2,
            )
            sol = solve_operator(
                op64, loads64, presc64,
                method="cg", tol=tol, max_iters=max_iters, precondition="block",
            )
            return check(sol, "cg-block")
        # flexible CG: f64-true recurrence (honest residual) + all
        # smoothing / coarse work inside the preconditioner at f32 — the
        # flagship fpcg+multigrid architecture applied to general meshes
        # (the f64 gather/scatter apply costs 14.5x the f32 one on-chip,
        # so the smoother's 2*degree+1 applies must NOT run at f64).
        # The in-loop fine apply runs in double-f32 PAIR space
        # (ops/ddq.py — the same ~2^-48 accuracy class as TPU-emulated
        # f64 without the emulation's materialized intermediates), the
        # FCG loop is host-staged (fpcg_dd64_staged: a single while_loop
        # dispatch running minutes of device time killed the TPU worker
        # at 795k DOF; operator/preconditioner ride as pytree ARGUMENTS
        # so the geometry is never baked into the HLO), and the result
        # is certified — and if needed corrected — against the canonical
        # exact-f64 apply before stats are reported.
        b64 = op64.rhs(loads64, presc64)
        x0 = (1.0 - op64.free) * presc64
        from ..ops.ddq import build_pair_operator

        pair_op = _cached_build(
            "ddq-pair", scene,
            lambda: build_pair_operator(
                op64, scene.nodes, material=scene.material
            ),
        )
        u, stats = _solve_unstructured_ddq(
            op64, tl, b64, x0, tol=tol, max_iters=max_iters,
            nodes=scene.nodes, material=scene.material, pair_op=pair_op,
        )
        sol = Solution(
            displacements=u, reactions=op64.apply_raw(u), stats=stats
        )
        return check(sol, "fpcg-two-level-cheb")
    sol = solve_operator(
        op,
        scene.loads.astype(dtype),
        scene.prescribed_or_zero(dtype),
        method=method,
        tol=tol,
        max_iters=max_iters,
    )
    return check(sol, method)


def solve_displacements(op: StiffnessOperator, loads, prescribed, *, tol=1e-8, max_iters=20_000):
    """Displacements-only CG path — the vmap/sweep-friendly kernel."""
    sol = solve_operator(op, loads, prescribed, method="cg", tol=tol, max_iters=max_iters)
    return sol.displacements


def solve_nonlinear(
    scene: Scene,
    *,
    tol: float = 1e-10,
    max_newton_iters: int = 50,
):
    """Geometrically nonlinear equilibrium for bar (truss) scenes.

    The convergent, jit-compiled replacement for the reference's
    relaxation loop (``/root/reference/truss.py:95-119``): find u with
    loads + f_int(u) = 0 at free DOFs (the reference's own residual,
    truss.py:101) via Newton-Krylov, where the internal force uses the
    displaced geometry exactly as the reference does (truss.py:83-92).

    Returns (u, NewtonStats).
    """
    from ..elements import truss as truss_el
    from ..solvers.newton import newton_krylov

    if scene.family not in ("bar2d", "bar3d"):
        raise ValueError("solve_nonlinear currently supports bar scenes")
    if scene.section is None:
        raise ValueError("bar scenes require section = axial stiffness per element")

    base = default_policy()
    dtype = jnp.dtype(scene.nodes.dtype)
    policy = Policy(
        compute=dtype,
        accum=base.accum if jnp.finfo(base.accum).bits >= jnp.finfo(dtype).bits else dtype,
    )
    nodes = scene.nodes.astype(dtype)
    loads = scene.loads.astype(dtype)
    F = scene.free_mask(dtype)
    xp = scene.prescribed_or_zero(dtype)

    def residual(u):
        u_c = F * u + (1.0 - F) * xp
        f_int = truss_el.internal_forces(nodes, scene.elements, u_c, scene.section)
        return F * -(loads + f_int) + (1.0 - F) * (u - xp)

    u0 = (1.0 - F) * xp
    return newton_krylov(residual, u0, tol=tol, max_newton_iters=max_newton_iters, policy=policy)
