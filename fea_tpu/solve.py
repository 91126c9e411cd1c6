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

from .dtypes import Policy, default_policy
from .operator import StiffnessOperator, build_operator
from .scene import Scene
from .solvers.cg import SolveStats, pcg
from .solvers.dense import dense_solve

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


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Solution:
    """Solve result.

    ``reactions`` contract (ADVICE r4): K @ u over ALL DOFs (parity with
    the reference's ``fea.py:113``), as an ARRAY-LIKE — a jax Array on
    device-certified routes, a host ``np.ndarray`` when a host-IEEE
    certification tier produced it (the exact-f64 raw apply doubles as
    the reaction field there, and pushing ~20 MB/812k DOF back through
    the device link would cost more than every consumer, which reads
    reactions host-side anyway).  Consumers that need a device array
    should ``jnp.asarray(solution.reactions)``; NumPy consumers work
    with both unchanged.
    """

    displacements: jax.Array  # (N, dpn)
    reactions: jax.Array  # (N, dpn)
    stats: SolveStats


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
    from .config import DEFAULT_CONFIG

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
        from .dtypes import x64_enabled

        if operator is None and (
            scene.n_dof >= _STRUCTURED_MIN_DOF or cfg.sharded
        ):
            from .ops.structured import build_structured_operator, infer_box_dims

            dims = infer_box_dims(scene)
            ext = None
            if dims is None:
                from .ops.extruded import infer_extruded

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
                from .ops.curvilinear import curv_coarsenable, infer_topo_dims

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
                    from .ops.canonical import (
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

                from .ops.multigrid import build_multigrid

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

                    from .ops.transposed import build_multigrid_t
                    from .parallel.halo import build_zsharded_solver

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
                    from .ops.transposed import build_multigrid_t

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
        from .dtypes import x64_enabled

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
            from .ops.twolevel import build_two_level_cheb

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
        from .ops.ddq import build_pair_operator

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


# bounded FIFO, same rationale as solvers.cg._DD64_PROGRAMS: treedefs
# embed per-mesh statics, so cache one executable per live mesh shape
_UNSTRUCT_RES_PROGRAMS: dict = {}
_UNSTRUCT_RES_PROGRAMS_MAX = 8


def _unstruct_residual_prog(treedef):
    """Jitted exact-f64 residual of an unstructured iterate, operator as
    flat leaves (the jax-0.9 repeat-call dispatch bug workaround + keeps
    the element geometry out of the HLO — see cg._dd64_programs)."""
    prog = _UNSTRUCT_RES_PROGRAMS.get(treedef)
    if prog is not None:
        return prog

    @jax.jit
    def residual(leaves, b64, u64):
        (op,) = jax.tree_util.tree_unflatten(treedef, leaves)
        # operators may expose a faster certification lowering of the
        # same exact f64 apply (CurvilinearOperator.apply_certify:
        # product-reduce, 5.5x the einsum on-chip)
        apply_fn = getattr(op, "apply_certify", op.apply)
        r = b64 - apply_fn(u64)
        return r, jnp.sum(r * r)

    if len(_UNSTRUCT_RES_PROGRAMS) >= _UNSTRUCT_RES_PROGRAMS_MAX:
        _UNSTRUCT_RES_PROGRAMS.pop(next(iter(_UNSTRUCT_RES_PROGRAMS)))
    _UNSTRUCT_RES_PROGRAMS[treedef] = residual
    return residual


def _solve_unstructured_ddq(
    op64, precond, b64, x0, *, tol, max_iters, max_corrections=3,
    nodes=None, material=None, progress=None, pair_op=None,
    inner_floor=None,
):
    """Unstructured production solve: pair-space fine apply + exact certify.

    The FCG loop runs with the double-f32 pair-space element apply
    (ops/ddq.PairOperator — measured profile motivation in docs/PERF.md
    "Unstructured path": the exact emulated-f64 apply was ~70% of every
    iteration), then the returned iterate's residual is recomputed with
    the canonical exact-f64 apply; if it misses ``tol`` (the pair
    recurrence is self-consistent and cannot see its own apply floor —
    the round-2 true-residual lesson), correction solves run through the
    same fast pipeline at a proportionally tightened tolerance.  Stats
    report the CERTIFIED residual and total iterations.
    """
    import numpy as np

    from .solvers.cg import SolveStats, fpcg_dd64_staged

    if pair_op is None:
        from .ops.ddq import build_pair_operator

        pair_op = build_pair_operator(op64, nodes, material=material)
    pop = pair_op
    # pass 1 runs ~3x tighter than the target UNLESS the pair apply has
    # a known true-accuracy floor (``inner_floor``): recurrence progress
    # past the floor is fictitious — the TRUE residual stalls there (the
    # flagship's round-3 lesson; measured for the curvilinear var-dd
    # kernel: recurrence 1.3e-9 while the exact-apply residual sat at
    # 4.0e-5 at 182k DOF), so those iterations are pure waste and the
    # certification/correction passes below must close the gap anyway.
    # Without a floor (e.g. the ddq gather/scatter PairOperator, apply
    # accuracy ~7e-15) the tight pass usually certifies on the first
    # try: a few extra inner iterations are cheaper than the correction
    # round a marginal miss costs.
    tol1 = 0.3 * tol if inner_floor is None else max(0.3 * tol, inner_floor)
    u, stats = fpcg_dd64_staged(
        pop, b64, x0, precond=precond, tol=tol1, max_iters=max_iters,
        pair_apply=True, progress=progress,
    )
    total_iters = int(stats.iterations)

    leaves, treedef = jax.tree_util.tree_flatten((op64,))
    leaves = tuple(leaves)
    residual = _unstruct_residual_prog(treedef)
    b_norm = float(jnp.sqrt(jnp.sum(b64 * b64)))
    safe_b = b_norm if b_norm > 0 else 1.0
    rel = float("nan")
    rel_before = float("inf")
    for k in range(max_corrections + 1):
        r64, rr = residual(leaves, b64, u)
        rel = float(np.sqrt(float(rr))) / safe_b
        if rel <= tol or k == max_corrections or not np.isfinite(rel):
            break
        if rel > 0.25 * rel_before:
            # stagnating at the DEVICE certification apply's own
            # emulated-f64 noise floor (kappa-dependent; measured
            # ~2e-8 at the 812k distorted scene) — further device
            # corrections chase noise.  Stop; the host-IEEE tier
            # (_host_certify_curvilinear / the flagship host tier) is
            # the escalation that can actually see below this.
            if progress is not None:
                progress(
                    f"certify pass {k}: rel_res {rel:.3e} stagnant at the "
                    "device floor — leaving to the host tier"
                )
            break
        rel_before = rel
        if progress is not None:
            progress(f"certify pass {k}: true rel_res {rel:.3e}, correcting")
        corr_tol = float(np.clip(0.5 * tol / rel, 1e-12, 0.1))
        du, dstats = fpcg_dd64_staged(
            pop, r64, jnp.zeros_like(r64), precond=precond, tol=corr_tol,
            max_iters=max_iters, pair_apply=True, progress=progress,
        )
        u = u + du
        total_iters += int(dstats.iterations)
    stats = SolveStats(
        iterations=jnp.asarray(total_iters, jnp.int32),
        residual_norm=jnp.asarray(rel * safe_b, b64.dtype),
        relative_residual=jnp.asarray(rel, b64.dtype),
        converged=jnp.asarray(bool(rel <= tol), bool),
    )
    return u, stats


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
    from .config import DEFAULT_CONFIG
    from .solvers.refine import pcg_refined

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
    from .config import DEFAULT_CONFIG
    from .solvers.refine import pcg_refined_host

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
    from .solvers.cg import fpcg

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


def solve_operator_fpcg_t(
    op_hi,
    loads: jax.Array,
    prescribed: Optional[jax.Array],
    mg,
    *,
    tol: float = 1e-8,
    max_iters: int = 300,
    use_pallas: Optional[bool] = None,
    pallas_min_dof: int = 0,
    interpret: bool = False,
    refine_true: bool = True,
    max_refine: int = 3,
    progress=None,
) -> Solution:
    """The fpcg solve in the transposed (component-major) layout.

    Same algorithm and convergence behavior as :func:`solve_operator_fpcg`
    (equivalence pinned by test); the entire pipeline — masked operator,
    V-cycle, Krylov vectors — lives in ``(3, Y, X, Z)`` so the fused
    Pallas stencil kernels replace the XLA pad-add (f32 V-cycle applies)
    and the emulated-f64 apply (double-f32 kernel, 4.1 ms vs 17 ms); data
    converts in/out exactly once per solve (docs/PERF.md levers 1-2).

    ``refine_true`` (default): certify/refine the result against the
    exact f64 operator via :func:`_refine_true` — the dd kernel's
    cancellation-amplified apply floor makes the raw recurrence
    OPTIMISTIC near equilibrium (measured 1.1e-5 true vs 8e-10 claimed
    at 140k DOF), so the reported stats are the TRUE residual and extra
    correction passes run as needed.

    ``op_hi`` must be a f64 StructuredOperator; ``mg`` the matching
    ``MultigridPreconditioner`` from ``build_multigrid``.  ``use_pallas``
    defaults to True exactly on the TPU backend (the kernels need real
    Mosaic; CPU uses the XLA transposed twin, which there is native f64).
    """
    from .ops.transposed import MultigridT, transpose_multigrid

    if not refine_true:
        _warn_dd_tol_floor(tol)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if isinstance(mg, MultigridT):
        mg_t = mg  # prebuilt in layout (build_multigrid_t) — no conversion
    else:
        mg_t = transpose_multigrid(
            mg, use_pallas=use_pallas, pallas_min_dof=pallas_min_dof, interpret=interpret
        )
    if use_pallas:
        # Round 4: the fused one-jit while-loop program (_fpcg_t_dd_jit)
        # is RETIRED — its 26 MB executable set the warm-restart floor
        # (~50-90 s of upload through the tunnel at 0.3-0.5 MB/s) and its
        # speed edge over the staged loop was pure dispatch count, which
        # the k-step scan program (_st_k_steps) closes at a fraction of
        # the executable size.  This entry point now IS the staged-k
        # path; kept for API/tooling parity (tools/t_profile.py, tests).
        return solve_operator_fpcg_t_staged(
            op_hi, loads, prescribed, mg_t,
            tol=tol, max_iters=max_iters, use_pallas=use_pallas,
            interpret=interpret, refine_true=refine_true,
            max_refine=max_refine, progress=progress,
        )
    # the XLA f64 twin's recurrence IS the true residual — no refinement
    return _fpcg_t_f64_jit(
        op_hi.ke, op_hi.free, mg_t, loads, prescribed,
        grid_shape=op_hi.grid_shape, tol=tol, max_iters=max_iters,
    )


# The dd pipeline's true-accuracy floor: cancellation-amplified kernel
# apply error, ~1e-5 relative residual at 140k-8.1M DOF (docs/PERF.md
# "True-residual honesty").  Pass 1 of a refined solve stops here.
_DD_RECURRENCE_FLOOR = 1e-5


def _warn_dd_tol_floor(tol: float) -> None:
    """On the double-f32 path WITHOUT true-residual refinement, the
    recurrence is that of the dd-approximated operator, whose apply error
    (~1e-10 relative to input magnitude) is amplified by the cancellation
    in K@u near equilibrium — measured 1.1e-5 true residual against an
    8e-10 recurrence claim at 140k DOF.  ``refine_true=True`` (default)
    closes this; warn when it is off and tol is in the danger zone."""
    if tol < 1e-4:
        import warnings

        warnings.warn(
            f"tol={tol:g} with refine_true=False: the dd-operator "
            "recurrence can be OPTIMISTIC by orders of magnitude vs the "
            "true f64 residual (cancellation-amplified kernel floor; "
            "docs/PERF.md 'True-residual honesty').  Enable refine_true "
            "or validate against an f64 apply.",
            RuntimeWarning,
            stacklevel=3,
        )


@partial(jax.jit, static_argnames=("grid_shape",))
def _t_certify_pair(ke, free, loads, u64_base, du_hiT, du_loT, *, grid_shape):
    """Pair-protocol twin of :func:`_t_true_residual` (round-4 sync cut).

    Takes the staged solver's iterate/correction directly as its
    T-layout double-f32 pair — the eager combine + layout tail that
    previously ran between solve and certification (2-3 dispatches and
    a full-size f64 materialization per pass) moves INSIDE the program.
    Also pre-splits the masked residual into the T-layout pair rhs the
    NEXT correction pass consumes (``rhs_pre``), so correction passes
    skip their setup program entirely.

    Returns ``(u64, rn, Au, b_hiT, b_loT, b2)``: the accumulated f64
    iterate, its true residual norm, the raw apply (= reactions), and
    the pre-split correction rhs with its ||b||^2.
    """
    from .ops import df64
    from .ops.structured import stencil_apply_grid_scan
    from .ops.transposed import grid_of_t, t_of_grid

    Z, Y, X = grid_shape
    dims = (X - 1, Y - 1, Z - 1)
    du64 = grid_of_t(df64.combine((du_hiT, du_loT), jnp.float64)).reshape(-1, 3)
    u64 = u64_base.astype(jnp.float64) + du64
    Au = stencil_apply_grid_scan(
        ke.astype(jnp.float64), u64.reshape(Z, Y, X, 3), dims
    ).reshape(-1, 3)
    F = free.astype(jnp.float64).reshape(-1, 3)
    r = F * (loads.astype(jnp.float64).reshape(-1, 3) - Au)
    rn = jnp.sqrt(jnp.sum(r * r))
    # correction rhs, pre-split then transposed at f32 (half the permute
    # traffic of an f64 transpose; the split is exact)
    b_hi, b_lo = df64.split(r)
    b_hiT = t_of_grid(b_hi.reshape(Z, Y, X, 3))
    b_loT = t_of_grid(b_lo.reshape(Z, Y, X, 3))
    b2 = df64.dot((b_hiT, b_loT), (b_hiT, b_loT))
    return u64, rn, Au, b_hiT, b_loT, b2


@partial(jax.jit, static_argnames=("grid_shape",))
def _t_true_residual(ke, free, loads, u, du=None, *, grid_shape):
    """Exact masked residual of an iterate via the (emulated-)f64 XLA
    flat-layout stencil apply — INDEPENDENT of the dd Pallas kernel, so it
    certifies the double-f32 pipeline's result.  Returns
    (u, r_flat, ||r||, A_raw u); the raw apply doubles as the reaction
    field.  ~56 ms at 1M DOF on-chip — one per refinement pass.

    ``du`` (refinement correction) is accumulated into ``u`` in f64
    INSIDE the program so a correction pass costs one device dispatch
    (accumulate + certify fused), not two tunnel round-trips.  Callers
    that have no correction pass an explicit ZERO du rather than None:
    the du=None variant traced a second 11 MB program whose warm-start
    upload through the axon tunnel cost ~25 s (docs/PERF.md "Compile-
    time behavior"); the f64 add of an exact zero is bit-inert.

    The apply runs in the FLAT (z,y,x) layout: the emulated-f64 XLA
    pad-add costs ~17 ms there vs 55.7 ms in the transposed layout at 1M
    DOF (docs/PERF.md), and ``u`` is already flat so both layout
    transposes disappear — still fully independent of the dd Pallas
    kernel under certification."""
    from .ops.structured import stencil_apply_grid_scan

    Z, Y, X = grid_shape
    dims = (X - 1, Y - 1, Z - 1)
    u64 = u.astype(jnp.float64)
    if du is not None:
        u64 = u64 + du.astype(jnp.float64)
    # scan form: ~8x smaller executable (~11 MB -> ~1.5 MB) at ~ms extra
    # runtime — warm restarts pay per-byte for program uploads through
    # the tunnel (docs/PERF.md), and this program is upload-bound there
    Au = stencil_apply_grid_scan(
        ke.astype(jnp.float64), u64.reshape(Z, Y, X, 3), dims
    ).reshape(-1, 3)
    F = free.astype(jnp.float64).reshape(-1, 3)
    r = F * (loads.astype(jnp.float64).reshape(-1, 3) - Au)
    return u64, r, jnp.sqrt(jnp.sum(r * r)), Au


def _refine_true(solve_once, op_hi, loads, prescribed, *, tol, max_refine,
                 say=lambda s: None, solve_exact=None, inner_floor=None,
                 host_tier=True, pair_protocol=False):
    """Iterative refinement of a double-f32 inner solve to a TRUE
    f64-residual tolerance.

    Why this exists (hard-won, 2026-08-18): the dd Pallas kernel's
    per-apply error is ~1e-10 relative to its INPUT magnitude, but at
    the solution K@u cancels to ~b, so relative to the OUTPUT the error
    is amplified by ||K||*||u||/||b|| — measured 1.1e-5 true residual on
    a 140k-DOF cantilever whose recurrence claimed 8e-10 (the recurrence
    is self-consistent with the flawed apply and cannot see it).  The
    pair-represented iterate adds its own kappa*2^-48 representation
    floor.  Classic iterative refinement removes both: each pass solves
    A d = r_true with the fast dd pipeline (floor applies RELATIVE TO
    ITS OWN rhs, so the error contracts by ~1e-5 per pass) and
    accumulates x in true f64; the residual between passes is computed
    with the exact XLA f64 apply.  Reported stats are the TRUE residual.
    A non-converged inner pass disables refinement (it addresses the
    accuracy floor, not non-convergence).

    Refinement's contraction factor is (inner-apply floor) * kappa: at
    8.1M DOF (kappa ~ 1e10) the dd kernel's 5.7e-11 floor gives ~0.7 —
    passes STAGNATE (measured: stuck at 1.7e-8 true).  ``solve_exact``
    (when provided) is an inner solver using the emulated-f64 XLA apply
    (1.0e-14 measured on-chip — contraction ~1e-4 even at that kappa);
    the loop escalates to it as soon as a pass contracts by < 4x, which
    costs nothing at scales where the fast dd corrections suffice.

    ``inner_floor``: the inner solver's true-accuracy floor (relative);
    when given, pass 1 stops its recurrence there instead of at ``tol``
    — recurrence progress past the floor is fictitious (the true
    residual stays at the floor), so those iterations were pure waste.
    The refinement passes close the remaining gap either way.

    ``pair_protocol`` (round-4 sync cut): the solvers accept
    ``want_pair``/``rhs_pre`` (see :func:`_solve_fpcg_t_staged_once`) —
    iterates flow to certification as T-layout double-f32 pairs
    (:func:`_t_certify_pair` combines/accumulates in-program) and each
    certification pre-splits the next correction's rhs, removing the
    per-pass eager combine tail and the correction setup program."""
    import numpy as np

    import inspect

    def _pass_call(solver, l, p, tol_hint):
        # skip reaction recovery when the solver supports it (bare
        # (l, p, tol_hint) callables keep working)
        try:
            params = inspect.signature(solver).parameters
            ok = "want_reactions" in params or any(
                q.kind is inspect.Parameter.VAR_KEYWORD for q in params.values()
            )
        except (TypeError, ValueError):
            ok = False
        kw = {"want_reactions": False} if ok else {}
        return solver(l, p, tol_hint=tol_hint, **kw)

    def _corr_call(solver, l, tol_hint):
        return _pass_call(solver, l, None, tol_hint)

    loads64 = loads.astype(jnp.float64)
    # Pass-1 loosening: the inner solver's TRUE accuracy is capped at its
    # cancellation-amplified apply floor (~1e-5 relative, measured at
    # 140k-8.1M DOF), so recurrence iterations past that floor are wasted
    # — the refinement passes below must close the gap to tol regardless.
    # Stop pass 1 at the floor and let the (now cheaper, hint-honoring)
    # corrections do the rest: ~20 -> ~13 total iterations at 1M DOF.
    tol1 = tol if inner_floor is None or max_refine <= 0 else max(tol, inner_floor)
    # pass 1 also skips reaction recovery: every converged exit below
    # returns reactions = Au from the exact certification apply, so
    # pass-1 reactions are only needed on the rare non-converged early
    # return — recovered there by one exact apply instead of being paid
    # up-front on every solve.
    spec = {}
    if pair_protocol:
        def _spec1(xp):
            # speculative certification: queued back-to-back with the
            # pass's first chunk, before convergence is known
            spec["out"] = _t_certify_pair(
                op_hi.ke, op_hi.free, loads64, jnp.zeros_like(loads64),
                xp[0], xp[1], grid_shape=op_hi.grid_shape,
            )

        sol, pair1, spec_ok = solve_once(
            loads64, prescribed, tol_hint=tol1, want_reactions=False,
            want_pair=True, speculate=_spec1,
        )
    else:
        sol = _pass_call(solve_once, loads64, prescribed, tol1)
        pair1, spec_ok = None, False
    iters = int(sol.stats.iterations)
    rel0 = float(sol.stats.relative_residual)
    rn0 = float(sol.stats.residual_norm)
    b_norm = rn0 / rel0 if (np.isfinite(rel0) and rel0 > 0) else 1.0
    if not bool(sol.stats.converged) or not np.isfinite(b_norm) or b_norm <= 0:
        if sol.reactions is None:
            _, _, _, Au0 = _t_true_residual(
                op_hi.ke, op_hi.free, loads64, sol.displacements,
                jnp.zeros_like(sol.displacements, dtype=jnp.float64),
                grid_shape=op_hi.grid_shape,
            )
            sol = Solution(
                displacements=sol.displacements, reactions=Au0, stats=sol.stats
            )
        return sol
    r = rhs_pre = None
    if pair1 is not None:
        if spec_ok and "out" in spec:
            u, rn, Au, b_hiT, b_loT, b2c = spec["out"]
        else:
            u, rn, Au, b_hiT, b_loT, b2c = _t_certify_pair(
                op_hi.ke, op_hi.free, loads64, jnp.zeros_like(loads64),
                pair1[0], pair1[1], grid_shape=op_hi.grid_shape,
            )
        rhs_pre = ((b_hiT, b_loT), b2c)
    else:
        u, r, rn, Au = _t_true_residual(
            op_hi.ke, op_hi.free, loads64, sol.displacements,
            jnp.zeros_like(sol.displacements, dtype=jnp.float64),
            grid_shape=op_hi.grid_shape,
        )
    rn_f = float(rn)
    passes = 0
    use_exact = False
    inner_ok = True
    while rn_f > tol * b_norm and passes < max_refine and np.isfinite(rn_f):
        say(
            f"refine pass {passes + 1}: true rel_res {rn_f / b_norm:.3e} "
            f"(recurrence claimed {rel0:.3e}) — solving the correction"
            + (" [exact f64 apply]" if use_exact else "")
        )
        # the correction only needs ||r - A d|| <= tol*||b||, i.e. a
        # RELATIVE reduction of tol*||b||/||r|| on its own rhs (~3e-4
        # when the floor sits ~1e-5 above a 1e-8 tol) — a handful of
        # inner iterations.  All inner solvers honor the hint (tol is a
        # runtime scalar in every staged program).
        tol_pass = min(1e-2, max(0.3 * tol * b_norm / rn_f, tol))
        solver = solve_exact if use_exact else solve_once
        if pair_protocol:
            spec_d = {}
            u_base = u

            def _spec_corr(xp, _u=u_base, _box=spec_d):
                _box["out"] = _t_certify_pair(
                    op_hi.ke, op_hi.free, loads64, _u,
                    xp[0], xp[1], grid_shape=op_hi.grid_shape,
                )

            sol_d, pair_d, spec_d_ok = solver(
                None, None, tol_hint=tol_pass, want_reactions=False,
                rhs_pre=rhs_pre, want_pair=True, speculate=_spec_corr,
            )
        else:
            sol_d = _corr_call(solver, jnp.asarray(r), tol_pass)
        iters += int(sol_d.stats.iterations)
        if not bool(sol_d.stats.converged):
            inner_ok = False
            break
        rn_before = rn_f
        if pair_protocol:
            if spec_d_ok and "out" in spec_d:
                u, rn, Au, b_hiT, b_loT, b2c = spec_d["out"]
            else:
                u, rn, Au, b_hiT, b_loT, b2c = _t_certify_pair(
                    op_hi.ke, op_hi.free, loads64, u_base,
                    pair_d[0], pair_d[1], grid_shape=op_hi.grid_shape,
                )
            rhs_pre = ((b_hiT, b_loT), b2c)
        else:
            u, r, rn, Au = _t_true_residual(
                op_hi.ke, op_hi.free, loads64, u, sol_d.displacements,
                grid_shape=op_hi.grid_shape,
            )
        rn_f = float(rn)
        passes += 1
        if rn_f > 0.25 * rn_before:
            if host_tier:
                # stagnating at the DEVICE certification apply's own
                # emulated-f64 noise floor (~1.6e-8 at 8.1M kappa):
                # further device-certified corrections chase noise.
                # Hand off to the host tier directly — its exact-IEEE
                # residuals the fast dd corrections CAN close.  (Round 3
                # burned an emulated-f64 exact-apply correction pass
                # here first, ~2.5 s at 8.1M, and needed the host tier
                # anyway.)
                say(
                    f"pass {passes}: contraction {rn_before / max(rn_f, 1e-300):.1f}x "
                    "— device certification floor; escalating to host"
                )
                break
            if not use_exact and solve_exact is not None:
                # no host tier available (the z-sharded pod path keeps
                # certification on-device): escalate to the exact-apply
                # corrections as before
                use_exact = True
    # --- host (IEEE f64) certification tier -------------------------------
    # TPU "f64" is double-f32 emulation (~2^-48/op, measured 1e-14 per
    # apply): the DEVICE residual itself carries noise ~2^-48 * |||K||u|||,
    # which crosses tol*||b|| at ~8M DOF (kappa-amplified cancellation) —
    # device-driven corrections then chase noise and stagnate (measured:
    # stuck at 1.5e-8 while a host-residual correction reached 5.7e-10).
    # When the device loop exits above tol, escalate to residuals computed
    # on the HOST in exact IEEE f64 (eps 1.1e-16/op — 2 decades more
    # certification headroom).  Never triggers at <= ~1M DOF, where the
    # device certificate is host-verified accurate.  ``host_tier=False``
    # (the z-sharded pod path) keeps certification on-device: gathering
    # the iterate to one host is exactly the single-device step that
    # path removes.
    if host_tier and rn_f > tol * b_norm and np.isfinite(rn_f) and inner_ok:
        loads_np = np.asarray(loads64, np.float64)
        free_np = np.asarray(op_hi.free, np.float64)
        # streamed first certification: the iterate pulls host-ward in
        # overlapping z-chunks while the native slab kernel runs on
        # already-arrived chunks (round-4 capacity-tier streaming); the
        # pulled host iterate is RETAINED — later passes stream only
        # f32 correction deltas (half the bytes, no re-pull)
        r_np, rn_h, Au_np, u_np = _host_true_residual_streamed(
            op_hi, loads_np, free_np, u
        )
        Zg, Yg, Xg = op_hi.grid_shape
        b_grid = np.ascontiguousarray(loads_np, np.float64).reshape(
            Zg, Yg, Xg, 3
        )
        free_grid = np.ascontiguousarray(free_np, np.float64).reshape(
            Zg, Yg, Xg, 3
        )
        say(
            f"device floor reached at {rn_f / b_norm:.3e} — host IEEE-f64 "
            f"certification says {rn_h / b_norm:.3e}"
        )
        host_passes = 0
        use_exact_host = False
        while rn_h > tol * b_norm and host_passes < 3 and np.isfinite(rn_h):
            say(f"host-residual correction pass {host_passes + 1}"
                + (" [exact f64 apply]" if use_exact_host else ""))
            tol_pass = min(1e-2, max(0.3 * tol * b_norm / rn_h, tol))
            # corrections through the FAST dd pipeline first: under
            # exact host certification each pass contracts by
            # ~max(tol_pass, dd floor ~1e-5) — plenty; the emulated-f64
            # exact-apply solver (~8x/apply) engages only if a host
            # pass itself stagnates (round-4)
            solver = (
                solve_exact if (use_exact_host and solve_exact is not None)
                else solve_once
            )
            # the correction rhs rides as f32: it only needs tol_pass
            # (>= 1e-2... 3e-4) RELATIVE accuracy, and f32 carries 1e-7
            # — half the upload bytes of the old f64 push
            sol_h = _corr_call(
                solver, jnp.asarray(r_np.astype(np.float32)), tol_pass
            )
            iters += int(sol_h.stats.iterations)
            # apply the SAME f32-rounded delta on device and host: the
            # two iterates stay within the device's emulated-f64 add
            # noise, and the certificate (computed on the host iterate)
            # remains exact for what it measures
            d32 = sol_h.displacements.astype(jnp.float32)
            u = u + d32.astype(jnp.float64)
            rn_h_before = rn_h
            r_np, rn_h, Au_np = _host_residual_delta_streamed(
                op_hi, b_grid, free_grid, u_np, d32
            )
            host_passes += 1
            if rn_h > 0.25 * rn_h_before:
                use_exact_host = True
        rn_f = rn_h
        # reactions as the HOST array: every consumer pulls them
        # host-side anyway, and pushing 195 MB at 8.1M costs seconds
        Au = Au_np
        say(f"host-certified rel_res {rn_f / b_norm:.3e}")
    if passes:
        say(f"refined: true rel_res {rn_f / b_norm:.3e} after {passes} pass(es)")
    stats = SolveStats(
        iterations=jnp.asarray(iters, jnp.int32),
        residual_norm=jnp.asarray(rn_f, jnp.float64),
        relative_residual=jnp.asarray(rn_f / b_norm, jnp.float64),
        converged=jnp.asarray(bool(rn_f <= tol * b_norm), bool),
    )
    return Solution(displacements=u, reactions=Au, stats=stats)


def _host_true_residual_streamed(op_hi, loads_np, free_np, u_dev,
                                 *, chunk_rows=48):
    """Streamed exact-IEEE host residual of a DEVICE-resident iterate
    (round-4 capacity tier, VERDICT r3 #3).

    The 8.1M-DOF host tier was transfer-bound: a 195 MB f64 iterate
    pull at the tunnel's ~55 MB/s cost ~3.5 s with the native residual
    kernel idle, then ran the kernel for 1.5 s with the link idle.
    Here the iterate is pulled in overlapping z-chunks whose
    device->host copies are ALL started asynchronously up front
    (jax.Array.copy_to_host_async), and the native slab-residual kernel
    (fea_stencil_residual_slab_f64) runs on chunk i while chunk i+1
    streams — the pull and the apply overlap to ~max(transfer, compute).

    Returns ``(r_np (N,3), rn, Au_np (N,3), u_np (Z,Y,X,3))`` — the
    pulled host iterate is retained so later passes never re-pull it
    (they stream only the f32 correction deltas).
    """
    import numpy as np

    from . import native

    Z, Y, X = op_hi.grid_shape
    nx, ny, nz = X - 1, Y - 1, Z - 1
    ke = np.asarray(op_hi.ke, np.float64)
    if not native.available():
        u_np = np.asarray(u_dev, np.float64).reshape(Z, Y, X, 3)
        r, rn, Au = _host_true_residual(op_hi, loads_np, u_np)
        return r, rn, Au, u_np
    u_grid = u_dev.reshape(Z, Y, X, 3)
    chunks = []
    for z0 in range(0, Z, chunk_rows):
        z1 = min(z0 + chunk_rows, Z)
        g0 = max(z0 - 1, 0)
        g1 = min(z1 + 1, Z)
        sl = u_grid[g0:g1]
        try:
            sl.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        chunks.append((z0, z1, g0, sl))
    b_grid = np.ascontiguousarray(loads_np, np.float64).reshape(Z, Y, X, 3)
    free_grid = np.ascontiguousarray(free_np, np.float64).reshape(Z, Y, X, 3)
    r_np = np.empty((Z, Y, X, 3))
    au_np = np.empty_like(r_np)
    u_np = np.empty_like(r_np)
    nrm2 = 0.0
    for z0, z1, g0, sl in chunks:
        g_slab = np.asarray(sl)  # blocks only for THIS chunk's transfer
        u_np[z0:z1] = g_slab[z0 - g0 : z0 - g0 + (z1 - z0)]
        out = native.stencil_residual_slab_host(
            ke, g_slab, b_grid[z0:z1], free_grid[z0:z1],
            r_np[z0:z1], au_np[z0:z1], (nx, ny, nz), z0, g0,
        )
        nrm2 += out
    return (
        r_np.reshape(-1, 3), float(np.sqrt(nrm2)), au_np.reshape(-1, 3), u_np
    )


def _host_residual_delta_streamed(op_hi, b_grid, free_grid, u_np, d32_dev,
                                  *, chunk_rows=48):
    """Accumulate a device f32 correction delta into the retained host
    iterate and re-certify, streaming the delta with a one-chunk lag so
    each slab's residual (which needs its z+1 halo updated) runs while
    the next delta chunk is in flight.  Updates ``u_np`` IN PLACE;
    returns ``(r_np, rn, Au_np)``.

    The delta rides as f32 (97 MB instead of 195 at 8.1M): a host
    correction d is ~1e-8 of |u|, so its f32 rounding perturbs the
    iterate ~1e-15 relative — and the next certification measures the
    perturbed iterate EXACTLY (iterative refinement is self-correcting,
    the certificate stays honest).  The caller applies the SAME rounded
    delta on device, keeping host and device iterates within the
    device's own emulated-f64 add noise (~2^-48)."""
    import numpy as np

    from . import native

    Z, Y, X = u_np.shape[:3]
    nx, ny, nz = X - 1, Y - 1, Z - 1
    ke = np.asarray(op_hi.ke, np.float64)
    if not native.available():
        u_np += np.asarray(d32_dev, np.float64).reshape(u_np.shape)
        return _host_true_residual(op_hi, b_grid, u_np)
    d_grid = d32_dev.reshape(Z, Y, X, 3)
    chunks = []
    for z0 in range(0, Z, chunk_rows):
        z1 = min(z0 + chunk_rows, Z)
        sl = d_grid[z0:z1]
        try:
            sl.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        chunks.append((z0, z1, sl))
    r_np = np.empty((Z, Y, X, 3))
    au_np = np.empty_like(r_np)
    nrm2 = 0.0

    def _slab_residual(z0, z1):
        g0 = max(z0 - 1, 0)
        g1 = min(z1 + 1, Z)
        return native.stencil_residual_slab_host(
            ke, u_np[g0:g1], b_grid[z0:z1], free_grid[z0:z1],
            r_np[z0:z1], au_np[z0:z1], (nx, ny, nz), z0, g0,
        )

    prev = None  # chunk whose +1 halo is now updated
    for z0, z1, sl in chunks:
        u_np[z0:z1] += np.asarray(sl).astype(np.float64)
        if prev is not None:
            nrm2 += _slab_residual(*prev)
        prev = (z0, z1)
    if prev is not None:
        nrm2 += _slab_residual(*prev)
    return r_np.reshape(-1, 3), float(np.sqrt(nrm2)), au_np.reshape(-1, 3)


def _host_true_residual(op_hi, loads_np, u_np):
    """Masked residual + raw apply of an iterate, in exact IEEE f64 on
    the host — the gold-standard certifier above the device's
    emulated-f64 floor.  Fast path: the native C++ fused residual kernel
    (fea_tpu/native, ~0.2 s/1M DOF vs ~1 s for the NumPy twin on this
    container's core); falls back to NumPy when no toolchain exists."""
    import numpy as np

    from . import native
    from .ops.structured import stencil_apply_np

    Z, Y, X = op_hi.grid_shape
    ke = np.asarray(op_hi.ke, np.float64)
    free = np.asarray(op_hi.free, np.float64)
    fused = native.stencil_residual_host(
        ke, u_np, loads_np, free, (X - 1, Y - 1, Z - 1)
    )
    if fused is not None:
        return fused
    Au = stencil_apply_np(
        ke, u_np.reshape(Z, Y, X, 3), (X - 1, Y - 1, Z - 1)
    ).reshape(-1, 3)
    r = free.reshape(-1, 3) * (loads_np.reshape(-1, 3) - Au)
    return r, float(np.linalg.norm(r)), Au


def solve_operator_fpcg_t_staged(
    op_hi,
    loads: jax.Array,
    prescribed: Optional[jax.Array],
    mg,
    *,
    tol: float = 1e-8,
    max_iters: int = 300,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
    progress=None,
    refine_true: bool = True,
    max_refine: int = 3,
) -> Solution:
    """:func:`solve_operator_fpcg_t` split into small per-stage programs.

    Identical algorithm and convergence behavior (flexible-PCG in
    double-f32 pair space — pinned against the fused ``_fpcg_t_dd_jit``
    by test), but the FCG outer loop runs on the HOST over four compact
    jitted programs: masked dd apply + <p, Ap>, the x/r axpy pair +
    ||r||^2, the V-cycle + its two dots, and the p update.  Rationale
    (VERDICT.md round-2 #1): the monolithic while-loop program takes
    ~25 min of cold-cache XLA compile on this toolchain, while these
    pieces compile in ~3 min total — and the ~11 outer iterations make
    per-dispatch overhead negligible.  One device->host scalar sync per
    iteration (the convergence check).

    ``refine_true`` (default): certify/refine against the exact f64
    operator (see :func:`_refine_true`) — reported stats are the TRUE
    residual, not the dd recurrence.

    ``progress``: optional callable(str) invoked at compile/solve
    milestones (the bench heartbeat).

    Interpret-mode caveat (CPU tests): run staged solves BEFORE any
    fused ``solve_operator_fpcg_t`` call in a process — executing the
    fused while-loop program first poisons later-traced programs with an
    effects token the pjit fast path miscounts (jax 0.9; reproduced in
    tests/test_staged.py's module docstring).  Irrelevant on TPU, where
    a process runs one pipeline.
    """
    from .ops.transposed import MultigridT, transpose_multigrid

    say = progress if progress is not None else (lambda s: None)
    if not refine_true:
        _warn_dd_tol_floor(tol)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas and not interpret:
        # no dd kernel available: the f64 fused program is small enough
        # to compile quickly on CPU (measured; the blowup is TPU-side)
        mg_t = mg if isinstance(mg, MultigridT) else transpose_multigrid(mg)
        return _fpcg_t_f64_jit(
            op_hi.ke, op_hi.free, mg_t, loads, prescribed,
            grid_shape=op_hi.grid_shape, tol=tol, max_iters=max_iters,
        )

    def solve_once(l, p, tol_hint=None, want_reactions=True, rhs_pre=None,
                   want_pair=False, speculate=None):
        return _solve_fpcg_t_staged_once(
            op_hi, l, p, mg, tol=tol_hint if tol_hint is not None else tol,
            max_iters=max_iters,
            use_pallas=use_pallas, interpret=interpret, say=say,
            want_reactions=want_reactions, rhs_pre=rhs_pre,
            want_pair=want_pair, speculate=speculate,
        )

    if not refine_true:
        return solve_once(loads, prescribed)

    def solve_exact(l, p, tol_hint=None, want_reactions=True, rhs_pre=None,
                    want_pair=False, speculate=None):
        return _solve_fpcg_t_staged_once(
            op_hi, l, p, mg, tol=tol_hint if tol_hint is not None else tol,
            max_iters=max_iters,
            use_pallas=use_pallas, interpret=interpret, say=say,
            exact_apply=True, want_reactions=want_reactions,
            rhs_pre=rhs_pre, want_pair=want_pair, speculate=speculate,
        )

    return _refine_true(
        solve_once, op_hi, loads, prescribed,
        tol=tol, max_refine=max_refine, say=say, solve_exact=solve_exact,
        inner_floor=_DD_RECURRENCE_FLOOR, pair_protocol=True,
    )


def _solve_fpcg_t_staged_once(
    op_hi,
    loads: jax.Array,
    prescribed: Optional[jax.Array],
    mg,
    *,
    tol: float,
    max_iters: int,
    use_pallas: bool,
    interpret: bool,
    say,
    exact_apply: bool = False,
    want_reactions: bool = True,
    want_pair: bool = False,
    rhs_pre=None,
    speculate=None,
):
    """One staged FCG pass (the round-2 host-loop solver body).

    ``want_reactions=False`` (refinement correction passes, whose
    Solution only feeds displacements/stats) skips the reaction-recovery
    apply — one fewer dd-kernel dispatch per pass.

    ``exact_apply``: use the emulated-f64 XLA transposed apply
    (_st_apply_dot_xla, 1.0e-14 measured accuracy on-chip) instead of
    the dd Pallas kernel — the escalation target for refinement passes
    that stagnate on the kernel's cancellation-amplified floor.

    Round-4 pair protocol (sync/dispatch cuts for the refinement flow):
    ``want_pair=True`` returns ``(Solution, x_pairT, spec_valid)`` — the
    converged iterate stays in its T-layout double-f32 pair for
    :func:`_t_certify_pair` (Solution.displacements is then None on the
    converged path; it is still combined on non-converged exits, which
    callers return to users).  ``rhs_pre=((b_hiT, b_loT), b2)`` is a
    pre-split homogeneous rhs straight from the previous certification
    program — the setup program is skipped (prescribed must be None).

    ``speculate`` (pair protocol only): a callable invoked with chunk
    1's resulting x-pair right after that chunk is QUEUED — the
    refinement driver uses it to dispatch the certification program
    speculatively, so certify executes back-to-back with the chunk on
    device and its scalar sync replaces (rather than follows) the drain
    round trip.  ``spec_valid`` in the return says whether the
    speculated pair IS the converged iterate (true whenever the pass
    converged within chunk 1 — the common flagship case)."""
    import numpy as np

    from .ops import df64
    from .ops.pallas_stencil import stencil_tables_dd
    from .ops.transposed import MultigridT, grid_of_t, t_of_grid, transpose_multigrid

    mg_t = (
        mg
        if isinstance(mg, MultigridT)
        else transpose_multigrid(mg, use_pallas=use_pallas, interpret=interpret)
    )
    ddtabs = stencil_tables_dd(np.asarray(op_hi.ke, np.float64))

    hi = op_hi.free.dtype
    Z, Y, X = op_hi.grid_shape
    freeT32 = t_of_grid(op_hi.free.astype(jnp.float32).reshape(Z, Y, X, 3))
    ones_mask = jnp.ones_like(freeT32)
    loadsT = (
        t_of_grid(loads.astype(hi).reshape(Z, Y, X, 3))
        if rhs_pre is None else None
    )

    # very large single-chip grids (X*Z beyond the dd kernel's VMEM fit,
    # ~5M DOF): run the kernel in static z slabs — same speed class,
    # the f32 V-cycle kernels shrink their own y-slabs
    from .ops.pallas_stencil import dd_kernel_fits_vmem, dd_z_chunks

    n_ch = 1
    if exact_apply:
        apply_mode = "xla"
        tabs = jnp.asarray(np.asarray(op_hi.ke, np.float64))
        apply_dot = lambda mask, pair: _st_apply_dot_xla(  # noqa: E731
            mask, tabs, pair
        )
    elif interpret or dd_kernel_fits_vmem(Y, X, Z):
        apply_mode = "dd"
        tabs = ddtabs
        apply_dot = lambda mask, pair: _st_apply_dot(  # noqa: E731
            mask, ddtabs, pair, interpret=interpret
        )
    else:
        apply_mode = "chunked"
        tabs = ddtabs
        n_ch = dd_z_chunks(Y, X, Z)
        say(f"note: grid above dd-kernel VMEM fit — {n_ch} z-chunk kernel calls per apply")
        apply_dot = lambda mask, pair: _st_apply_dot_chunked(  # noqa: E731
            mask, ddtabs, pair, n_chunks=n_ch, interpret=interpret
        )

    say("compiling: setup")
    if rhs_pre is not None:
        if prescribed is not None:
            raise ValueError("rhs_pre is a homogeneous-rhs fast path")
        b_pair, b2 = rhs_pre
        x_pair = df64.from_f32(jnp.zeros_like(b_pair[0]))
        r_pair, rr = b_pair, b2  # x0 = 0 -> r = b
    elif prescribed is None:
        b_pair, b2 = _st_setup_homog(freeT32, loadsT)
        x_pair = df64.from_f32(jnp.zeros_like(b_pair[0]))
        r_pair, rr = b_pair, b2  # x0 = 0 -> r = b
    else:
        prescT = t_of_grid(prescribed.astype(hi).reshape(Z, Y, X, 3))
        xp_pair = _st_split_fixed(freeT32, prescT)
        say("compiling: dd apply")
        Axp, _ = apply_dot(ones_mask, xp_pair)
        b_pair, b2 = _st_rhs_inhomog(freeT32, loadsT, Axp, xp_pair)
        x_pair = xp_pair
        # r = b - A_masked(x0): with x0 = xp (zero on free rows) the
        # masked apply is (1-F) xp, which cancels b's fixed rows exactly,
        # so r = F * b — no apply needed.
        r_pair = _st_mask_pair(freeT32, b_pair)
        rr = _st_pair_norm2(r_pair)

    say("compiling: k-step FCG program (V-cycle + dd apply + algebra)")
    # Round-4 flagship restructure (VERDICT r3 #1): k iterations per
    # dispatch via the lax.scan program _st_k_steps — the FCG start folds
    # into the scan's first step (precond-first rotation, beta*0
    # annihilation), so the whole Krylov loop is ceil(iters/k) dispatches
    # of ONE program.  Host sync discipline (each device->host scalar
    # pull is a ~25 ms tunnel round trip; they, not device work,
    # dominated the 3-dispatch loop): the convergence threshold is
    # computed in-program from the device b2, chunk 1 dispatches BEFORE
    # the ||b||/||r0|| pulls so those overlap its execution, the first
    # chunk drains immediately (it usually holds the whole pass:
    # k=16 vs ~11 flagship iterations), and only later chunks dispatch
    # 1-deep speculatively to keep the pipe full on long solves.
    # In-body cond-freezing makes oversized/speculative chunks ~free,
    # and the runtime `limit` scalar enforces max_iters without retrace.
    k_fuse = _staged_k(interpret)
    tol2_dev = jnp.asarray(tol * tol, jnp.float64)
    # every argument a distinct buffer (pjit fast-path dedup hazard —
    # see _st_precond_p's docstring)
    state = (
        x_pair,
        r_pair,
        df64.from_f32(jnp.zeros_like(r_pair[0])),  # throwaway r_old
        (jnp.zeros_like(r_pair[0]), jnp.zeros_like(r_pair[1])),  # p = 0
        jnp.asarray(1.0, jnp.float64),  # throwaway rz (start: beta*0 = 0)
        rr,
        jnp.asarray(False),
    )

    def launch(st, live_n):
        return _st_k_steps(
            mg_t, freeT32, tabs, *st, tol2_dev, b2,
            jnp.asarray(live_n, jnp.int32),
            k=k_fuse, apply_mode=apply_mode, n_chunks=n_ch,
            interpret=interpret,
        )

    pending = None  # (rrs device array, live_n, state after that chunk)
    launched = 0
    state1 = None
    if max_iters > 0:
        live1 = min(k_fuse, max_iters)
        state1, rrs1 = launch(state, live1)
        if speculate is not None and want_pair:
            # queue the caller's speculative follow-up (certification)
            # back-to-back with chunk 1 on the device
            speculate(state1[0])
    # these pulls overlap chunk 1's execution on the device
    b_norm = float(np.sqrt(np.asarray(b2)))
    safe_b_norm = b_norm if b_norm > 0 else 1.0
    rr0 = float(np.asarray(rr))
    blowup = 1e12 * max(rr0, safe_b_norm * safe_b_norm)

    it = 0
    rr_f = rr0
    converged = rr_f**0.5 <= tol * safe_b_norm
    blown = not (rr_f < blowup and rr_f == rr_f)
    if not converged and not blown and max_iters > 0:
        launched = live1
        pending = (rrs1, live1, state1)
    # (if rr0 already converged — zero rhs — chunk 1 was dispatched but
    # is discarded: its first live step is an exact no-op on r = 0 and
    # the rest freeze, so the init state below is the right result)

    def _drain(pending):
        nonlocal it, rr_f, converged, blown, state
        rrs_np, live_n, st = pending
        rrs_host = np.asarray(rrs_np)  # the one sync per chunk
        for i in range(live_n):
            rr_f = float(rrs_host[i])
            it += 1
            if rr_f**0.5 <= tol * safe_b_norm:
                converged = True
                break
            if not (rr_f < blowup and rr_f == rr_f):
                blown = True
                break
        state = st
        if not (converged or blown) and (it <= 2 or it % (5 * k_fuse) < k_fuse):
            say(f"iter {it}: rel_res {rr_f**0.5 / safe_b_norm:.3e}")

    if pending is not None:
        _drain(pending)  # drain-first: no speculative dispatch yet
        pending = None
    while not converged and not blown and launched < max_iters:
        live_n = min(k_fuse, max_iters - launched)
        new_state, rrs = launch(state, live_n)
        launched += live_n
        if pending is not None:
            _drain(pending)
            if converged or blown:
                break
        pending = (rrs, live_n, new_state)
        if not (converged or blown):
            state = new_state
    if not (converged or blown) and pending is not None:
        _drain(pending)
    x_pair = state[0]
    k = it

    res = rr_f**0.5
    # host-scalar stats: every float()/int() a caller does on these is
    # free instead of a device round trip (the refinement driver reads
    # them between passes)
    stats = SolveStats(
        iterations=np.int32(k),
        residual_norm=np.float64(res),
        relative_residual=np.float64(res / safe_b_norm),
        converged=np.bool_(bool(converged)),
    )
    spec_valid = bool(converged) and state1 is not None and state is state1
    if want_pair and converged and not want_reactions:
        # pair protocol: the certify program combines in-program; skip
        # the eager combine tail entirely
        return (
            Solution(displacements=None, reactions=None, stats=stats),
            x_pair,
            spec_valid,
        )
    u = grid_of_t(df64.combine(x_pair, hi)).reshape(-1, 3)
    if prescribed is not None:
        # pair-split representation of prescribed values carries ~1e-21
        # round-off; reinstate the exact f64 values on fixed rows
        free_n3 = op_hi.free.reshape(-1, 3)
        u = jnp.where(free_n3 > 0, u, prescribed.astype(hi).reshape(-1, 3))
    reactions = None
    if want_reactions:
        say("recovering reactions")
        react_pair, _ = apply_dot(ones_mask, x_pair)
        reactions = grid_of_t(df64.combine(react_pair, hi)).reshape(-1, 3)
    sol = Solution(displacements=u, reactions=reactions, stats=stats)
    return (sol, x_pair, spec_valid) if want_pair else sol


def _curv_host_pack(op):
    """Host-side (w_np, packed-native) weight pack for the curvilinear
    certification tier, pulled from the device ONCE per operator and
    cached on the (frozen) operator object — repeat solves on one mesh
    (the reference's own use pattern) pay the ~0.5 GB/812k-DOF pull and
    node-major repack exactly once."""
    import numpy as np

    from . import native

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

    from . import native
    from .ops.curvilinear import curv_apply_np
    from .solvers.cg import SolveStats, fpcg_dd64_staged

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


# In-process build cache (round-4, VERDICT r3 #6): the curvilinear and
# extruded families pay 5-20 s of one-time hierarchy construction per
# OPERATOR, but `solve()` rebuilt per CALL — 25x the sub-second solve
# for the reference's actual workload (one mesh, many loads).  Entries
# key on the IDENTITY of the scene's defining arrays (nodes, elements,
# fixed) plus the material; strong references to the keyed arrays live
# in the entry, so ids cannot be recycled while cached and an `is`
# match is sound.  Two entries per family (LRU) bound device memory
# (~1 GB at 812k DOF).
_BUILD_CACHE: dict = {}
_BUILD_CACHE_MAX = 2


def _cached_build(kind: str, scene: Scene, builder):
    key_arrays = (scene.nodes, scene.elements, scene.fixed)
    mat = (float(scene.material.E), float(scene.material.nu))
    bucket = _BUILD_CACHE.setdefault(kind, [])
    for entry in bucket:
        if (
            all(a is b for a, b in zip(entry[0], key_arrays))
            and entry[1] == mat
        ):
            return entry[2]
    value = builder()
    bucket.append((key_arrays, mat, value))
    if len(bucket) > _BUILD_CACHE_MAX:
        bucket.pop(0)
    return value


def build_curvilinear(scene: Scene, detected=None, *, degree: int = 2,
                      check_jacobians: bool = True):
    """One-time setup for :func:`solve_curvilinear`: returns ``(op, mg)``.

    ``op`` is the f64 variable-coefficient block-stencil operator
    (device-assembled weight field) and ``mg`` the re-discretized
    geometric V-cycle over it (ops/curvilinear.py).  Callers solving
    many load cases on one mesh build once and pass the result via
    ``solve_curvilinear(..., prebuilt=...)``."""
    import numpy as np

    from .ops.curvilinear import (
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
        scene, detected, dtype=jnp.float64, check_jacobians=check_jacobians
    )
    free_np = 1.0 - np.asarray(scene.fixed, np.float64)
    mg = build_curv_multigrid(
        np.asarray(scene.nodes, np.float64), detected, free_np,
        scene.material, w0=op.w, degree=degree,
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
        from .ops.curvilinear import (
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
        from .solvers.cg import fpcg_dd64_staged

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
            from .solvers.cg import SolveStats as _SS

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


def solve_many(
    scene: Scene,
    loads_batch,
    *,
    tol: float = 1e-8,
    max_iters: int = 300,
    prescribed_batch=None,
    on_nonconverged: str = "warn",
) -> Solution:
    """Solve MANY load cases on ONE mesh in a single batched program —
    the reference's own use pattern (one mesh family, many scenes:
    /root/reference/cubebeam.py vs fea.py) at production scale.

    ``loads_batch`` is (k, N, 3).  The operator and preconditioner are
    built ONCE; the k flexible-PCG solves run under ``jax.vmap`` in one
    jitted program, so the per-case cost amortizes everything a cold
    solve pays per case — operator/hierarchy build, program dispatch
    (~0.5 s/dispatch through this TPU tunnel), and compile — and the
    batched stencil applies keep the chip's HBM streams full.  Measured:
    8 cases at 56k DOF in ~0.1x the per-case cost of 8 cold solves.

    Routing mirrors :func:`solve` ('auto'): voxel boxes take the
    structured stencil multigrid — on TPU with zero prescribed
    displacements through the BATCHED k-step flagship pipeline
    (:func:`_solve_many_staged`: dd-Pallas staged programs with a case
    axis, exact-f64 certification and per-case-tolerance corrections;
    round-4, VERDICT r3 #4) — topological grids the curvilinear stencil
    multigrid, extruded meshes the z-semicoarsened+section-RBM
    hierarchy, anything else the two-level-preconditioned unstructured
    operator.  All paths run honest f64-class recurrences (x64
    required).  Returns a Solution whose arrays have a leading k axis
    and whose stats fields are per-case arrays.

    ``on_nonconverged`` ('warn' default, 'raise', 'ignore'): a batch
    member that exits above tol must never be silent — the failure mode
    a batched API invites is exactly one bad case hiding in k good ones
    (VERDICT r3 weak #5).
    """
    import numpy as np

    from .dtypes import x64_enabled

    if not x64_enabled():
        raise RuntimeError(
            "solve_many() needs x64 for the f64-recurrence paths "
            "(jax.config.update('jax_enable_x64', True) before first "
            "jax use)."
        )
    loads_batch = jnp.asarray(loads_batch, jnp.float64)
    if loads_batch.ndim != 3 or loads_batch.shape[1:] != (scene.n_nodes, 3):
        raise ValueError(
            f"loads_batch must be (k, {scene.n_nodes}, 3), got "
            f"{loads_batch.shape}"
        )
    if prescribed_batch is None:
        prescribed_batch = jnp.zeros_like(loads_batch)
    else:
        prescribed_batch = jnp.asarray(prescribed_batch, jnp.float64)

    if on_nonconverged not in ("warn", "raise", "ignore"):
        raise ValueError("on_nonconverged must be 'warn', 'raise', or 'ignore'")

    def checked(sol: Solution) -> Solution:
        if on_nonconverged != "ignore":
            conv = np.asarray(sol.stats.converged)
            if not conv.all():
                import warnings

                bad = np.nonzero(~conv)[0].tolist()
                rels = np.asarray(sol.stats.relative_residual)[~conv]
                msg = (
                    f"solve_many: {len(bad)}/{conv.size} case(s) did not "
                    f"converge (indices {bad}, worst relative residual "
                    f"{float(np.nanmax(rels)):.3e}, target {tol:g})"
                )
                if on_nonconverged == "raise":
                    raise RuntimeError(msg)
                warnings.warn(msg, RuntimeWarning, stacklevel=3)
        return sol

    from .ops.structured import build_structured_operator, infer_box_dims

    op_hi = None
    precond = None
    dims = infer_box_dims(scene)
    if dims is not None:
        from .ops.multigrid import build_multigrid

        op_hi = build_structured_operator(scene, dims, dtype=jnp.float64)
        free_np = 1.0 - np.asarray(scene.fixed, np.float64)
        # TPU + zero-prescribed batches: the batched k-step flagship
        # pipeline (the same production programs single solves run)
        if (
            jax.default_backend() == "tpu"
            and not bool(jnp.any(prescribed_batch != 0))
        ):
            from .ops.transposed import build_multigrid_t

            mg_t = build_multigrid_t(
                op_hi.astype(jnp.float32), dtype=jnp.float32,
                use_pallas=True, pallas_min_dof=50_000, free_np=free_np,
            )
            return checked(_solve_many_staged(
                op_hi, mg_t, loads_batch, tol=tol, max_iters=max_iters,
                use_pallas=True,
            ))
        precond = build_multigrid(
            op_hi.astype(jnp.float32), dtype=jnp.float32, free_np=free_np
        )
    if op_hi is None:
        from .ops.extruded import infer_extruded

        ext = infer_extruded(scene)
        if ext is not None and extruded_mg_coarsenable(ext[2] - 1):
            op_hi, precond = build_extruded(scene, ext)
    if op_hi is None:
        from .ops.curvilinear import curv_coarsenable, infer_topo_dims

        tdims = infer_topo_dims(scene)
        if tdims is not None and curv_coarsenable(tdims):
            op_hi, precond = build_curvilinear(scene, tdims)
    if op_hi is None:
        from .ops.twolevel import build_two_level_cheb

        op_hi = build_operator(scene, dtype=jnp.float64)
        precond = build_two_level_cheb(op_hi, scene.nodes)

    return checked(_solve_many_jit(
        op_hi, precond, loads_batch, prescribed_batch,
        tol=tol, max_iters=max_iters,
    ))


@partial(jax.jit, static_argnames=("grid_shape",))
def _t_certify_pair_many(ke, free, loads_b, u64_b, du_hi_b, du_lo_b, *,
                         grid_shape):
    """Per-case :func:`_t_certify_pair` over a stacked case axis (vmap —
    the certification apply is the Pallas-free scan-form stencil, which
    vmaps cleanly)."""
    return jax.vmap(
        lambda l, u, h, lo: _t_certify_pair(
            ke, free, l, u, h, lo, grid_shape=grid_shape
        )
    )(loads_b, u64_b, du_hi_b, du_lo_b)


@jax.jit
def _st_setup_homog_many(freeT32, loadsT_b):
    return jax.vmap(lambda lt: _st_setup_homog(freeT32, lt))(loadsT_b)


def _solve_many_staged(op_hi, mg, loads_batch, *, tol, max_iters,
                       use_pallas, interpret=False, say=lambda s: None,
                       max_corrections=3):
    """Multi-RHS flagship solve: the k-step staged voxel pipeline with a
    batched case axis (round-4, VERDICT r3 #4).

    Pass 1 runs every case to the dd recurrence floor inside the
    batched k-step program (:func:`_st_k_steps_many` — ONE dispatch
    advances all cases k iterations, per-case cond-freezing), then the
    whole batch certifies against the exact f64 apply in one vmapped
    program and correction passes run batched at PER-CASE tolerance
    hints until every case's true residual meets tol.  Stats fields
    come back as per-case arrays; reactions are the certification
    apply's raw field.

    Homogeneous (zero-prescribed) batches only — the `solve_many`
    router falls back to the generic vmapped-fpcg program otherwise.
    Device-certified tier (the flagship's sub-8M-DOF standard).
    """
    import numpy as np

    from .ops import df64
    from .ops.pallas_stencil import (
        dd_kernel_fits_vmem,
        dd_z_chunks,
        stencil_tables_dd,
    )
    from .ops.transposed import MultigridT, t_of_grid, transpose_multigrid

    mg_t = (
        mg if isinstance(mg, MultigridT)
        else transpose_multigrid(mg, use_pallas=use_pallas, interpret=interpret)
    )
    ddtabs = stencil_tables_dd(np.asarray(op_hi.ke, np.float64))
    hi = op_hi.free.dtype
    Z, Y, X = op_hi.grid_shape
    kc = loads_batch.shape[0]
    freeT32 = t_of_grid(op_hi.free.astype(jnp.float32).reshape(Z, Y, X, 3))

    n_ch = 1
    if not use_pallas and not interpret:
        apply_mode, tabs = "xla", jnp.asarray(np.asarray(op_hi.ke, np.float64))
    elif interpret or dd_kernel_fits_vmem(Y, X, Z):
        apply_mode, tabs = "dd", ddtabs
    else:
        apply_mode, tabs = "chunked", ddtabs
        n_ch = dd_z_chunks(Y, X, Z)

    loadsT_b = jax.vmap(
        lambda l: t_of_grid(l.astype(hi).reshape(Z, Y, X, 3))
    )(loads_batch)
    say("compiling: batched setup")
    b_pairs, b2s = _st_setup_homog_many(freeT32, loadsT_b)

    k_fuse = _staged_k(interpret)
    tol1 = max(0.3 * tol, _DD_RECURRENCE_FLOOR)

    def zeros_pair():
        return (
            jnp.zeros((kc, 3, Y, X, Z), jnp.float32),
            jnp.zeros((kc, 3, Y, X, Z), jnp.float32),
        )

    def run_batched(b_pairs, b2s, tol2s):
        """Batched FCG to per-case thresholds; returns (x_pairs,
        per-case iteration counts, per-case last rr)."""
        states = (
            (jnp.zeros_like(b_pairs[0]), jnp.zeros_like(b_pairs[1])),  # x
            b_pairs,  # r = b (x0 = 0)
            zeros_pair(),  # throwaway r_old
            zeros_pair(),  # p = 0
            jnp.ones((kc,), jnp.float64),  # throwaway rz
            b2s,  # rr
            jnp.zeros((kc,), bool),
        )
        say("compiling: batched k-step FCG program")
        th_np = np.asarray(tol2s) * np.maximum(np.asarray(b2s), 0.0)
        th_np = np.where(th_np > 0, th_np, np.asarray(tol2s))
        its = np.zeros(kc, np.int64)
        rr_f = np.asarray(b2s).copy()
        done = rr_f <= th_np  # zero-rhs cases converge at 0 iterations
        launched = 0
        while not done.all() and launched < max_iters:
            live_n = min(k_fuse, max_iters - launched)
            states, rrs = _st_k_steps_many(
                mg_t, freeT32, tabs, states, tol2s, b2s,
                jnp.asarray(live_n, jnp.int32),
                k=k_fuse, apply_mode=apply_mode, n_chunks=n_ch,
                interpret=interpret,
            )
            launched += live_n
            rrs_np = np.asarray(rrs)  # (kc, k) — ONE sync for the batch
            for c in np.nonzero(~done)[0]:
                hit = np.nonzero(rrs_np[c, :live_n] <= th_np[c])[0]
                if hit.size:
                    its[c] += int(hit[0]) + 1
                    rr_f[c] = rrs_np[c, hit[0]]
                    done[c] = True
                else:
                    its[c] += live_n
                    rr_f[c] = rrs_np[c, live_n - 1]
                    if not (rr_f[c] == rr_f[c]):  # NaN blowup: stop case
                        done[c] = True
        return states[0], its, rr_f

    tol2s1 = jnp.full((kc,), tol1 * tol1, jnp.float64)
    x_pairs, its, _ = run_batched(b_pairs, b2s, tol2s1)
    total_its = its.copy()

    loads64_b = loads_batch.astype(jnp.float64)
    say("certifying batch (exact f64 apply)")
    u_b, rn_b, Au_b, bh_b, bl_b, b2c_b = _t_certify_pair_many(
        op_hi.ke, op_hi.free, loads64_b,
        jnp.zeros_like(loads64_b), x_pairs[0], x_pairs[1],
        grid_shape=op_hi.grid_shape,
    )
    b_norms = np.sqrt(np.maximum(np.asarray(b2s), 0.0))
    safe_b = np.where(b_norms > 0, b_norms, 1.0)
    rn_np = np.asarray(rn_b)
    for _ in range(max_corrections):
        rel = rn_np / safe_b
        if (rel <= tol).all() or not np.isfinite(rel).any():
            break
        say(
            f"correction pass: worst true rel_res {np.nanmax(rel):.3e} "
            f"({int((rel > tol).sum())}/{kc} cases above tol)"
        )
        # per-case correction tolerance (converged cases get a huge
        # threshold -> their correction freezes after ~1 step)
        tol_pass = np.clip(0.3 * tol * safe_b / np.maximum(rn_np, 1e-300),
                           1e-12, 1e-2)
        tol_pass = np.where(rel <= tol, 1e6, tol_pass)
        d_pairs, d_its, _ = run_batched(
            (bh_b, bl_b), b2c_b, jnp.asarray(tol_pass**2, jnp.float64)
        )
        total_its += d_its
        u_b, rn_b, Au_b, bh_b, bl_b, b2c_b = _t_certify_pair_many(
            op_hi.ke, op_hi.free, loads64_b, u_b, d_pairs[0], d_pairs[1],
            grid_shape=op_hi.grid_shape,
        )
        rn_np = np.asarray(rn_b)
    rel = rn_np / safe_b
    stats = SolveStats(
        iterations=jnp.asarray(total_its, jnp.int32),
        residual_norm=jnp.asarray(rn_np, jnp.float64),
        relative_residual=jnp.asarray(rel, jnp.float64),
        converged=jnp.asarray(rel <= tol),
    )
    return Solution(displacements=u_b, reactions=Au_b, stats=stats)


@partial(jax.jit, static_argnames=("tol", "max_iters"))
def _solve_many_jit(op_hi, precond, loads_batch, prescribed_batch, *,
                    tol, max_iters):
    from .solvers.cg import fpcg

    def one(loads, prescribed):
        b = op_hi.rhs(loads, prescribed)
        x0 = (1.0 - op_hi.free) * prescribed

        def M(r):
            return precond(r.astype(jnp.float32)).astype(b.dtype)

        u, stats = fpcg(op_hi.apply, b, x0, precond=M, tol=tol,
                        max_iters=max_iters)
        return u, op_hi.apply_raw(u), stats

    u, reactions, stats = jax.vmap(one)(loads_batch, prescribed_batch)
    return Solution(displacements=u, reactions=reactions, stats=stats)


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
    from .ops.extruded import build_extruded_operator, infer_extruded
    from .ops.extruded_mg import (
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
    from .solvers.cg import fpcg

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
    from .solvers.cg import fpcg_dd64

    b = op.rhs(loads, prescribed)
    x0 = (1.0 - op.free) * prescribed
    u, stats = fpcg_dd64(
        op.apply, b, x0, precond32=mg, tol=tol, max_iters=max_iters
    )
    reactions = op.apply_raw(u)
    return Solution(displacements=u, reactions=reactions, stats=stats)


# -- staged-solver device programs (compiled once per shape each) -------------


@jax.jit
def _st_setup_homog(freeT32, loadsT):
    from .ops import df64

    b_pair = df64.split(freeT32 * loadsT)
    return b_pair, df64.dot(b_pair, b_pair)


@jax.jit
def _st_split_fixed(freeT32, prescT):
    from .ops import df64

    return df64.split((1.0 - freeT32.astype(prescT.dtype)) * prescT)


@jax.jit
def _st_rhs_inhomog(freeT32, loadsT, Axp_pair, xp_pair):
    from .ops import df64

    G32 = 1.0 - freeT32
    loads_pair = df64.split(loadsT)
    rhs = df64.add(loads_pair, (-Axp_pair[0], -Axp_pair[1]))
    b_pair = (
        freeT32 * rhs[0] + G32 * xp_pair[0],
        freeT32 * rhs[1] + G32 * xp_pair[1],
    )
    return b_pair, df64.dot(b_pair, b_pair)


@jax.jit
def _st_mask_pair(freeT32, v_pair):
    return (freeT32 * v_pair[0], freeT32 * v_pair[1])


@jax.jit
def _st_pair_norm2(v_pair):
    from .ops import df64

    return df64.dot(v_pair, v_pair)


@partial(jax.jit, static_argnames=("interpret",))
def _st_apply_dot(maskT32, ddtabs, p_pair, *, interpret=False):
    """Masked dd stencil apply + <p, Ap>.  With maskT32 = ones this IS the
    raw apply (F A(F x) + (1-F) x with F = 1), so one compiled program
    serves the Krylov loop, the inhomogeneous rhs, and reaction recovery."""
    from .ops import df64
    from .ops.pallas_stencil import stencil_apply_transposed_dd

    G32 = 1.0 - maskT32
    fh, fl = stencil_apply_transposed_dd(
        None, None, None, None, maskT32 * p_pair[0], maskT32 * p_pair[1],
        tables=ddtabs, interpret=interpret,
    )
    Ap = (maskT32 * fh + G32 * p_pair[0], maskT32 * fl + G32 * p_pair[1])
    return Ap, df64.dot(p_pair, Ap)


@partial(jax.jit, static_argnames=("n_chunks", "interpret"))
def _st_apply_dot_chunked(maskT32, ddtabs, p_pair, *, n_chunks, interpret=False):
    """:func:`_st_apply_dot` with the dd kernel run in ``n_chunks``
    static z slabs (pallas_stencil.stencil_apply_transposed_dd_chunked)
    — the single-chip path for grids above the kernel's VMEM fit, same
    per-apply speed class as the single-call kernel."""
    from .ops import df64
    from .ops.pallas_stencil import stencil_apply_transposed_dd_chunked

    G32 = 1.0 - maskT32
    fh, fl = stencil_apply_transposed_dd_chunked(
        maskT32 * p_pair[0], maskT32 * p_pair[1],
        tables=ddtabs, n_chunks=n_chunks, interpret=interpret,
    )
    Ap = (maskT32 * fh + G32 * p_pair[0], maskT32 * fl + G32 * p_pair[1])
    return Ap, df64.dot(p_pair, Ap)


@jax.jit
def _st_apply_dot_xla(maskT32, ke64, p_pair):
    """XLA emulated-f64 twin of :func:`_st_apply_dot` for grids whose
    X*Z footprint exceeds the dd kernel's VMEM fit
    (pallas_stencil.dd_kernel_fits_vmem): combine the pair to f64, apply
    the transposed stencil natively/emulated, split back.  ~4x the
    kernel's per-apply cost at 1M-DOF scale (17 ms vs 4.1 ms measured),
    paid only above ~5M DOF on one chip."""
    from .ops import df64
    from .ops.transposed import stencil_apply_grid_T

    F = maskT32.astype(jnp.float64)
    x64 = df64.combine(p_pair, jnp.float64)
    Ax = F * stencil_apply_grid_T(ke64, F * x64) + (1.0 - F) * x64
    Ap = df64.split(Ax)
    return Ap, df64.dot(p_pair, Ap)


@jax.jit
def _st_update_xr(rz, pAp, p_pair, Ap_pair, x_pair, r_pair):
    """alpha = rz/pAp computed INSIDE the program: the staged loop's
    eager scalar algebra each cost a tunnel dispatch (~3-5 ms); folding
    them into the neighboring programs leaves 3 dispatches/iteration."""
    from .ops import df64

    alpha = rz / jnp.where(pAp > 0, pAp, jnp.asarray(1.0, pAp.dtype))
    x = df64.axpy(alpha, p_pair, x_pair)
    r = df64.axpy(-alpha, Ap_pair, r_pair)
    return x, r, df64.dot(r, r)


@jax.jit
def _st_precond_p(mg_t, r_pair, r_old_pair, rz, p_pair):
    """V-cycle + Polak-Ribiere beta + search-direction update in ONE
    program (was _st_precond_dots + eager beta + _st_p_update = three
    tunnel dispatches).  The pre-loop call reuses this same executable
    with a ZERO ``p_pair`` (and any throwaway ``r_old_pair``/``rz``):
    beta*0 is an exact EFT product, so whatever beta comes out, p = z —
    exactly the fpcg start.  beta itself is garbage there; nothing may
    rely on its value, only on its annihilation."""
    from .ops import df64

    z32 = mg_t(r_pair[0])
    z_pair = df64.from_f32(z32)
    rz_new = df64.dot(r_pair, z_pair)
    rz_old_z = df64.dot(r_old_pair, z_pair)
    beta = (rz_new - rz_old_z) / jnp.where(rz != 0, rz, jnp.asarray(1.0, rz.dtype))
    p_new = df64.axpy(beta, p_pair, z_pair)
    return p_new, rz_new


def _staged_k(interpret: bool) -> int:
    """Iterations fused per dispatch in the staged flagship loop.

    Default 16 on hardware: the flagship's 11-to-floor pass 1 and its
    ~2-iteration correction pass each fit in ONE dispatch, and
    past-convergence steps are skipped in-device (lax.cond in
    _st_k_steps) so an oversized chunk costs nothing.  1 under
    interpret-mode Pallas (CPU tests), where even the cond's trace
    weight matters and per-step parity is what the tests pin.
    Override with FEA_TPU_STAGED_K."""
    import os

    v = os.environ.get("FEA_TPU_STAGED_K")
    if v:
        return max(1, int(v))
    return 1 if interpret else 16


@partial(jax.jit, static_argnames=("k", "apply_mode", "n_chunks", "interpret"))
def _st_k_steps(mg_t, freeT32, tabs, x_pair, r_pair, r_old_pair, p_pair,
                rz, rr, done, tol2, b2, limit, *, k, apply_mode="dd",
                n_chunks=1, interpret=False):
    """``k`` FCG iterations in ONE device program (round-4 directive #1).

    The per-iteration stage sequence of the staged loop — V-cycle +
    Polak-Ribiere p-update (:func:`_st_precond_p`), masked dd apply +
    <p,Ap> (:func:`_st_apply_dot`), x/r axpy pair + ||r||^2
    (:func:`_st_update_xr`) — chained ``k`` times inside one
    ``lax.scan`` body, so a solve costs ceil(iters/k) dispatches instead
    of 3*iters.  The scan embeds each Pallas kernel ONCE (same
    executable-size class as the three separate programs combined), so
    cold compile stays in the staged budget, not the retired fused
    while-loop program's ~25 min.

    The loop is ROTATED precond-first so the FCG start folds into step
    one: with the initial ``p_pair = 0`` and any throwaway
    ``r_old_pair``/``rz``, beta*0 annihilates exactly (EFT product) and
    p = z — the same pre-loop trick :func:`_st_precond_p` documents, now
    costing zero extra dispatches.

    Exact-parity freezing: a step is live while ``done`` is unset and
    its index is below the runtime scalar ``limit`` (= remaining
    max_iters budget).  ``done`` latches when a step's ||r||^2 meets
    ``tol2 * max(b2, tiny)`` — the convergence threshold is computed
    IN-PROGRAM from the device scalar ``b2`` so the host never blocks
    on a ||b||^2 pull before dispatching (each avoided device->host
    scalar sync is a ~25 ms tunnel round trip).  Frozen steps skip
    their V-cycle + apply via ``lax.cond`` and carry the state through
    unchanged, so the returned iterate is EXACTLY the first one whose
    residual met tol — the same iterate the per-step host loop returned
    (pinned by tests/test_staged.py) — and an oversized or speculative
    chunk costs ~0 device time.

    Returns the advanced state plus the per-step ||r||^2 history
    ``rrs`` (k,) — the host reads one (k,) scalar array per chunk
    instead of one scalar per iteration, and chunks dispatch 1-deep
    speculatively so even that sync hides behind device work.
    """
    return _st_k_steps_core(
        mg_t, freeT32, tabs,
        (x_pair, r_pair, r_old_pair, p_pair, rz, rr, done),
        tol2, b2, limit,
        k=k, apply_mode=apply_mode, n_chunks=n_chunks, interpret=interpret,
    )


def _st_k_steps_core(mg_t, freeT32, tabs, state, tol2, b2, limit, *, k,
                     apply_mode, n_chunks, interpret):
    """Unjitted body of :func:`_st_k_steps` — shared by the single-case
    program and the batched multi-RHS program (:func:`_st_k_steps_many`,
    which lax.maps it over a stacked case axis)."""
    from .ops import df64  # noqa: F401  (df64 arithmetic via _st_* bodies)

    if apply_mode == "xla":
        apply_dot = lambda m, pair: _st_apply_dot_xla(m, tabs, pair)  # noqa: E731
    elif apply_mode == "chunked":
        apply_dot = lambda m, pair: _st_apply_dot_chunked(  # noqa: E731
            m, tabs, pair, n_chunks=n_chunks, interpret=interpret
        )
    else:
        apply_dot = lambda m, pair: _st_apply_dot(  # noqa: E731
            m, tabs, pair, interpret=interpret
        )

    x_pair, r_pair, r_old_pair, p_pair, rz, rr, done = state
    thresh2 = tol2 * jnp.where(b2 > 0, b2, jnp.asarray(1.0, b2.dtype))

    def live_step(carry):
        x, r, r_old, p, rz_c, rr_c, done_c = carry
        p_new, rz_new = _st_precond_p(mg_t, r, r_old, rz_c, p)
        Ap, pAp = apply_dot(freeT32, p_new)
        x_new, r_new, rr_new = _st_update_xr(rz_new, pAp, p_new, Ap, x, r)
        return (
            x_new, r_new, r, p_new, rz_new, rr_new,
            jnp.logical_or(done_c, rr_new <= thresh2),
        )

    def body(carry, i):
        done_c = carry[6]
        live = jnp.logical_and(jnp.logical_not(done_c), i < limit)
        # lax.cond (scalar predicate -> real device control flow): a
        # frozen step SKIPS its V-cycle + dd apply instead of computing
        # and discarding them — a speculative chunk dispatched past
        # convergence then costs ~0 device time, not k full iterations
        # (measured ~0.17 s of waste per solve at 1M DOF without this);
        # in the batched program each CASE freezes independently.
        carry_new = jax.lax.cond(live, live_step, lambda c: c, carry)
        return carry_new, carry_new[5]

    init = (x_pair, r_pair, r_old_pair, p_pair, rz, rr, done)
    carry, rrs = jax.lax.scan(body, init, jnp.arange(k))
    return carry, rrs


@partial(jax.jit, static_argnames=("k", "apply_mode", "n_chunks", "interpret"))
def _st_k_steps_many(mg_t, freeT32, tabs, states, tol2s, b2s, limit, *, k,
                     apply_mode="dd", n_chunks=1, interpret=False):
    """Batched multi-RHS twin of :func:`_st_k_steps` (round-4, VERDICT
    r3 #4): ``states`` is the per-case FCG state pytree STACKED along a
    leading case axis, ``tol2s``/``b2s`` per-case scalars.  Cases run
    under ``lax.map`` — sequential on the device, but inside ONE
    program, so the whole batch advances k iterations per dispatch and
    every per-iteration host sync, dispatch round trip, and program
    load amortizes over the batch.  (The Pallas stencil kernels run
    per-case exactly as in the single-RHS program; per-case
    ``lax.cond`` freezing means converged cases cost ~0 while
    stragglers finish.)"""

    def one(args):
        state, tol2, b2 = args
        return _st_k_steps_core(
            mg_t, freeT32, tabs, state, tol2, b2, limit,
            k=k, apply_mode=apply_mode, n_chunks=n_chunks,
            interpret=interpret,
        )

    return jax.lax.map(one, (states, tol2s, b2s))


@partial(jax.jit, static_argnames=("grid_shape", "tol", "max_iters"))
def _fpcg_t_f64_jit(
    ke,
    free,
    mg_t,
    loads: jax.Array,
    prescribed: Optional[jax.Array],
    *,
    grid_shape: tuple,
    tol: float,
    max_iters: int,
) -> Solution:
    """Transposed-layout fpcg at native f64 (CPU / non-Pallas path)."""
    from .ops.transposed import grid_of_t, stencil_apply_grid_T, t_of_grid
    from .solvers.cg import fpcg

    hi = free.dtype
    Z, Y, X = grid_shape
    as_t = lambda v: t_of_grid(v.astype(hi).reshape(Z, Y, X, 3))  # noqa: E731
    loadsT = as_t(loads)
    freeT32 = t_of_grid(free.astype(jnp.float32).reshape(Z, Y, X, 3))
    ke_hi = ke.astype(hi)

    def raw_apply(xT):
        return stencil_apply_grid_T(ke_hi, xT)

    def applyT(xT):
        F = freeT32.astype(hi)
        Fx = F * xT
        return F * raw_apply(Fx) + (1.0 - F) * xT

    if prescribed is None:  # homogeneous BCs: skip the rhs apply entirely
        xpT = jnp.zeros_like(loadsT)
        bT = freeT32 * loadsT
    else:
        prescT = as_t(prescribed)
        F = freeT32.astype(hi)
        xpT = (1.0 - F) * prescT
        bT = F * (loadsT - raw_apply(xpT)) + xpT

    def M(r):
        return mg_t(r.astype(jnp.float32)).astype(hi)

    uT, stats = fpcg(applyT, bT, xpT, precond=M, tol=tol, max_iters=max_iters)
    u = grid_of_t(uT).reshape(-1, 3)
    reactions = grid_of_t(raw_apply(uT)).reshape(-1, 3)
    return Solution(displacements=u, reactions=reactions, stats=stats)


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
    from .elements import truss as truss_el
    from .solvers.newton import newton_krylov

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
