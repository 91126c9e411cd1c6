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

__all__ = ["Solution", "solve", "solve_operator", "solve_displacements"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Solution:
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
) -> Solution:
    """Jit-pure solve given a prebuilt operator.  vmap-able over loads,
    prescribed values, and material-dependent operator leaves."""
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
        diag = op.diag_masked() if precondition else None
        u, stats = pcg(
            op.apply, b, x0, precond_diag=diag, tol=tol, max_iters=max_iters, policy=policy
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
) -> Solution:
    """Solve a linear static scene end-to-end.

    method 'auto' picks dense for small systems (< 2000 DOF, where the
    O(n^3) factorization beats CG's latency) and matrix-free PCG above;
    large regular voxel-box hex8 scenes (>= 50k DOF, detected from the
    node grid + connectivity, x64 on) automatically take the flagship
    structured-stencil multigrid fpcg path (~12 iterations regardless of
    mesh size).
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

    if method == "auto":
        # Large voxel-box hex8 scenes (detected, not declared) take the
        # flagship path automatically: structured stencil operator + f64
        # flexible-PCG with the f32 multigrid V-cycle preconditioner.
        # Requires x64 for the f64 outer recurrence.
        from .dtypes import x64_enabled

        if operator is None and scene.n_dof >= 50_000 and x64_enabled():
            from .ops.structured import build_structured_operator, infer_box_dims

            dims = infer_box_dims(scene)
            if dims is not None:
                import numpy as np

                from .ops.multigrid import build_multigrid

                op_hi = build_structured_operator(scene, dims, dtype=jnp.float64)
                free_np = 1.0 - np.asarray(scene.fixed, np.float64)
                if jax.default_backend() == "tpu":
                    # transposed-layout pipeline: fused Pallas stencil in
                    # the V-cycle + double-f32 f64-accurate apply
                    from .ops.transposed import build_multigrid_t

                    mg_t = build_multigrid_t(
                        op_hi.astype(jnp.float32), dtype=jnp.float32,
                        use_pallas=True, free_np=free_np,
                    )
                    presc = (
                        None if scene.prescribed is None
                        else scene.prescribed.astype(jnp.float64)
                    )
                    sol = solve_operator_fpcg_t(
                        op_hi,
                        scene.loads.astype(jnp.float64),
                        presc,
                        mg_t,
                        tol=tol,
                        max_iters=max_iters if max_iters is not None else 300,
                    )
                    return check(sol, "fpcg-multigrid-transposed")
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

    sol = solve_operator(
        op,
        scene.loads.astype(dtype),
        scene.prescribed_or_zero(dtype),
        method=method,
        tol=tol,
        max_iters=max_iters,
    )
    return check(sol, method)


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
) -> Solution:
    """The fpcg solve in the transposed (component-major) layout.

    Same algorithm and convergence behavior as :func:`solve_operator_fpcg`
    (equivalence pinned by test); the entire pipeline — masked operator,
    V-cycle, Krylov vectors — lives in ``(3, Y, X, Z)`` so the fused
    Pallas stencil kernels replace the XLA pad-add (f32 V-cycle applies)
    and the emulated-f64 apply (double-f32 kernel, 4.1 ms vs 17 ms); data
    converts in/out exactly once per solve (docs/PERF.md levers 1-2).

    ``op_hi`` must be a f64 StructuredOperator; ``mg`` the matching
    ``MultigridPreconditioner`` from ``build_multigrid``.  ``use_pallas``
    defaults to True exactly on the TPU backend (the kernels need real
    Mosaic; CPU uses the XLA transposed twin, which there is native f64).
    """
    import numpy as np

    from .ops.pallas_stencil import stencil_tables_dd
    from .ops.transposed import MultigridT, transpose_multigrid

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if isinstance(mg, MultigridT):
        mg_t = mg  # prebuilt in layout (build_multigrid_t) — no conversion
    else:
        mg_t = transpose_multigrid(
            mg, use_pallas=use_pallas, pallas_min_dof=pallas_min_dof, interpret=interpret
        )
    if use_pallas:
        # dd weight tables built ONCE on the host: deriving them
        # in-trace re-runs ~500 tiny emulated-f64 ops per apply inside
        # the FCG loop.  Separate jit entry per configuration: one
        # entry serving both (with unused args pruned differently per
        # static config) corrupts the pjit fast-path cache — repeat
        # calls then die with "supplied 8 buffers but compiled program
        # expected 9".
        ddtabs = stencil_tables_dd(np.asarray(op_hi.ke, np.float64))
        return _fpcg_t_dd_jit(
            op_hi.free, mg_t, ddtabs, loads, prescribed,
            grid_shape=op_hi.grid_shape, tol=tol, max_iters=max_iters,
            interpret=interpret,
        )
    return _fpcg_t_f64_jit(
        op_hi.ke, op_hi.free, mg_t, loads, prescribed,
        grid_shape=op_hi.grid_shape, tol=tol, max_iters=max_iters,
    )


@partial(jax.jit, static_argnames=("grid_shape", "tol", "max_iters", "interpret"))
def _fpcg_t_dd_jit(
    free,
    mg_t,
    ddtabs,
    loads: jax.Array,
    prescribed: Optional[jax.Array],
    *,
    grid_shape: tuple,
    tol: float,
    max_iters: int,
    interpret: bool,
) -> Solution:
    """Flagship TPU solve: the whole Krylov loop runs in double-f32 pair
    space — the dd Pallas kernel consumes/produces (hi, lo) pairs
    natively, and pair vector algebra (ops/df64.py) replaces
    TPU-emulated f64, so no full-size f64 array is touched between the
    layout conversions at entry and exit."""
    from .ops import df64
    from .ops.pallas_stencil import stencil_apply_transposed_dd
    from .ops.transposed import grid_of_t, t_of_grid
    from .solvers.cg import fpcg_dd

    hi = free.dtype
    Z, Y, X = grid_shape
    as_t = lambda v: t_of_grid(v.astype(hi).reshape(Z, Y, X, 3))  # noqa: E731
    loadsT = as_t(loads)
    # the mask transposes at f32 (half the permute traffic; 0/1 is exact)
    freeT32 = t_of_grid(free.astype(jnp.float32).reshape(Z, Y, X, 3))
    G32 = 1.0 - freeT32

    def raw_apply_pair(v):
        return stencil_apply_transposed_dd(
            None, None, None, None, v[0], v[1], tables=ddtabs, interpret=interpret
        )

    def apply_pair(v):
        # masked operator in pair space: F ∈ {0,1} so every mask
        # product is exact on the split representation
        fh, fl = raw_apply_pair((freeT32 * v[0], freeT32 * v[1]))
        return (freeT32 * fh + G32 * v[0], freeT32 * fl + G32 * v[1])

    b_pair = df64.split(freeT32 * loadsT)
    if prescribed is None:
        xp_pair = None
    else:
        prescT = as_t(prescribed)
        xp_pair = df64.split((1.0 - freeT32.astype(hi)) * prescT)
        Axp = raw_apply_pair(xp_pair)
        loads_pair = df64.split(loadsT)
        rhs = df64.add(loads_pair, (-Axp[0], -Axp[1]))
        b_pair = (
            freeT32 * rhs[0] + G32 * xp_pair[0],
            freeT32 * rhs[1] + G32 * xp_pair[1],
        )

    u_pair, stats = fpcg_dd(
        apply_pair, b_pair, xp_pair, precond32=mg_t, tol=tol, max_iters=max_iters
    )
    u = grid_of_t(df64.combine(u_pair, hi)).reshape(-1, 3)
    reactions = grid_of_t(df64.combine(raw_apply_pair(u_pair), hi)).reshape(-1, 3)
    return Solution(displacements=u, reactions=reactions, stats=stats)


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
