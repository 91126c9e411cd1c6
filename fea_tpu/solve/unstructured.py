"""The arbitrary-topology production solves.

Two routes, both running the flagship architecture (pair-space
double-f32 FCG + independent certification):

* **AMG/BCSR (round-5 default, VERDICT r4 #3)** — assembled node-major
  block-CSR apply (gather + einsum, no scatter) with the multilevel
  smoothed-aggregation V-cycle (ops/amg.py) and HOST exact-IEEE-f64
  certification through the same assembled weights.
* **ddq + two-level (fallback)** — quadrature-level pair apply
  (ops/ddq) with the Chebyshev-smoothed two-level RBM preconditioner
  (ops/twolevel) and device exact-f64 certification.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

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

    from ..solvers.cg import SolveStats, fpcg_dd64_staged

    if pair_op is None:
        from ..ops.ddq import build_pair_operator

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




# -- AMG/BCSR route (round-5, VERDICT r4 #3) ----------------------------------


def build_amg_setup(scene, *, check_jacobians: bool = True,
                    degree: int = 2, nodes_per_aggregate: int = 32,
                    progress=None):
    """One-time setup for the AMG route: host BCSR assembly (exact IEEE
    f64 — doubles as the certification oracle), the device pair
    operator, and the multilevel SA hierarchy.  Returns
    ``(host, pair_op, amg)``."""
    import numpy as np

    from ..ops.amg import assemble_bcsr, build_amg, split_bcsr_pair

    nodes = np.asarray(scene.nodes, np.float64)
    host = assemble_bcsr(
        nodes, np.asarray(scene.elements), scene.material,
        np.asarray(scene.fixed),
    )
    if check_jacobians and host.min_detj <= 0.0:
        raise ValueError(
            f"Non-positive Jacobian determinant (min detJ = "
            f"{host.min_detj:g}); check element shapes / node ordering."
        )
    amg = build_amg(
        nodes, host, degree=degree,
        nodes_per_aggregate=nodes_per_aggregate, progress=progress,
    )
    pair = split_bcsr_pair(host)
    return host, pair, amg


def _solve_unstructured_amg(scene, setup, *, tol, max_iters,
                            progress=None, max_host_passes: int = 3):
    """AMG production solve: pair-space BCSR FCG + HOST exact-IEEE-f64
    certification (+ corrections) through the same assembled weights.

    Returns a Solution whose stats carry the host-certified residual and
    whose reactions are the final host raw apply (host ndarray — the
    documented Solution.reactions contract)."""
    import numpy as np

    from ..ops.amg import bcsr_apply_np
    from ..solvers.cg import SolveStats, fpcg_dd64_staged
    from ._types import Solution

    host, pair, amg = setup
    say = progress if progress is not None else (lambda s: None)
    F = host.free  # (N, 3) f64 0/1 host
    loads = np.asarray(scene.loads, np.float64)
    presc = (
        np.zeros_like(loads) if scene.prescribed is None
        else np.asarray(scene.prescribed, np.float64)
    )
    xp = (1.0 - F) * presc
    # rhs on the host in exact f64: F (loads - K_raw xp) + xp
    if np.any(xp != 0.0):
        Kxp = bcsr_apply_np(host, xp, masked=False)
        b_np = F * (loads - Kxp) + xp
    else:
        b_np = F * loads
    b64 = jnp.asarray(b_np)
    x0 = jnp.asarray(xp)
    b_norm = float(np.linalg.norm(b_np))
    safe_b = b_norm if b_norm > 0 else 1.0

    u, stats = fpcg_dd64_staged(
        pair, b64, x0, precond=amg, tol=0.3 * tol, max_iters=max_iters,
        pair_apply=True, progress=progress,
    )
    total_iters = int(stats.iterations)

    rel_h = float("nan")
    Au = None
    for hp in range(max_host_passes + 1):
        u_np = np.asarray(u, np.float64)
        u_np = np.where(F > 0, u_np, presc)  # exact prescribed rows
        Au = bcsr_apply_np(host, u_np, masked=False)
        # physical residual at free DOFs: F (loads - K_raw u).  With u's
        # fixed rows at xp this equals b - A_masked u on free rows (the
        # K xp term is inside b); do NOT also subtract K xp here.
        r_np = F * (loads - Au)
        rn = float(np.linalg.norm(r_np))
        rel_h = rn / safe_b
        if rel_h <= tol or hp == max_host_passes or not np.isfinite(rel_h):
            break
        say(f"amg host-certify pass {hp}: true rel_res {rel_h:.3e}, correcting")
        corr_tol = float(np.clip(0.3 * tol / rel_h, 1e-12, 0.1))
        du, dstats = fpcg_dd64_staged(
            pair, jnp.asarray(r_np), jnp.zeros_like(b64),
            precond=amg, tol=corr_tol, max_iters=max_iters,
            pair_apply=True,
        )
        u = u + du
        total_iters += int(dstats.iterations)
    u_final = jnp.where(jnp.asarray(F) > 0, jnp.asarray(u, jnp.float64),
                        jnp.asarray(presc))
    stats = SolveStats(
        iterations=jnp.asarray(total_iters, jnp.int32),
        residual_norm=jnp.asarray(rel_h * safe_b, jnp.float64),
        relative_residual=jnp.asarray(rel_h, jnp.float64),
        converged=jnp.asarray(bool(rel_h <= tol), bool),
    )
    # reactions = the final certification pass's raw apply, exact IEEE
    # f64 on the host (Solution.reactions host-array contract)
    return Solution(displacements=u_final, reactions=Au, stats=stats)
