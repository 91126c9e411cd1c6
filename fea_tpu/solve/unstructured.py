"""The arbitrary-topology production solve: pair-space gather/scatter
fine apply (ops/ddq) + exact-f64 certification passes."""
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


