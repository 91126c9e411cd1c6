"""Preconditioned conjugate gradients, matrix-free, jit-compiled.

The iterative solver the reference never built (``# TODO iterative
solver``, /root/reference/fea.py:106).  Design points for TPU:

  * The loop is a ``lax.while_loop`` — one compiled program, no host
    round-trips per iteration (the reference's relaxation loop renders a
    blocking matplotlib figure every iteration, truss.py:105-110).
  * The operator is a closure ``apply(x) -> Ax``; with the EBE operator
    each iteration is gather -> batched element apply -> incidence-plan
    reduce, all fused by XLA.
  * Scalar recurrences (dots, norms) accumulate in ``Policy.accum`` —
    f64 on CPU test runs, tree-reduced f32 (or emulated f64) on TPU —
    which is what makes 1e-8 relative residuals reachable at 10^6 DOF
    (SURVEY.md §7 "Hard parts: Precision").
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..dtypes import Policy, default_policy, precise_dot

__all__ = ["SolveStats", "pcg", "fpcg", "fpcg_dd", "fpcg_dd64", "fpcg_dd64_staged"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SolveStats:
    """Per-solve observability record (SURVEY.md §5.5)."""

    iterations: jax.Array  # () int32
    residual_norm: jax.Array  # () accum dtype, ||b - A x||
    relative_residual: jax.Array  # () accum dtype, ||r|| / ||b||
    converged: jax.Array  # () bool


def pcg(
    apply: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    precond_diag: Optional[jax.Array] = None,
    precond: Optional[Callable[[jax.Array], jax.Array]] = None,
    tol: float = 1e-8,
    max_iters: int = 10_000,
    policy: Optional[Policy] = None,
) -> tuple[jax.Array, SolveStats]:
    """Solve A x = b with preconditioned CG.

    ``apply`` must be SPD on the subspace it acts on (the masked stiffness
    operator is, by construction).  Preconditioning: either
    ``precond_diag`` (the diagonal of A — Jacobi) or ``precond``, an
    arbitrary SPD linear callable z = M^-1 r (e.g. a multigrid V-cycle).
    ``None`` for both means unpreconditioned.

    Returns (x, SolveStats).  Fully jit-compatible: tolerance and
    max_iters are static, everything else traced.
    """
    if policy is None:
        # follow the rhs dtype; accumulate in the widest enabled dtype
        base = default_policy()
        compute = jnp.dtype(b.dtype)
        acc_dt = base.accum if jnp.finfo(base.accum).bits >= jnp.finfo(compute).bits else compute
        policy = Policy(compute=compute, accum=jnp.dtype(acc_dt))
    acc = policy.accum
    b = b.astype(policy.compute)
    x = jnp.zeros_like(b) if x0 is None else x0.astype(policy.compute)

    if precond is not None:
        precondition = precond
    elif precond_diag is not None:
        # guard: a free DOF attached to no element has a zero assembled
        # diagonal — fall back to identity there instead of inf-poisoning
        diag_c = precond_diag.astype(policy.compute)
        inv_diag = jnp.where(diag_c > 0, 1.0 / jnp.where(diag_c > 0, diag_c, 1.0), 1.0)

        def precondition(r):
            return inv_diag * r

    else:

        def precondition(r):
            return r

    b_norm = jnp.sqrt(precise_dot(b, b, acc))
    # Guard all-zero rhs: declare converged at x = x0 with zero residual.
    safe_b_norm = jnp.where(b_norm > 0, b_norm, jnp.asarray(1.0, acc))

    r = b - apply(x)
    z = precondition(r)
    p = z
    rz = precise_dot(r, z, acc)
    rr = precise_dot(r, r, acc)

    # Divergence bail-out: a residual 10^6x above its start (or NaN) can
    # only get worse — exit early with converged=False instead of burning
    # max_iters on garbage (round-1 lesson: fail loudly and cheaply).
    blowup = jnp.asarray(1e12, acc) * jnp.maximum(rr, safe_b_norm * safe_b_norm)

    def cond(state):
        _, _, _, _, rz_k, rr_k, k = state
        unconverged = jnp.sqrt(rr_k) > tol * safe_b_norm
        not_diverged = rr_k < blowup  # False for NaN too
        return jnp.logical_and(jnp.logical_and(unconverged, k < max_iters), not_diverged)

    def body(state):
        x_k, r_k, z_k, p_k, rz_k, _, k = state
        Ap = apply(p_k)
        pAp = precise_dot(p_k, Ap, acc)
        # A is SPD, so pAp > 0 unless p is (numerically) zero; guard the
        # division to keep NaNs out of the while_loop carry.
        alpha = (rz_k / jnp.where(pAp > 0, pAp, jnp.asarray(1.0, acc))).astype(policy.compute)
        x_n = x_k + alpha * p_k
        r_n = r_k - alpha * Ap
        z_n = precondition(r_n)
        rz_n = precise_dot(r_n, z_n, acc)
        rr_n = precise_dot(r_n, r_n, acc)
        beta = (rz_n / jnp.where(rz_k != 0, rz_k, jnp.asarray(1.0, acc))).astype(policy.compute)
        p_n = z_n + beta * p_k
        return (x_n, r_n, z_n, p_n, rz_n, rr_n, k + 1)

    state = (x, r, z, p, rz, rr, jnp.asarray(0, jnp.int32))
    x, r, z, p, rz, rr, k = jax.lax.while_loop(cond, body, state)

    res = jnp.sqrt(rr)
    stats = SolveStats(
        iterations=k,
        residual_norm=res,
        relative_residual=res / safe_b_norm,
        converged=res <= tol * safe_b_norm,
    )
    return x, stats


def fpcg_dd(
    apply_pair: Callable,
    b_pair,
    x0_pair=None,
    *,
    precond32: Callable[[jax.Array], jax.Array],
    tol: float = 1e-8,
    max_iters: int = 10_000,
) -> tuple[tuple[jax.Array, jax.Array], "SolveStats"]:
    """:func:`fpcg` with every Krylov vector as a double-f32 pair.

    Same flexible-CG recurrence, same convergence behavior (pinned by
    test against :func:`fpcg` at f64), but all vector algebra runs in
    ``ops.df64`` pair arithmetic — a few fused f32 passes per op instead
    of TPU-emulated f64 (which cost ~26 ms/iteration at 1M DOF, more
    than the operator apply and V-cycle combined).

    ``apply_pair`` maps an (hi, lo) pair to an (hi, lo) pair — the
    double-f32 Pallas stencil consumes and produces exactly this, so the
    per-iteration f64 split/combine disappears too.  ``precond32`` is
    the f32 V-cycle, applied to the residual's hi part.  Scalars (dots,
    alpha/beta, tolerances) stay f64 — O(1) emulated ops are free.
    Requires x64 for those scalars.

    Practical tolerance floor ~1e-10: the recurrence residual is that of
    the dd-APPROXIMATED operator (the kernel drops the w2*s2 and lo*lo
    terms, ~1e-11 relative apply error), so convergence reported for
    tol below ~1e-10 can be optimistic vs the true f64 residual — the
    host entry points warn in that regime (ADVICE r1).
    """
    from ..ops import df64

    b2 = df64.dot(b_pair, b_pair)
    b_norm = jnp.sqrt(b2)
    safe_b_norm = jnp.where(b_norm > 0, b_norm, jnp.asarray(1.0, b_norm.dtype))
    f64 = b_norm.dtype

    x = df64.from_f32(jnp.zeros_like(b_pair[0])) if x0_pair is None else x0_pair
    Ax = apply_pair(x)
    r = df64.add(b_pair, (-Ax[0], -Ax[1]))
    z = df64.from_f32(precond32(r[0]))
    p = z
    rz = df64.dot(r, z)
    rr = df64.dot(r, r)
    blowup = jnp.asarray(1e12, f64) * jnp.maximum(rr, safe_b_norm * safe_b_norm)

    def cond(state):
        _, _, _, rz_k, rr_k, k = state
        unconverged = jnp.sqrt(rr_k) > tol * safe_b_norm
        not_diverged = rr_k < blowup  # False for NaN too
        return jnp.logical_and(jnp.logical_and(unconverged, k < max_iters), not_diverged)

    def body(state):
        x_k, r_k, p_k, rz_k, _, k = state
        Ap = apply_pair(p_k)
        pAp = df64.dot(p_k, Ap)
        alpha = rz_k / jnp.where(pAp > 0, pAp, jnp.asarray(1.0, f64))
        x_n = df64.axpy(alpha, p_k, x_k)
        r_n = df64.axpy(-alpha, Ap, r_k)
        z_n = df64.from_f32(precond32(r_n[0]))
        rz_n = df64.dot(r_n, z_n)
        rr_n = df64.dot(r_n, r_n)
        # Polak-Ribiere / flexible beta
        rz_diff = rz_n - df64.dot(r_k, z_n)
        beta = rz_diff / jnp.where(rz_k != 0, rz_k, jnp.asarray(1.0, f64))
        p_n = df64.axpy(beta, p_k, z_n)
        return (x_n, r_n, p_n, rz_n, rr_n, k + 1)

    state = (x, r, p, rz, rr, jnp.asarray(0, jnp.int32))
    x, r, p, rz, rr, k = jax.lax.while_loop(cond, body, state)

    res = jnp.sqrt(rr)
    stats = SolveStats(
        iterations=k,
        residual_norm=res,
        relative_residual=res / safe_b_norm,
        converged=res <= tol * safe_b_norm,
    )
    return x, stats


def fpcg_dd64(
    apply64: Callable[[jax.Array], jax.Array],
    b64: jax.Array,
    x0_64: Optional[jax.Array] = None,
    *,
    precond32: Callable[[jax.Array], jax.Array],
    tol: float = 1e-8,
    max_iters: int = 10_000,
) -> tuple[jax.Array, "SolveStats"]:
    """Hybrid pair-space flexible CG for an operator that applies in f64.

    Krylov ALGEBRA (r/p/z updates, dots) runs in double-f32 pair
    arithmetic like :func:`fpcg_dd` — dodging TPU-emulated f64 vector
    passes (measured 26.6 ms/iter all-f64 vs ~7 ms at tube scale) — but
    the ITERATE x accumulates in true f64.  Why x must be f64: a pair
    carries ~48 mantissa bits, so a pair-represented solution floors the
    TRUE residual at ~kappa * 2^-48 of ||b|| (measured 3.5e-8 on a thin
    tube whose recurrence claimed 1e-11).  With f64 x the update reuses
    the combined p64 the apply already needs, the r-recurrence's pair
    roundings scale with the CURRENT residual (not kappa * |x|), and
    the recurrence tracks the true f64 residual like :func:`fpcg`
    (pinned by test against the all-f64 path's true residual).
    Per-iteration f64 cost: the apply itself + one combine + one axpy.
    """
    from ..ops import df64

    f64 = b64.dtype
    b_pair = df64.split(b64)
    b2 = df64.dot(b_pair, b_pair)
    b_norm = jnp.sqrt(b2)
    safe_b_norm = jnp.where(b_norm > 0, b_norm, jnp.asarray(1.0, b_norm.dtype))

    x = jnp.zeros_like(b64) if x0_64 is None else x0_64.astype(f64)
    r = df64.split(b64 - apply64(x))
    z = df64.from_f32(precond32(r[0]))
    p = z
    rz = df64.dot(r, z)
    rr = df64.dot(r, r)
    blowup = jnp.asarray(1e12, f64) * jnp.maximum(rr, safe_b_norm * safe_b_norm)

    def cond(state):
        _, _, _, rz_k, rr_k, k = state
        unconverged = jnp.sqrt(rr_k) > tol * safe_b_norm
        not_diverged = rr_k < blowup  # False for NaN too
        return jnp.logical_and(jnp.logical_and(unconverged, k < max_iters), not_diverged)

    def body(state):
        x_k, r_k, p_k, rz_k, _, k = state
        p64 = df64.combine(p_k, f64)
        Ap64 = apply64(p64)
        Ap = df64.split(Ap64)
        pAp = df64.dot(p_k, Ap)
        alpha = rz_k / jnp.where(pAp > 0, pAp, jnp.asarray(1.0, f64))
        x_n = x_k + alpha * p64  # true f64 iterate
        r_n = df64.axpy(-alpha, Ap, r_k)
        z_n = df64.from_f32(precond32(r_n[0]))
        rz_n = df64.dot(r_n, z_n)
        rr_n = df64.dot(r_n, r_n)
        rz_diff = rz_n - df64.dot(r_k, z_n)
        beta = rz_diff / jnp.where(rz_k != 0, rz_k, jnp.asarray(1.0, f64))
        p_n = df64.axpy(beta, p_k, z_n)
        return (x_n, r_n, p_n, rz_n, rr_n, k + 1)

    state = (x, r, p, rz, rr, jnp.asarray(0, jnp.int32))
    x, r, p, rz, rr, k = jax.lax.while_loop(cond, body, state)

    res = jnp.sqrt(rr)
    stats = SolveStats(
        iterations=k,
        residual_norm=res,
        relative_residual=res / safe_b_norm,
        converged=res <= tol * safe_b_norm,
    )
    return x, stats


def fpcg(
    apply: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    precond: Callable[[jax.Array], jax.Array],
    tol: float = 1e-8,
    max_iters: int = 10_000,
) -> tuple[jax.Array, SolveStats]:
    """Flexible preconditioned CG: f64 Krylov recurrence, low-precision M.

    The scaling architecture for 10^6-DOF elasticity (round-2 lesson):
    classical mixed-precision refinement (f32 inner solve + f64 outer
    correction) converges per outer step by a factor ~kappa(A)*eps_f32,
    which at 1M DOF (kappa ~ 1e7) is ~1 — it STALLS around 1e-5 true
    residual no matter how well the f32 inner recurrence claims to have
    converged (measured: inner recurrence 1e-5 while the step reduced the
    true residual only 0.18x).  Here the Krylov iteration itself runs in
    the dtype of ``b`` (f64 — so its recurrence residual tracks the true
    residual to ~1e-14) and ONLY the preconditioner application drops to
    low precision: M is the f32 multigrid V-cycle, which does all the
    bandwidth-heavy work.  Per iteration: one hi-precision operator apply
    + one f32 V-cycle.

    An f32-evaluated M is effectively a *variable* preconditioner, so the
    update uses the Polak-Ribiere (flexible) beta
    ``<r_new - r_old, z_new> / <r_old, z_old>`` instead of the Fletcher-
    Reeves form — the standard FCG safeguard, one extra vector kept.

    ``apply`` and ``b`` set the working dtype; ``precond`` may compute
    internally at any precision but must accept/return the working shape.
    """
    dtype = jnp.dtype(b.dtype)
    x = jnp.zeros_like(b) if x0 is None else x0.astype(dtype)

    b_norm = jnp.sqrt(precise_dot(b, b, dtype))
    safe_b_norm = jnp.where(b_norm > 0, b_norm, jnp.asarray(1.0, dtype))

    r = b - apply(x)
    z = precond(r).astype(dtype)
    p = z
    rz = precise_dot(r, z, dtype)
    rr = precise_dot(r, r, dtype)
    blowup = jnp.asarray(1e12, dtype) * jnp.maximum(rr, safe_b_norm * safe_b_norm)

    def cond(state):
        _, _, _, _, rz_k, rr_k, k = state
        unconverged = jnp.sqrt(rr_k) > tol * safe_b_norm
        not_diverged = rr_k < blowup  # False for NaN too
        return jnp.logical_and(jnp.logical_and(unconverged, k < max_iters), not_diverged)

    def body(state):
        x_k, r_k, z_k, p_k, rz_k, _, k = state
        Ap = apply(p_k)
        pAp = precise_dot(p_k, Ap, dtype)
        alpha = rz_k / jnp.where(pAp > 0, pAp, jnp.asarray(1.0, dtype))
        x_n = x_k + alpha * p_k
        r_n = r_k - alpha * Ap
        z_n = precond(r_n).astype(dtype)
        rz_n = precise_dot(r_n, z_n, dtype)
        rr_n = precise_dot(r_n, r_n, dtype)
        # Polak-Ribiere / flexible beta
        rz_diff = rz_n - precise_dot(r_k, z_n, dtype)
        beta = rz_diff / jnp.where(rz_k != 0, rz_k, jnp.asarray(1.0, dtype))
        p_n = z_n + beta * p_k
        return (x_n, r_n, z_n, p_n, rz_n, rr_n, k + 1)

    state = (x, r, z, p, rz, rr, jnp.asarray(0, jnp.int32))
    x, r, z, p, rz, rr, k = jax.lax.while_loop(cond, body, state)

    res = jnp.sqrt(rr)
    stats = SolveStats(
        iterations=k,
        residual_norm=res,
        relative_residual=res / safe_b_norm,
        converged=res <= tol * safe_b_norm,
    )
    return x, stats


# bounded FIFO: treedefs embed per-mesh statics (n_aggs, matfree_chunk),
# so an unbounded cache would grow one executable pair per mesh forever
# in a long-lived many-mesh process
_DD64_PROGRAMS: dict = {}
_DD64_PROGRAMS_MAX = 8


def _dd64_programs(treedef, apply_name: str, pair_apply: bool = False):
    """Per-(treedef, apply) jitted init/step programs for the staged dd64
    FCG, taking the operator/preconditioner as a FLAT TUPLE of array
    leaves.

    Why flat leaves (hard-won, 2026-08-19): passing the registered-
    dataclass pytrees (StiffnessOperator, TwoLevelChebPrecond) directly
    as jit arguments trips a jax-0.9 dispatch bug — the FIRST call
    compiles and runs, every subsequent call's C++ fast path flattens
    one buffer fewer than the executable expects ("Execution supplied 28
    buffers but compiled program expected 29"; the AOT path shows the
    mismatch as a hoisted const_arg).  No aval, sharding, weak-type, or
    buffer-aliasing difference exists between the calls (all checked),
    and de-duplicating/copying buffers does not help; flattening to a
    plain tuple outside jit sidesteps it completely (60-step soak
    clean).  Also load-bearing: leaves-as-arguments keep the operator
    geometry out of the HLO (a closure would bake hundreds of MB into
    the remote-compile payload at scale).
    """
    key = (treedef, apply_name, pair_apply)
    progs = _DD64_PROGRAMS.get(key)
    if progs is not None:
        return progs
    from ..ops import df64

    def unflatten(leaves):
        return jax.tree_util.tree_unflatten(treedef, leaves)

    @jax.jit
    def init(leaves, b64, x0):
        op, tl = unflatten(leaves)
        apply_fn = getattr(op, apply_name)
        b_pair = df64.split(b64)
        b2 = df64.dot(b_pair, b_pair)
        x = x0.astype(b64.dtype)
        if pair_apply:
            # operator consumes/produces f32 pairs (ops/ddq.py) — same
            # ~2^-48 accuracy class as TPU's emulated f64, none of the
            # emulation's materialized intermediates
            Ax = apply_fn(df64.split(x))
            r = df64.add(b_pair, df64.neg(Ax))
        else:
            r = df64.split(b64 - apply_fn(x))
        z = df64.from_f32(tl(r[0]))
        p = z
        rz = df64.dot(r, z)
        rr = df64.dot(r, r)
        return x, r, p, rz, rr, b2

    @jax.jit
    def step(leaves, state):
        op, tl = unflatten(leaves)
        apply_fn = getattr(op, apply_name)
        x_k, r_k, p_k, rz_k, _, b2 = state
        f64 = x_k.dtype
        p64 = df64.combine(p_k, f64)
        if pair_apply:
            Ap = apply_fn(p_k)
        else:
            Ap = df64.split(apply_fn(p64))
        pAp = df64.dot(p_k, Ap)
        alpha = rz_k / jnp.where(pAp > 0, pAp, jnp.asarray(1.0, f64))
        x_n = x_k + alpha * p64  # true f64 iterate
        r_n = df64.axpy(-alpha, Ap, r_k)
        z_n = df64.from_f32(tl(r_n[0]))
        rz_n = df64.dot(r_n, z_n)
        rr_n = df64.dot(r_n, r_n)
        rz_diff = rz_n - df64.dot(r_k, z_n)
        beta = rz_diff / jnp.where(rz_k != 0, rz_k, jnp.asarray(1.0, f64))
        p_n = df64.axpy(beta, p_k, z_n)
        return x_n, r_n, p_n, rz_n, rr_n, b2

    if len(_DD64_PROGRAMS) >= _DD64_PROGRAMS_MAX:
        _DD64_PROGRAMS.pop(next(iter(_DD64_PROGRAMS)))
    _DD64_PROGRAMS[key] = (init, step)
    return init, step


def _dd64_kstep_program(treedef, apply_name: str, pair_apply: bool, k: int):
    """k-iteration lax.scan twin of :func:`_dd64_programs`'s ``step``
    (round-4: the flagship's k-step dispatch treatment, generalized to
    the leaf-passing dd64 staged solver).  Same per-iteration
    arithmetic; a step is live while ``done`` is unset and its index is
    under the runtime ``limit``, ``done`` latches on the in-program
    threshold ``tol2 * max(b2, tiny)``, and frozen steps skip their
    apply + V-cycle through ``lax.cond`` — so oversized or speculative
    chunks cost ~0 device time and the returned iterate is exactly the
    per-step loop's (pinned by test)."""
    key = (treedef, apply_name, pair_apply, k)
    progs = _DD64_PROGRAMS.get(key)
    if progs is not None:
        return progs
    from ..ops import df64

    def unflatten(leaves):
        return jax.tree_util.tree_unflatten(treedef, leaves)

    @jax.jit
    def ksteps(leaves, state, tol2, limit):
        op, tl = unflatten(leaves)
        apply_fn = getattr(op, apply_name)
        x, r, p, rz, rr, b2 = state
        f64 = x.dtype
        thresh2 = tol2 * jnp.where(b2 > 0, b2, jnp.asarray(1.0, b2.dtype))

        def live_step(carry):
            x_k, r_k, p_k, rz_k, rr_k, done = carry
            p64 = df64.combine(p_k, f64)
            if pair_apply:
                Ap = apply_fn(p_k)
            else:
                Ap = df64.split(apply_fn(p64))
            pAp = df64.dot(p_k, Ap)
            alpha = rz_k / jnp.where(pAp > 0, pAp, jnp.asarray(1.0, f64))
            x_n = x_k + alpha * p64  # true f64 iterate
            r_n = df64.axpy(-alpha, Ap, r_k)
            z_n = df64.from_f32(tl(r_n[0]))
            rz_n = df64.dot(r_n, z_n)
            rr_n = df64.dot(r_n, r_n)
            rz_diff = rz_n - df64.dot(r_k, z_n)
            beta = rz_diff / jnp.where(rz_k != 0, rz_k, jnp.asarray(1.0, f64))
            p_n = df64.axpy(beta, p_k, z_n)
            return (
                x_n, r_n, p_n, rz_n, rr_n,
                jnp.logical_or(done, rr_n <= thresh2),
            )

        def body(carry, i):
            done = carry[5]
            liveq = jnp.logical_and(jnp.logical_not(done), i < limit)
            carry_new = jax.lax.cond(liveq, live_step, lambda c: c, carry)
            return carry_new, carry_new[4]

        init_c = (x, r, p, rz, rr, jnp.asarray(False))
        carry, rrs = jax.lax.scan(body, init_c, jnp.arange(k))
        x, r, p, rz, rr, _ = carry
        return (x, r, p, rz, rr, b2), rrs

    if len(_DD64_PROGRAMS) >= _DD64_PROGRAMS_MAX:
        _DD64_PROGRAMS.pop(next(iter(_DD64_PROGRAMS)))
    _DD64_PROGRAMS[key] = ksteps
    return ksteps


def fpcg_dd64_staged(
    op,
    b64: jax.Array,
    x0_64: Optional[jax.Array] = None,
    *,
    precond,
    tol: float = 1e-8,
    max_iters: int = 10_000,
    apply_name: str = "apply",
    pair_apply: bool = False,
    progress=None,
) -> tuple[jax.Array, SolveStats]:
    """:func:`fpcg_dd64` with the FCG loop on the HOST: one compact
    jitted step per iteration, one scalar sync for the convergence
    check.  Same recurrence (identical iteration count; last-ulp
    FMA-contraction differences between the two XLA fusions — pinned by
    test).

    Why it exists (axon-tunnel lessons): (1) a single while_loop
    dispatch that runs minutes of device time can kill the TPU worker
    ("UNAVAILABLE: TPU device error" — observed twice at a 795k-DOF
    unstructured solve whose one-jit execution was ~90 s, while the same
    solve at 182k/16 s ran fine); short per-iteration dispatches
    sidestep whatever watchdog that is and give heartbeat.  (2) the
    operator/preconditioner ride as flat leaf arguments, so the geometry
    is NOT baked into the HLO (see :func:`_dd64_programs`, which also
    documents the dispatch bug this structure avoids).

    ``op``: a pytree whose ``apply_name`` method is the f64 masked
    operator — or, with ``pair_apply=True``, one that consumes/produces
    f32 ``(hi, lo)`` pairs directly (ops/ddq.PairOperator: same ~2^-48
    accuracy class as TPU-emulated f64 at a fraction of the cost; pair
    the solve with an exact-apply certification, see
    solve.py::_certify_unstructured).  ``precond``: an f32 SPD
    preconditioner pytree-callable (e.g. TwoLevelChebPrecond).
    ``progress``: optional callable(str).
    """
    import os

    import numpy as np

    leaves, treedef = jax.tree_util.tree_flatten((op, precond))
    leaves = tuple(leaves)
    init, _ = _dd64_programs(treedef, apply_name, pair_apply)
    state = init(
        leaves, b64, jnp.zeros_like(b64) if x0_64 is None else x0_64
    )
    # Round-4 sync discipline (the flagship lesson applied here): k
    # iterations per dispatch through the kstep scan program, the
    # convergence threshold computed IN-PROGRAM from the device b2, the
    # first chunk dispatched BEFORE the ||b||/||r0|| host pulls (they
    # overlap its execution), the first chunk drained immediately, and
    # later chunks dispatched 1-deep speculatively.  Was: one program
    # dispatch + one blocking scalar sync per iteration — ~25-50 ms of
    # tunnel round trip against ~5-50 ms of device work.
    k_fuse = max(1, int(os.environ.get("FEA_TPU_DD64_K", "16")))
    ksteps = _dd64_kstep_program(treedef, apply_name, pair_apply, k_fuse)
    tol2_dev = jnp.asarray(tol * tol, jnp.float64)

    pending = None  # (rrs, live_n, state after)
    launched = 0
    state1 = rrs1 = None
    if max_iters > 0:
        live1 = min(k_fuse, max_iters)
        state1, rrs1 = ksteps(
            leaves, state, tol2_dev, jnp.asarray(live1, jnp.int32)
        )
    b_norm = float(jnp.sqrt(state[5]))  # overlaps chunk 1 on device
    safe_b_norm = b_norm if b_norm > 0 else 1.0
    rr = float(state[4])
    blowup = 1e12 * max(rr, safe_b_norm * safe_b_norm)

    it = 0
    converged = np.sqrt(rr) <= tol * safe_b_norm
    blown = not (rr < blowup and np.isfinite(rr))
    if not converged and not blown and max_iters > 0:
        launched = live1
        pending = (rrs1, live1, state1)

    def _drain(p):
        nonlocal it, rr, converged, blown, state
        rrs_np, live_n, st = p
        rrs_host = np.asarray(rrs_np)
        for i in range(live_n):
            rr = float(rrs_host[i])
            it += 1
            if np.sqrt(rr) <= tol * safe_b_norm:
                converged = True
                break
            if not (rr < blowup and np.isfinite(rr)):
                blown = True
                break
        state = st
        if progress is not None and not (converged or blown) and (
            it % (2 * k_fuse) < k_fuse
        ):
            progress(f"iter {it}: rel_res {np.sqrt(rr) / safe_b_norm:.3e}")

    if pending is not None:
        _drain(pending)
        pending = None
    while not converged and not blown and launched < max_iters:
        live_n = min(k_fuse, max_iters - launched)
        new_state, rrs = ksteps(
            leaves, state, tol2_dev, jnp.asarray(live_n, jnp.int32)
        )
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
    k = it
    x = state[0]
    res = np.sqrt(rr)
    stats = SolveStats(
        iterations=jnp.asarray(k, jnp.int32),
        residual_norm=jnp.asarray(res, b64.dtype),
        relative_residual=jnp.asarray(res / safe_b_norm, b64.dtype),
        converged=jnp.asarray(res <= tol * safe_b_norm, bool),
    )
    return x, stats
