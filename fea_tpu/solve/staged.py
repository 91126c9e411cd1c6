"""The staged k-step flagship pipeline (transposed layout, dd kernels).

The FCG loop runs on the host over compact jitted programs — the k-step
``lax.scan`` program advances k iterations per dispatch with in-program
convergence freezing (round-4 directive #1); certification flows through
the pair protocol (``certify._t_certify_pair``).  See
``solve_operator_fpcg_t_staged`` for the architecture story.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..solvers.cg import SolveStats
from ._types import Solution
from .certify import _DD_RECURRENCE_FLOOR, _refine_true, _warn_dd_tol_floor

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
    from ..ops.transposed import MultigridT, transpose_multigrid

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
    from ..ops.transposed import MultigridT, transpose_multigrid

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

    from ..ops import df64
    from ..ops.pallas_stencil import stencil_tables_dd
    from ..ops.transposed import MultigridT, grid_of_t, t_of_grid, transpose_multigrid

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
    from ..ops.pallas_stencil import dd_kernel_fits_vmem, dd_z_chunks

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


# -- staged-solver device programs (compiled once per shape each) -------------


@jax.jit
def _st_setup_homog(freeT32, loadsT):
    from ..ops import df64

    b_pair = df64.split(freeT32 * loadsT)
    return b_pair, df64.dot(b_pair, b_pair)


@jax.jit
def _st_split_fixed(freeT32, prescT):
    from ..ops import df64

    return df64.split((1.0 - freeT32.astype(prescT.dtype)) * prescT)


@jax.jit
def _st_rhs_inhomog(freeT32, loadsT, Axp_pair, xp_pair):
    from ..ops import df64

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
    from ..ops import df64

    return df64.dot(v_pair, v_pair)


@partial(jax.jit, static_argnames=("interpret",))
def _st_apply_dot(maskT32, ddtabs, p_pair, *, interpret=False):
    """Masked dd stencil apply + <p, Ap>.  With maskT32 = ones this IS the
    raw apply (F A(F x) + (1-F) x with F = 1), so one compiled program
    serves the Krylov loop, the inhomogeneous rhs, and reaction recovery."""
    from ..ops import df64
    from ..ops.pallas_stencil import stencil_apply_transposed_dd

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
    from ..ops import df64
    from ..ops.pallas_stencil import stencil_apply_transposed_dd_chunked

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
    from ..ops import df64
    from ..ops.transposed import stencil_apply_grid_T

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
    from ..ops import df64

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
    from ..ops import df64

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
    from ..ops import df64  # noqa: F401  (df64 arithmetic via _st_* bodies)

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
    from ..ops.transposed import grid_of_t, stencil_apply_grid_T, t_of_grid
    from ..solvers.cg import fpcg

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


