"""True-residual certification and iterative refinement.

The dd Pallas pipeline's recurrence is self-consistent with its own
(floored) apply and cannot see its cancellation-amplified error near
equilibrium; everything here recomputes residuals with independent
exact(-er) applies — device emulated-f64 first, host IEEE-f64 above the
device's own noise floor — and drives correction passes until the TRUE
residual meets tol (docs/PERF.md "True-residual honesty").
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..solvers.cg import SolveStats
from ._types import Solution

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
    from ..ops import df64
    from ..ops.structured import stencil_apply_grid_scan
    from ..ops.transposed import grid_of_t, t_of_grid

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
    from ..ops.structured import stencil_apply_grid_scan

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
    import sys

    # Late lookup THROUGH THE PACKAGE so monkeypatched
    # fea_tpu.solve._t_true_residual keeps taking effect after the
    # package split.  sys.modules, not `import fea_tpu.solve`: the
    # parent package's `from .solve import solve` rebinds its `solve`
    # attribute from this package to the function.
    _S = sys.modules[__package__]
    _t_certify_pair = _S._t_certify_pair
    _t_true_residual = _S._t_true_residual

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

    from .. import native

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

    from .. import native

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

    from .. import native
    from ..ops.structured import stencil_apply_np

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


