"""Benchmark harness: assemble-and-solve a ~1M-DOF hex8 voxel cantilever
with matrix-free multigrid-FCG on one chip, and report end-to-end DOF/s
against the reference baseline.

Baseline (BASELINE.md): the reference's dense path assembles+solves its
3,750-DOF cubebeam in 17.2 s on the container CPU -> 218 DOF/s.  The
metric here is the same end-to-end quantity (element integration +
boundary conditions + multigrid hierarchy construction + solve to the
target residual) at this harness's mesh size, after one warmup run so
compile time is excluded (the reference has no compile stage; its 17.2 s
is also steady-state).

Cold-start design (VERDICT.md round-2 #1 + round-3 #1): the production
pipeline is the STAGED k-step solver — the FCG loop runs k iterations
per dispatch through one compact lax.scan program (solve.py::
_st_k_steps), so there is no separate "fused" program to upgrade to:
the round-3 fused one-jit pipeline (26 MB executable, the warm-restart
floor) is retired.  The embedded numerics check reuses the
already-compiled dd-apply program against a host f64 NumPy oracle, so
it adds no compile time.  Heartbeat lines go to stderr throughout;
``--budget-s`` degrades (fewer repeats) rather than dies.

The harness FAILS LOUDLY (nonzero exit, "converged": false in the JSON,
no DOF/s headline) when the solve does not reach the target residual or
the tip deflection leaves the trilinear-hex band around beam theory.

Prints exactly ONE JSON line on stdout:
  {"metric": "assemble_solve_dof_per_s", "value": ..., "unit": "DOF/s",
   "vs_baseline": ..., "converged": ..., ...detail fields...}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_DOF_PER_S = 218.0  # BASELINE.md end-to-end reference measurement
TIP_BAND = (0.70, 1.30)  # acceptable FEM/beam-theory tip-deflection ratio

_T0 = time.perf_counter()


def hb(msg: str) -> None:
    """Heartbeat to stderr — the driver sees liveness even mid-compile."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def fail(result: dict, reason: str) -> None:
    result.update({"converged": False, "value": 0.0, "error": reason})
    print(json.dumps(result))
    sys.exit(1)


def main() -> None:
    p = argparse.ArgumentParser()
    # default: cubic elements (multigrid-friendly), ~1.05M DOF
    p.add_argument("--nx", type=int, default=32)
    p.add_argument("--ny", type=int, default=32)
    p.add_argument("--nz", type=int, default=320)
    p.add_argument("--tol", type=float, default=1e-8)
    p.add_argument(
        "--solver",
        choices=["auto", "staged", "fpcg", "refined", "refined-host"],
        default="auto",
        help="auto (default) = staged: the production k-step host-loop "
        "FCG (k iterations per dispatch, solve.py::_st_k_steps; the "
        "round-3 fused one-jit program is retired); fpcg: "
        "flat/grid-layout XLA pipeline; refined[-host]: legacy "
        "mixed-precision refinement (stalls ~1e-5 at 1M DOF)",
    )
    p.add_argument("--max-iters", type=int, default=300)
    p.add_argument("--inner-tol", type=float, default=1e-4)
    p.add_argument("--inner-iters", type=int, default=200)
    p.add_argument("--max-outer", type=int, default=25)
    p.add_argument("--mg-degree", type=int, default=4)
    p.add_argument(
        "--mg-small-level-dof", type=int, default=0,
        help="levels under this DOF count run emulated f64; 0 = all-f32 "
        "hierarchy (measured best end-to-end)",
    )
    p.add_argument(
        "--budget-s", type=float, default=1800.0,
        help="soft wall-clock budget: repeats shrink and optional probes "
        "are skipped once it is at risk; the JSON line still prints",
    )
    p.add_argument(
        "--flagship-budget-s", type=float, default=600.0,
        help="sub-budget for the flagship phase (warmup + repeats + "
        "numerics check) — round-4 lesson (VERDICT r4 #1): the flagship "
        "phase burned 1055 s of the 1800 s budget and every family was "
        "skipped or timed out; repeats stop once this is exceeded so "
        "the families always get their share",
    )
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--skip-numerics-check", action="store_true")
    p.add_argument(
        "--no-fused-first", action="store_true",
        help="vestigial (accepted for the crash-retry re-exec's argv "
        "compatibility); the fused pipeline is retired",
    )
    p.add_argument(
        "--no-families", action="store_true",
        help="skip the per-family sub-benchmarks (extruded tube and "
        "distorted general-mesh scenes, run as subprocesses after the "
        "flagship result is secured; VERDICT.md r2 #3)",
    )
    p.add_argument(
        "--family-timeout-s", type=float, default=480.0,
        help="per-family subprocess timeout",
    )
    p.add_argument(
        "--probe-timeout-s", type=float, default=120.0,
        help="TPU-tunnel liveness probe timeout: the axon tunnel can be "
        "down for hours and jax.devices() then HANGS FOREVER (observed "
        "2026-08-18/19, >8 h; round-1 rc=124 class of failure).  When "
        "the probe fails, the bench degrades to a flagged CPU run at a "
        "reduced shape so a parseable JSON line still lands.  0 skips "
        "the probe.",
    )
    args = p.parse_args()

    hb(f"start: {args.nx}x{args.ny}x{args.nz}, solver={args.solver}")

    tpu_unreachable = False
    if not args.cpu and args.probe_timeout_s > 0:
        # Probe in a SUBPROCESS: a dead tunnel hangs jax.devices() with
        # no error, and once the backend is initialized in-process there
        # is no recovery — the probe must burn a throwaway process.
        import subprocess

        hb(f"probing TPU tunnel (timeout {args.probe_timeout_s:.0f}s)")
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=args.probe_timeout_s,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                check=True,
            )
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            tpu_unreachable = True
            args.cpu = True
            if (args.nx, args.ny, args.nz) == (32, 32, 320):
                args.nx = args.ny = 16
                args.nz = 64
            args.repeats = min(args.repeats, 1)
            hb(
                "TPU tunnel unreachable — degrading to a CPU run at "
                f"{args.nx}x{args.ny}x{args.nz} (flagged tpu_unreachable "
                "in the JSON; NOT a flagship measurement)"
            )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # The f64 outer recurrence / dd scalars need x64.
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    import fea_tpu as ft
    from fea_tpu.ops.multigrid import build_multigrid
    from fea_tpu.ops.structured import build_structured_operator, structured_scene
    from fea_tpu.ops.transposed import build_multigrid_t
    from fea_tpu.solve import (
        solve_operator_fpcg,
        solve_operator_fpcg_t_staged,
        solve_operator_refined,
        solve_operator_refined_host,
    )
    from fea_tpu.utils.cache import setup_compilation_cache

    # Per-machine/backend-keyed persistent cache (round-1 lesson: a shared
    # flat cache loaded artifacts compiled for a different machine).
    cache_dir = setup_compilation_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )
    del cache_dir  # cache is configured; no warm-marker machinery remains

    backend = jax.default_backend()
    hb(f"backend: {backend}")
    # Geometry: slender cantilever, fixed z==0 face, +y shear load on tip.
    lx = ly = 0.1
    lz = 1.0
    mat = ft.Material(E=10_000_000 * ft.units.psi, nu=0.3)
    scene, dims = structured_scene(args.nx, args.ny, args.nz, lx, ly, lz, mat, dtype=jnp.float64)
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == lz
    total_load = 100.0 * ft.units.lbf / ft.units.ft * lz
    loads[tip, 1] = total_load / tip.sum()
    fixed_host = np.asarray(scene.fixed, np.float64)
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), fixed_host, loads, mat, dtype=jnp.float64
    )
    n_dof = scene.n_dof
    hb(f"scene built: {n_dof} DOF")

    zero = scene.prescribed_or_zero(jnp.float64)
    loads_j = scene.loads

    stage_s: dict[str, float] = {}
    transposed = args.solver in ("auto", "staged")

    def assemble_and_solve(solver, progress=None):
        # Everything "assembly" (reference Ke integration, f32 cast,
        # multigrid hierarchy build — all host-side NumPy) is inside the
        # timed region, matching the baseline's assembly+solve definition.
        t0 = time.perf_counter()
        op_hi = build_structured_operator(scene, dims, dtype=jnp.float64)
        op_lo = op_hi.astype(jnp.float32)
        stage_s["operator_build"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        free_host = 1.0 - fixed_host  # host-side: skip the device mask pull
        if transposed:
            mg = build_multigrid_t(
                op_lo, degree=args.mg_degree, dtype=jnp.float32,
                small_level_dof=args.mg_small_level_dof,
                use_pallas=jax.default_backend() == "tpu",
                # levels under 50k DOF gain nothing from the fused
                # kernels (sub-ms either way) but each instantiation
                # bloats the executable: measured 95 s -> 55 s V-cycle
                # cold compile, steady V-cycle 4.9 ms (was 5.2)
                pallas_min_dof=50_000,
                free_np=free_host,
            )
        else:
            mg = build_multigrid(
                op_lo, degree=args.mg_degree, dtype=jnp.float32,
                small_level_dof=args.mg_small_level_dof, free_np=free_host,
            )
        stage_s["multigrid_build"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        if solver == "staged":
            sol = solve_operator_fpcg_t_staged(
                op_hi, loads_j, None, mg, tol=args.tol, max_iters=args.max_iters,
                progress=progress,
            )
        elif solver == "fpcg":
            sol = solve_operator_fpcg(
                op_hi, loads_j, zero, mg, tol=args.tol, max_iters=args.max_iters
            )
        else:
            refine_fn = (
                solve_operator_refined
                if solver == "refined"
                else solve_operator_refined_host
            )
            sol = refine_fn(
                op_hi, op_lo, loads_j, zero, mg,
                tol=args.tol, max_outer=args.max_outer,
                inner_tol=args.inner_tol, inner_iters=args.inner_iters,
            )
        jax.block_until_ready(sol.displacements)
        stage_s["solve"] = time.perf_counter() - t0
        # Materialize the report's SCALARS to the host now: the axon
        # backend can die mid-process (INVALID_ARGUMENT poisoning,
        # observed 2026-08-19) and a completed measurement must not be
        # retroactively lost to a later device pull.  Displacements stay
        # on device (a ~195 MB pull per repeat at 8.1M DOF would eat the
        # budget); materialize_u pulls them for the solves the report
        # actually reads (warmup = the crash-safe fallback, and the final
        # selected solution).
        from types import SimpleNamespace

        host_sol = SimpleNamespace(
            displacements=sol.displacements,
            stats=SimpleNamespace(
                iterations=int(sol.stats.iterations),
                relative_residual=float(sol.stats.relative_residual),
                converged=bool(sol.stats.converged),
            ),
        )
        return host_sol, op_hi

    def materialize_u(host_sol):
        if not isinstance(host_sol.displacements, np.ndarray):
            host_sol.displacements = np.asarray(host_sol.displacements)
        return host_sol

    def run_numerics_check(op_chk):
        """dd production apply on random data vs the exact host f64
        oracle; returns the relative error.  Raises on infra trouble."""
        from fea_tpu.native import stencil_apply_host
        from fea_tpu.ops.pallas_stencil import (
            dd_kernel_fits_vmem,
            dd_z_chunks,
            stencil_tables_dd,
        )
        from fea_tpu.ops.transposed import grid_of_t, t_of_grid
        from fea_tpu.solve import _st_apply_dot, _st_apply_dot_chunked

        Z, Y, X = op_chk.grid_shape
        rng = np.random.default_rng(20260817)
        x_np = rng.normal(size=(Z, Y, X, 3))
        want = stencil_apply_host(np.asarray(op_chk.ke, np.float64), x_np, dims)
        ddtabs = stencil_tables_dd(np.asarray(op_chk.ke, np.float64))
        ones_mask = jnp.ones((3, Y, X, Z), jnp.float32)
        xT = t_of_grid(jnp.asarray(x_np))
        pair = (
            xT.astype(jnp.float32),
            (xT - xT.astype(jnp.float32).astype(jnp.float64)).astype(jnp.float32),
        )
        if dd_kernel_fits_vmem(Y, X, Z):
            got_pair, _ = _st_apply_dot(
                ones_mask, ddtabs, pair, interpret=backend != "tpu"
            )
        else:  # above the fit: check the z-chunked kernel (the
            # production apply at this size)
            got_pair, _ = _st_apply_dot_chunked(
                ones_mask, ddtabs, pair,
                n_chunks=dd_z_chunks(Y, X, Z),
                interpret=backend != "tpu",
            )
        got = np.asarray(
            grid_of_t(got_pair[0].astype(jnp.float64) + got_pair[1].astype(jnp.float64))
        )
        return float(
            np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-300)
        )

    numerics_result = None

    # Warmup: compile once (excluded, as for any production solver).
    # Under auto, staged runs FIRST — its compact programs compile in
    # ~3 min cold, guaranteeing a result well inside any budget — unless
    # the fused marker says this exact config already succeeded fused.
    solver_now = "staged" if args.solver == "auto" else args.solver
    hb(f"warmup solve [{solver_now}] (compiles; staged pieces ~3 min cold, cached runs ~s)")
    sol, op_hi = assemble_and_solve(solver_now, progress=hb)
    # crash-safe host fallback for the final report (bitwise-identical to
    # any repeat's solution per the determinism gate)
    sol = materialize_u(sol)
    warmup_sol = sol
    hb(
        f"warmup done: {int(sol.stats.iterations)} iters, "
        f"rel_res {float(sol.stats.relative_residual):.3e}"
    )

    def run_repeats(solver):
        times, s, o = [], None, None
        flagship_cap = min(args.flagship_budget_s, 0.85 * args.budget_s)
        for rep in range(args.repeats):
            if times and time.perf_counter() - _T0 > flagship_cap:
                hb(f"flagship budget ({flagship_cap:.0f}s) at risk — "
                   f"stopping after {rep} repeats")
                break
            t0 = time.perf_counter()
            s, o = assemble_and_solve(solver)
            times.append(time.perf_counter() - t0)
            hb(f"repeat {rep + 1} [{solver}]: {times[-1]:.3f} s")
        return s if times else None, o if times else None, times

    sol_r, op_r, times = run_repeats(solver_now)
    if sol_r is not None:
        sol, op_hi = sol_r, op_r
    staged_best = min(times) if times and solver_now == "staged" else None

    best = min(times) if times else stage_s["solve"] + stage_s["multigrid_build"] + stage_s["operator_build"]

    # pull the final solution; if the backend died after the repeats, the
    # warmup's host copy is bitwise-identical (determinism gate)
    try:
        sol = materialize_u(sol)
    except Exception as exc:
        hb(f"final displacement pull failed ({exc}); using the warmup copy")
        sol = warmup_sol
    u = np.asarray(sol.displacements)
    iters = int(sol.stats.iterations)
    rel_res = float(sol.stats.relative_residual)
    converged = bool(sol.stats.converged)

    # sanity anchor: tip deflection near Euler-Bernoulli PL^3/3EI (solid
    # hexes add shear flexibility, trilinear interpolation adds stiffness;
    # the ratio should sit within ~15% of 1.0)
    E = float(np.asarray(mat.E))
    I = lx * ly**3 / 12.0
    tip_exact = total_load * lz**3 / (3 * E * I)
    tip_fem = float(u[tip, 1].mean())
    tip_ratio = tip_fem / tip_exact

    dof_per_s = n_dof / best
    result = {
        "metric": "assemble_solve_dof_per_s",
        "value": round(dof_per_s, 1),
        "unit": "DOF/s",
        "vs_baseline": round(dof_per_s / BASELINE_DOF_PER_S, 1),
        "converged": converged,
        "n_dof": n_dof,
        "n_elements": scene.n_elements,
        "iterations": iters,
        "relative_residual": rel_res,
        "wall_s": round(best, 4),
        "stage_s": {k: round(v, 4) for k, v in stage_s.items()},
        "tip_deflection_m": tip_fem,
        "tip_beam_theory_m": tip_exact,
        "tip_ratio": round(tip_ratio, 4),
        "backend": backend,
        "tpu_unreachable": tpu_unreachable,
        "first_output_s": None,  # filled right before printing
        "solver": {
            "staged": "k-step host-staged f64-pair flexible-PCG + f32 "
                      "Chebyshev-multigrid V-cycle [transposed layout, "
                      "fused Pallas dd stencil, k iterations/dispatch]",
            "fpcg": "f64 flexible-PCG + f32 Chebyshev-multigrid(Gershgorin) V-cycle",
            "refined": "structured-stencil f32 MG-PCG + f64 line-searched refinement",
            "refined-host": "structured-stencil f32 MG-PCG + f64 refinement (host outer)",
        }[solver_now],
    }
    if args.solver == "auto":
        result["auto_pipeline"] = solver_now
        if staged_best is not None:
            result["staged_wall_s"] = round(staged_best, 4)

    # dd-apply probe: per-apply ms + implied HBM bandwidth, using the
    # ALREADY-COMPILED staged apply program (zero extra compile time).
    from fea_tpu.ops.pallas_stencil import dd_kernel_fits_vmem, dd_z_chunks

    Zg, Yg, Xg = op_hi.grid_shape
    dd_fits = dd_kernel_fits_vmem(Yg, Xg, Zg)
    if args.solver in ("auto", "staged") and backend == "tpu" and dd_fits:
        try:
            from fea_tpu.ops.pallas_stencil import stencil_tables_dd
            from fea_tpu.ops.transposed import t_of_grid
            from fea_tpu.solve import _st_apply_dot

            Z, Y, X = op_hi.grid_shape
            ddtabs = stencil_tables_dd(np.asarray(op_hi.ke, np.float64))
            ones_mask = jnp.ones((3, Y, X, Z), jnp.float32)
            xT = t_of_grid(jnp.asarray(u, jnp.float64).reshape(Z, Y, X, 3))
            pair = (xT.astype(jnp.float32), (xT - xT.astype(jnp.float32).astype(jnp.float64)).astype(jnp.float32))
            out, _ = _st_apply_dot(ones_mask, ddtabs, pair)
            jax.block_until_ready(out)
            n_probe = 20
            t0 = time.perf_counter()
            for _ in range(n_probe):
                out, _ = _st_apply_dot(ones_mask, ddtabs, pair)
            jax.block_until_ready(out)
            dd_ms = (time.perf_counter() - t0) / n_probe * 1e3
            # >= read of (hi, lo, mask) + write of (hi, lo): 5 f32 arrays
            hbm = 5 * n_dof * 4 / (dd_ms * 1e-3) / 1e9
            result["dd_apply_ms"] = round(dd_ms, 3)
            result["hbm_gbps_min"] = round(hbm, 1)
        except Exception as exc:  # probe is informational only
            hb(f"dd probe skipped: {exc}")

    # Window-normalized figure (VERDICT r4 #6): the axon tunnel swings
    # ~1.5x between runs on identical code (docs/PERF.md measurement
    # caveat), so cross-round comparisons use the in-run dd-apply time
    # against the best observed window (2.1 ms at the default 1.05M-DOF
    # shape).  value_normalized = what this run's algorithm would score
    # in the best window; value stays the honest raw measurement.
    DD_BEST_WINDOW_MS = 2.1
    if "dd_apply_ms" in result and (args.nx, args.ny, args.nz) == (32, 32, 320):
        wf = result["dd_apply_ms"] / DD_BEST_WINDOW_MS
        result["window_factor"] = round(wf, 3)
        result["window_ref"] = f"dd_apply {DD_BEST_WINDOW_MS} ms best-window @1.05M DOF"
        result["value_normalized"] = round(result["value"] * wf, 1)

    if not args.skip_numerics_check:
        # On-chip numerics evidence: the production dd apply on random
        # data vs the exact host f64 oracle.  (Full independent gate:
        # tools/tpu_check.)  Runs on the already-compiled staged apply.
        # A NUMERICAL mismatch fails the bench loudly; an INFRA exception
        # (tunnel wedge/compile-helper error — both observed minutes
        # apart from healthy runs) is retried once and then recorded as
        # ok=None rather than zeroing a valid, self-certified solve (the
        # headline residual is already the exact-f64-certified one).
        err = numerics_result
        check_exc = None
        if err is None:
            hb("numerics check: dd apply vs host f64 oracle")
            for attempt in (1, 2):
                try:
                    err = run_numerics_check(op_hi)
                    break
                except Exception as exc:
                    hb(f"numerics check attempt {attempt} crashed: {exc}")
                    check_exc = exc
        if err is not None:
            result["numerics_check"] = {
                "dd_apply_vs_f64_oracle_rel_err": err,
                "ok": err <= 1e-9,
            }
            if err > 1e-9:
                fail(result, f"dd apply numerics check failed: rel err {err:.3e}")
        else:
            # Discriminate backend death from a genuine check bug: if a
            # trivial device op still works, the crash is specific to the
            # check program — that is a REAL failure, not infra.
            backend_alive = True
            try:
                jax.block_until_ready(jnp.ones(8) + 1.0)
            except Exception:
                backend_alive = False
            if backend_alive:
                result["numerics_check"] = {"ok": False, "error": str(check_exc)}
                fail(
                    result,
                    f"numerics check crashed while the backend is healthy "
                    f"(a real check failure, not infra): {check_exc}",
                )
            result["numerics_check"] = {
                "ok": None,
                "error": f"backend died (infra, not a numerics failure): {check_exc}",
            }

    if not converged:
        fail(result, f"solve did not converge (relative residual {rel_res:.3e})")
    if not (rel_res <= args.tol * 1.01):
        fail(result, f"relative residual {rel_res:.3e} above tol {args.tol:g}")
    if not (TIP_BAND[0] <= tip_ratio <= TIP_BAND[1]):
        fail(result, f"tip deflection ratio {tip_ratio:.4f} outside {TIP_BAND}")

    # --- per-family sub-benchmarks (VERDICT.md r2 #3) -----------------------
    # The flagship result above is fully host-materialized and gated; the
    # other two scale families run as SUBPROCESSES so a family crash (or a
    # mid-process axon backend death) can never zero the flagship JSON.
    # Budget-gated: each family is skipped once the wall budget is at risk.
    if not args.no_families and not tpu_unreachable and not args.cpu:
        import subprocess
        import tempfile

        families = {}
        tools_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"
        )
        # Round-5 ordering (VERDICT r4 #1): reliability order — extruded
        # first (1.77M DOF/s recorded in r03), canonicalized, arbitrary,
        # CURVILINEAR LAST and at the size that completed before (182k;
        # the 812k run is a separate escalation entry, attempted only
        # with leftover budget).  Every family tool prints stage
        # heartbeats from inside its builds and emits a PARTIAL JSON on
        # its own SIGALRM deadline; this parent additionally captures
        # the stderr tail so even a hard subprocess timeout leaves
        # diagnostics in the record.
        family_cmds = [
            # the reference's tube family at 591k DOF
            ("extruded", [
                sys.executable, os.path.join(tools_dir, "tube_bench.py"),
                "--segments", "256", "--layers", "384", "--repeats", "1",
            ]),
            # the distorted general-mesh scene, served by the curvilinear
            # variable-weight stencil route (relabeled from round 3's
            # "unstructured" — VERDICT r3 #5; host-IEEE-certified
            # in-solve since round 4).  Runs BEFORE canonicalized: the
            # two share the exact same programs at the same 182k shape,
            # so this entry pays the cold compile inside its own budget
            # and canonicalized then runs warm (measured: canon-first
            # hit its 450s deadline on the cold compile, curv-after
            # solved in 1.6 s).
            ("curvilinear", [
                sys.executable, os.path.join(tools_dir, "curv_bench.py"),
                "--nx", "24", "--ny", "24", "--nz", "96", "--repeats", "2",
            ]),
            # NON-grid connectivity as-given (randomly renumbered nodes):
            # recovered by the canonicalization pass and served by the
            # curvilinear pipeline (round-4, VERDICT r3 #5)
            ("canonicalized", [
                sys.executable, os.path.join(tools_dir, "canon_bench.py"),
                "--nx", "24", "--ny", "24", "--nz", "96", "--repeats", "2",
            ]),
            # arbitrary topology (L-domain — defeats every full-grid
            # detector AND canonicalization): since round 5 solve()
            # auto-routes box-subset meshes through the subgrid
            # EMBEDDING (curvilinear stencil on the bounding box, zero
            # weights in the void) — 554k real DOF measured 111.6k
            # DOF/s vs the honest BCSR+AMG gather route's 12.4k
            # (FEA_TPU_NO_EMBED records the latter)
            ("arbitrary", [
                sys.executable, os.path.join(tools_dir, "arbitrary_bench.py"),
                "--nx", "40", "--ny", "40", "--nz", "144", "--repeats", "2",
            ]),
            # escalation: the 812k curvilinear point (the round-4 staller
            # — now heartbeat-instrumented), only with leftover budget
            ("curvilinear_812k", [
                sys.executable, os.path.join(tools_dir, "curv_bench.py"),
                "--nx", "40", "--ny", "40", "--nz", "160", "--repeats", "2",
            ]),
            # escalation: the 8.1M capacity tier (streamed host-IEEE
            # certification, round-4) — bench.py itself as the child
            # (its JSON schema is mapped below); only with leftover
            # budget.  Measured 2026-08-21: 10.9 s wall, 19 iters,
            # 8.7e-10 host-certified, 236 s total incl. builds.
            ("capacity_8m", [
                sys.executable,
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench.py"),
                "--nx", "64", "--ny", "64", "--nz", "640", "--repeats", "1",
                "--no-families", "--skip-numerics-check",
                "--budget-s", "400",
            ]),
        ]

        def run_family(name, cmd, timeout_s):
            # child's own deadline fires ~30 s before the parent timeout
            # so it can emit its partial JSON (bench.py children carry
            # their own --budget-s instead)
            if name != "capacity_8m":
                cmd = cmd + ["--deadline-s", str(max(60.0, timeout_s - 30.0))]
            hb(f"family {name}: {' '.join(cmd[1:])}")
            with tempfile.TemporaryFile() as errf:
                try:
                    proc = subprocess.run(
                        cmd, stdout=subprocess.PIPE, stderr=errf,
                        timeout=timeout_s,
                    )
                    out_lines = proc.stdout.decode().strip().splitlines()
                    rec = json.loads(out_lines[-1]) if out_lines else {}
                    if "dof_per_s" not in rec and "value" in rec:
                        # a bench.py child (capacity escalation): map its
                        # flagship JSON schema onto the family record
                        rec = dict(
                            rec,
                            dof_per_s=rec["value"],
                            t_solve=rec.get("wall_s"),
                        )
                    if proc.returncode != 0 or rec.get("partial"):
                        # partial record: stages completed + error —
                        # never a silent vanish (VERDICT r4 #1)
                        errf.seek(0)
                        tail = errf.read().decode(errors="replace")[-1500:]
                        return {
                            "partial": True,
                            "error": rec.get(
                                "error", f"rc={proc.returncode}"
                            )[:200],
                            "stage_reached": rec.get("stage_reached"),
                            "stage_s": rec.get("stage_s"),
                            "n_dof": rec.get("n_dof"),
                            "stderr_tail": tail.splitlines()[-8:],
                        }
                    out = {
                        "n_dof": rec.get("n_dof"),
                        "dof_per_s": round(float(rec.get("dof_per_s", 0.0)), 1),
                        "solve_s": rec.get("t_solve", rec.get("value")),
                        "iterations": rec.get("iterations"),
                        "relative_residual": rec.get(
                            "host_certified_relative_residual",
                            rec.get("relative_residual"),
                        ),
                        "converged": rec.get("converged"),
                        "setup_s": rec.get(
                            "t_mg_build", rec.get("hierarchy_setup_s")
                        ),
                        "operator_build_s": rec.get("t_operator_build"),
                        "stage_s": rec.get("stage_s"),
                    }
                    if rec.get("fine_apply_ms") is not None:
                        out["fine_apply_ms"] = rec["fine_apply_ms"]
                    return out
                except subprocess.TimeoutExpired:
                    errf.seek(0)
                    tail = errf.read().decode(errors="replace")[-1500:]
                    return {
                        "error": f"timeout after {timeout_s:.0f}s",
                        "stderr_tail": tail.splitlines()[-8:],
                    }
                except Exception as exc:
                    return {"error": str(exc)[:200]}

        for name, cmd in family_cmds:
            remaining = args.budget_s - (time.perf_counter() - _T0)
            # the escalation entry runs only with comfortable headroom
            need = (
                args.family_timeout_s + 180.0
                if name in ("curvilinear_812k", "capacity_8m")
                else args.family_timeout_s + 60.0
            )
            if remaining < need:
                hb(f"family {name}: skipped (budget: {remaining:.0f}s left)")
                families[name] = {"skipped": f"budget ({remaining:.0f}s left)"}
                continue
            families[name] = run_family(
                name, cmd, min(args.family_timeout_s, remaining - 60.0)
            )
            if "dof_per_s" in families[name]:
                # run-level window normalization (VERDICT r4 #5): tunnel
                # weather is a property of the run, measured once by the
                # flagship dd-apply probe minutes earlier in this same
                # process; families inherit that factor (their own
                # fine_apply_ms stays in the record as the local probe)
                wf = result.get("window_factor")
                if wf:
                    families[name]["dof_per_s_normalized"] = round(
                        families[name]["dof_per_s"] * wf, 1
                    )
                hb(f"family {name}: {families[name]['dof_per_s']} DOF/s")
            else:
                hb(f"family {name}: {families[name].get('error', 'partial')}")
        result["families"] = families

    result["first_output_s"] = round(time.perf_counter() - _T0, 1)
    hb("done")
    print(json.dumps(result))


def _main_with_crash_retry() -> None:
    """One-shot process-level retry: an axon INVALID_ARGUMENT poisons the
    whole process (even eager ops fail afterwards — observed 2026-08-19
    when the fused executable load crashed), so in-process fallback is
    impossible.  Re-exec ourselves once with --no-fused-first so the
    guaranteed staged path runs in a FRESH backend; stdout is inherited,
    preserving the one-JSON-line contract."""
    try:
        main()
    except SystemExit:
        raise
    except Exception as exc:
        if os.environ.get("FEA_BENCH_RETRIED") == "1":
            raise
        hb(f"fatal backend error ({exc}); re-execing once for a fresh backend")
        os.environ["FEA_BENCH_RETRIED"] = "1"
        argv = [sys.executable, os.path.abspath(__file__)] + sys.argv[1:]
        if "--no-fused-first" not in argv:
            argv.append("--no-fused-first")
        sys.stdout.flush()
        sys.stderr.flush()
        os.execve(argv[0], argv, os.environ)


if __name__ == "__main__":
    _main_with_crash_retry()
