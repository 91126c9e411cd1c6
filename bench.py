"""Benchmark harness: assemble-and-solve a ~1M-DOF hex8 voxel cantilever
with matrix-free multigrid-PCG + f64 refinement on one chip, and report
end-to-end DOF/s against the reference baseline.

Baseline (BASELINE.md): the reference's dense path assembles+solves its
3,750-DOF cubebeam in 17.2 s on the container CPU -> 218 DOF/s.  The
metric here is the same end-to-end quantity (element integration +
boundary conditions + multigrid hierarchy construction + solve to the
target residual) at this harness's mesh size, after one warmup run so
compile time is excluded (the reference has no compile stage; its 17.2 s
is also steady-state).

The harness FAILS LOUDLY (nonzero exit, "converged": false in the JSON,
no DOF/s headline) when the solve does not reach the target residual or
the tip deflection leaves the trilinear-hex band around beam theory —
round 1 printed "39x baseline" next to a 10^14 relative residual
(VERDICT.md weak #2); never again.

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
        choices=["fpcg", "refined", "refined-host"],
        default="fpcg",
        help="fpcg: f64 flexible-PCG with f32 multigrid preconditioner "
        "(one jit, the production path); refined[-host]: legacy "
        "mixed-precision refinement (stalls ~1e-5 at 1M DOF)",
    )
    p.add_argument("--max-iters", type=int, default=300)
    p.add_argument("--inner-tol", type=float, default=1e-4)
    p.add_argument("--inner-iters", type=int, default=200)
    p.add_argument("--max-outer", type=int, default=25)
    p.add_argument("--mg-degree", type=int, default=4)
    p.add_argument(
        "--mg-small-level-dof", type=int, default=0,
        help="levels under this DOF count run emulated f64; the default 0 "
        "(all-f32 hierarchy) measured 0.91 s vs 1.00 s end-to-end - the "
        "f64 small levels only existed to dodge a small-shape f32 compile "
        "pathology that this toolchain no longer exhibits inside the "
        "fused program (library default stays conservative)",
    )
    p.add_argument(
        "--layout",
        choices=["transposed", "grid"],
        default="transposed",
        help="transposed: component-major (3,Y,X,Z) pipeline with the fused "
        "Pallas stencil kernels (f32 V-cycle + double-f32 f64 apply) — the "
        "production TPU path; grid: flat (Z,Y,X,3) XLA pad-add pipeline",
    )
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--skip-numerics-check", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # Mixed-precision refinement needs f64 for the outer true residual;
    # the inner SpMV-heavy CG stays f32.
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    import fea_tpu as ft
    from fea_tpu.ops.multigrid import build_multigrid
    from fea_tpu.ops.structured import build_structured_operator, structured_scene
    from fea_tpu.ops.transposed import build_multigrid_t
    from fea_tpu.solve import (
        solve_operator_fpcg,
        solve_operator_fpcg_t,
        solve_operator_refined,
        solve_operator_refined_host,
    )
    from fea_tpu.utils.cache import setup_compilation_cache

    # Per-machine/backend-keyed persistent cache (VERDICT.md weak #8: a
    # shared flat cache loaded artifacts compiled for a different machine).
    setup_compilation_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )

    backend = jax.default_backend()
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

    zero = scene.prescribed_or_zero(jnp.float64)
    loads_j = scene.loads

    spacing = (lx / args.nx, ly / args.ny, lz / args.nz)
    stage_s: dict[str, float] = {}

    def assemble_and_solve():
        # Everything "assembly" (reference Ke integration, f32 cast,
        # multigrid hierarchy build — all host-side NumPy) is inside the
        # timed region, matching the baseline's assembly+solve definition.
        t0 = time.perf_counter()
        op_hi = build_structured_operator(scene, dims, dtype=jnp.float64)
        op_lo = op_hi.astype(jnp.float32)
        stage_s["operator_build"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        free_host = 1.0 - fixed_host  # host-side: skip the device mask pull
        if args.solver == "fpcg" and args.layout == "transposed":
            mg = build_multigrid_t(
                op_lo, degree=args.mg_degree, dtype=jnp.float32,
                small_level_dof=args.mg_small_level_dof,
                use_pallas=jax.default_backend() == "tpu",
                free_np=free_host,
            )
        else:
            mg = build_multigrid(
                op_lo, spacing, mat, degree=args.mg_degree, dtype=jnp.float32,
                small_level_dof=args.mg_small_level_dof, free_np=free_host,
            )
        stage_s["multigrid_build"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        if args.solver == "fpcg":
            fpcg_fn = (
                solve_operator_fpcg_t if args.layout == "transposed" else solve_operator_fpcg
            )
            sol = fpcg_fn(
                op_hi, loads_j, zero, mg, tol=args.tol, max_iters=args.max_iters
            )
        else:
            solver = (
                solve_operator_refined
                if args.solver == "refined"
                else solve_operator_refined_host
            )
            sol = solver(
                op_hi,
                op_lo,
                loads_j,
                zero,
                mg,
                tol=args.tol,
                max_outer=args.max_outer,
                inner_tol=args.inner_tol,
                inner_iters=args.inner_iters,
            )
        jax.block_until_ready(sol.displacements)
        stage_s["solve"] = time.perf_counter() - t0
        return sol

    # Warmup: compile once (excluded, as for any production solver).
    sol = assemble_and_solve()

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        sol = assemble_and_solve()
        times.append(time.perf_counter() - t0)
    best = min(times)

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

    # direct fine-stencil SpMV timing -> implied HBM bandwidth (the op is
    # bandwidth-bound: >= one read + one write of the (N,3) f32 state)
    op_lo = build_structured_operator(scene, dims, dtype=jnp.float32)
    x32 = jnp.asarray(u, jnp.float32)
    apply_jit = jax.jit(op_lo.apply)
    jax.block_until_ready(apply_jit(x32))
    n_spmv = 20
    t0 = time.perf_counter()
    y = x32
    for _ in range(n_spmv):
        y = apply_jit(y)
    jax.block_until_ready(y)
    spmv_ms = (time.perf_counter() - t0) / n_spmv * 1e3
    hbm_gbps = 2 * n_dof * 4 / (spmv_ms * 1e-3) / 1e9

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
        "fine_spmv_ms": round(spmv_ms, 3),
        "hbm_gbps_min": round(hbm_gbps, 1),
        "tip_deflection_m": tip_fem,
        "tip_beam_theory_m": tip_exact,
        "tip_ratio": round(tip_ratio, 4),
        "backend": backend,
        "solver": (
            "f64 flexible-PCG + f32 Chebyshev-multigrid(Gershgorin) V-cycle"
            + (
                " [transposed layout, fused Pallas stencil + double-f32 apply]"
                if args.layout == "transposed"
                else ""
            )
            if args.solver == "fpcg"
            else "structured-stencil f32 MG-PCG + f64 line-searched refinement"
        ),
    }

    if not args.skip_numerics_check:
        from tools.tpu_check import run_checks

        result["numerics_check"] = run_checks()
        if not result["numerics_check"]["tpu_check_ok"]:
            fail(result, "TPU-vs-CPU numerics check failed")

    if not converged:
        fail(result, f"solve did not converge (relative residual {rel_res:.3e})")
    if not (rel_res <= args.tol * 1.01):
        fail(result, f"relative residual {rel_res:.3e} above tol {args.tol:g}")
    if not (TIP_BAND[0] <= tip_ratio <= TIP_BAND[1]):
        fail(result, f"tip deflection ratio {tip_ratio:.4f} outside {TIP_BAND}")

    print(json.dumps(result))


if __name__ == "__main__":
    main()
