"""Benchmark harness: assemble-and-solve a ~1M-DOF hex8 voxel cantilever
with matrix-free Jacobi-PCG on one chip, and report end-to-end DOF/s
against the reference baseline.

Baseline (BASELINE.md): the reference's dense path assembles+solves its
3,750-DOF cubebeam in 17.2 s on the container CPU -> 218 DOF/s.  The
metric here is the same end-to-end quantity (element integration +
boundary conditions + solve to the target residual) at this harness's
mesh size, after one warmup run so compile time is excluded (the
reference has no compile stage; its 17.2 s is also steady-state).

Prints exactly ONE JSON line:
  {"metric": "assemble_solve_dof_per_s", "value": ..., "unit": "DOF/s",
   "vs_baseline": ..., ...detail fields...}
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


BASELINE_DOF_PER_S = 218.0  # BASELINE.md end-to-end reference measurement


def main() -> None:
    p = argparse.ArgumentParser()
    # default: cubic elements (multigrid-friendly), ~1.05M DOF
    p.add_argument("--nx", type=int, default=32)
    p.add_argument("--ny", type=int, default=32)
    p.add_argument("--nz", type=int, default=320)
    p.add_argument("--tol", type=float, default=1e-8)
    p.add_argument("--inner-tol", type=float, default=1e-3)
    p.add_argument("--inner-iters", type=int, default=200)
    p.add_argument("--max-outer", type=int, default=25)
    p.add_argument("--mg-degree", type=int, default=3)
    p.add_argument("--no-mg", action="store_true", help="Jacobi instead of multigrid")
    p.add_argument(
        "--fused-outer",
        action="store_true",
        help="single monolithic jit for the whole refinement (default: host outer loop)",
    )
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # Mixed-precision refinement needs f64 for the outer true residual;
    # the inner SpMV-heavy CG stays f32.
    jax.config.update("jax_enable_x64", True)
    # Persistent compile cache: the TPU toolchain takes minutes on the
    # small-shape coarse-grid programs the first time; later runs reuse.
    import os

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    import fea_tpu as ft
    from fea_tpu.ops.multigrid import build_multigrid
    from fea_tpu.ops.structured import build_structured_operator, structured_scene
    from fea_tpu.solve import solve_operator_refined, solve_operator_refined_host

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
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed), loads, mat, dtype=jnp.float64
    )
    n_dof = scene.n_dof

    zero = scene.prescribed_or_zero(jnp.float64)
    loads_j = scene.loads

    spacing = (lx / args.nx, ly / args.ny, lz / args.nz)

    def assemble_and_solve():
        # Integrate the reference Ke in f64, cast for the f32 inner CG,
        # build the multigrid hierarchy — all "assembly" work is timed,
        # matching the baseline's assembly+solve definition.
        op_hi = build_structured_operator(scene, dims, dtype=jnp.float64)
        op_lo = op_hi.astype(jnp.float32)
        mg = (
            None
            if args.no_mg
            else build_multigrid(op_lo, spacing, mat, degree=args.mg_degree, dtype=jnp.float32)
        )
        solver = solve_operator_refined if args.fused_outer else solve_operator_refined_host
        return solver(
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

    # Warmup: compile once (excluded, as for any production solver).
    sol = assemble_and_solve()
    jax.block_until_ready(sol.displacements)

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        sol = assemble_and_solve()
        jax.block_until_ready(sol.displacements)
        times.append(time.perf_counter() - t0)
    best = min(times)

    u = np.asarray(sol.displacements)
    iters = int(sol.stats.iterations)
    rel_res = float(sol.stats.relative_residual)

    # sanity anchor: tip deflection near Euler-Bernoulli PL^3/3EI (solid
    # hexes add shear flexibility, trilinear interpolation adds stiffness;
    # the ratio should sit within ~15% of 1.0)
    E = float(np.asarray(mat.E))
    I = lx * ly**3 / 12.0
    tip_exact = total_load * lz**3 / (3 * E * I)
    tip_fem = float(u[tip, 1].mean())

    dof_per_s = n_dof / best
    result = {
        "metric": "assemble_solve_dof_per_s",
        "value": round(dof_per_s, 1),
        "unit": "DOF/s",
        "vs_baseline": round(dof_per_s / BASELINE_DOF_PER_S, 1),
        "n_dof": n_dof,
        "n_elements": scene.n_elements,
        "iterations": iters,
        "relative_residual": rel_res,
        "wall_s": round(best, 4),
        "tip_deflection_m": tip_fem,
        "tip_beam_theory_m": tip_exact,
        "backend": backend,
        "solver": (
            "structured-stencil f32 "
            + ("Jacobi" if args.no_mg else "Chebyshev-multigrid")
            + "-PCG + f64 iterative refinement"
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
