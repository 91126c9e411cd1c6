"""On-chip benchmark of the UNSTRUCTURED solve path (the fallback for
meshes that are neither voxel-structured nor extruded): gather/scatter
element apply + two-level (RBM coarse + block-Jacobi) preconditioned CG.

The scene is a box mesh with randomly distorted interior nodes — the
distortion defeats both the structured and extruded detectors, so this
measures exactly what a general mesh gets.  Prints one JSON line.

Context (docs/PERF.md SpMV shoot-out): the unstructured apply costs
~80 ms at 328k elements on-chip (32x the structured stencil), so the
unstructured path's wall is iterations x 80 ms — which is why the
two-level preconditioner's 3.6-12x iteration cut (ops/twolevel.py) is
the lever that matters here.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=24)
    p.add_argument("--ny", type=int, default=24)
    p.add_argument("--nz", type=int, default=96)
    p.add_argument("--tol", type=float, default=1e-8)
    p.add_argument("--aggregates", type=int, default=512)
    p.add_argument("--degree", type=int, default=2, help="Chebyshev smoother degree")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument(
        "--legacy-f64", action="store_true",
        help="measure the pre-ddq pipeline (exact emulated-f64 in-loop "
             "apply, no certification) instead of the production route",
    )
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    import fea_tpu as ft
    from fea_tpu.ops.twolevel import build_two_level_cheb
    from fea_tpu.solvers.cg import fpcg_dd64_staged
    from fea_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    )

    t0 = time.perf_counter()
    nodes, elements = ft.mesh.box_hex_mesh(
        args.nx, args.ny, args.nz, 0.1, 0.1, 1.0
    )
    rng = np.random.default_rng(7)
    h = 0.1 / args.nx
    interior = (nodes[:, 2] > 0) & (nodes[:, 2] < 1.0)
    nodes = nodes + 0.25 * h * rng.uniform(-1, 1, nodes.shape) * interior[:, None]
    fixed = ft.fix_where(nodes, lambda q: np.isclose(q[:, 2], 0.0), dofs_per_node=3)
    loads = np.zeros_like(nodes)
    tip = np.isclose(nodes[:, 2], 1.0)
    loads[tip, 1] = 1.0 / tip.sum()
    scene = ft.make_scene(
        nodes, elements, fixed, loads,
        ft.Material(E=10_000_000 * ft.units.psi, nu=0.3), dtype=jnp.float64,
    )
    op = ft.build_operator(scene, dtype=jnp.float64)
    t_op = time.perf_counter() - t0

    t0 = time.perf_counter()
    tl = build_two_level_cheb(
        op, scene.nodes, target_aggregates=args.aggregates, degree=args.degree
    )
    t_tl = time.perf_counter() - t0

    zero = jnp.zeros_like(scene.loads)
    b = op.rhs(scene.loads, zero)

    progress = lambda s: print(f"[unstructured] {s}", file=sys.stderr, flush=True)

    def solve():
        t0 = time.perf_counter()
        if args.legacy_f64:
            # pre-ddq pipeline: exact emulated-f64 in-loop apply
            u, stats = fpcg_dd64_staged(
                op, b, precond=tl, tol=args.tol, max_iters=20_000,
                progress=progress,
            )
        else:
            # the production route: double-f32 pair-space in-loop apply
            # (ops/ddq.py) + exact-apply certification/corrections —
            # what solve.py's unstructured auto route runs
            from fea_tpu.solve import _solve_unstructured_ddq

            u, stats = _solve_unstructured_ddq(
                op, tl, b, jnp.zeros_like(b), tol=args.tol,
                max_iters=20_000, nodes=scene.nodes,
                material=scene.material, progress=progress,
            )
        jax.block_until_ready(u)
        t = time.perf_counter() - t0
        # materialize the report scalars NOW: the axon worker can die
        # later in the process and a completed measurement must survive
        # (one run lost its result pulling stats for the final JSON)
        host_stats = dict(
            iterations=int(stats.iterations),
            relative_residual=float(stats.relative_residual),
            converged=bool(stats.converged),
        )
        return u, host_stats, t

    u, stats, t_warm = solve()  # includes compile
    times = [solve()[2] for _ in range(args.repeats)]
    best = min(times)
    n_dof = scene.n_dof
    print(json.dumps({
        "backend": jax.default_backend(),
        "n_dof": n_dof,
        "n_elements": int(np.asarray(scene.elements).shape[0]),
        "n_aggregates": tl.n_aggs,
        "iterations": stats["iterations"],
        "relative_residual": stats["relative_residual"],
        "converged": stats["converged"],
        "operator_build_s": round(t_op, 3),
        "twolevel_build_s": round(t_tl, 3),
        "solve_s_best": round(best, 3),
        "solve_s_with_compile": round(t_warm, 3),
        "dof_per_s": round(n_dof / best, 0),
    }))


if __name__ == "__main__":
    main()
