"""On-chip benchmark of the CURVILINEAR solve path (topologically
structured mesh, distorted geometry): variable-coefficient 27-offset
block stencil + re-discretized geometric multigrid FCG.

The scene is IDENTICAL to tools/unstructured_bench.py's (box mesh with
randomly distorted interior nodes, same rng seed/amplitude/loads), so
the two tools measure the same physical problem through the two routes
— unstructured gather/scatter + two-level vs the curvilinear stencil.
Prints one JSON line.
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
    p.add_argument("--degree", type=int, default=2, help="Chebyshev smoother degree "
                   "(V(2,2) measured best end-to-end at 812k on-chip, round 4)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--repeats", type=int, default=2)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    import fea_tpu as ft
    from fea_tpu.ops import curvilinear as cv
    from fea_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    )

    def say(s):
        print(f"[curv] {s}", file=sys.stderr, flush=True)

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
    t_scene = time.perf_counter() - t0
    say(f"scene {scene.n_dof} DOF in {t_scene:.1f} s")

    dims = cv.infer_topo_dims(scene)
    assert dims == (args.nx, args.ny, args.nz), dims

    t0 = time.perf_counter()
    op = cv.build_curv_operator(scene, dims, dtype=jnp.float64)
    jax.block_until_ready(op.w)
    t_op = time.perf_counter() - t0
    say(f"operator (weight field) build {t_op:.1f} s")

    t0 = time.perf_counter()
    free_np = 1.0 - np.asarray(scene.fixed, np.float64)
    mg = cv.build_curv_multigrid(
        np.asarray(scene.nodes), dims, free_np, scene.material,
        w0=op.w, degree=args.degree,
    )
    jax.block_until_ready(mg.coarse_inv)
    t_mg = time.perf_counter() - t0
    say(f"multigrid build {t_mg:.1f} s "
        f"(levels {[l.dims for l in mg.levels]})")

    best = None
    for rep in range(max(args.repeats, 2)):  # >=1 warm repeat: repeat 0
        # carries the staged-program compiles/uploads
        t0 = time.perf_counter()
        sol = ft.solve_curvilinear(
            scene, dims, tol=args.tol, max_iters=200, prebuilt=(op, mg),
        )
        jax.block_until_ready(sol.displacements)
        t = time.perf_counter() - t0
        stats = dict(
            iterations=int(sol.stats.iterations),
            relative_residual=float(sol.stats.relative_residual),
            converged=bool(sol.stats.converged),
        )
        say(f"repeat {rep}: {t:.2f} s, {stats['iterations']} iters, "
            f"res {stats['relative_residual']:.2e}")
        if best is None or t < best[0]:
            best = (t, stats, sol)

    t_solve, stats, sol = best
    # Since round 4, solve_curvilinear host-certifies INTERNALLY (exact
    # IEEE f64 through the native variable-weight C++ kernel, with
    # host-residual correction passes; the ~0.5 GB weight pull is
    # cached on the operator, so warm repeats pay only ~1 s of native
    # applies) — the repeat walls above INCLUDE certification and
    # sol.stats.relative_residual IS the host-certified figure.
    true_rel = stats["relative_residual"]
    say(f"host-certified rel residual {true_rel:.2e} (in-solve)")

    print(json.dumps(dict(
        n_dof=scene.n_dof,
        n_elements=scene.n_elements,
        dof_per_s=scene.n_dof / t_solve,
        t_operator_build=t_op,
        t_mg_build=t_mg,
        t_solve=t_solve,
        host_certified_relative_residual=true_rel,
        **stats,
    )), flush=True)


if __name__ == "__main__":
    main()
