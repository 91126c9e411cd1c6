"""Multi-RHS flagship benchmark (VERDICT r3 #4): k load cases on the
1.05M-DOF voxel cantilever through the BATCHED k-step staged pipeline
(`ft.solve_many`), against a warm single `solve_operator_fpcg_t_staged`
solve measured in the same process/window.  Prints one JSON line with
the amortized per-case ratio.

Floor analysis (why ~0.4x, not arbitrarily small): at 1.05M DOF a warm
single solve is ~70% device work (FCG loop + certification); batching
can only amortize the other ~30% (builds, dispatches, syncs, program
loads) plus whatever the batch-resident operator saves.  The measured
0.08x/case of round 3 was at 56k DOF, where overheads dominate.
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
    p.add_argument("--nx", type=int, default=32)
    p.add_argument("--ny", type=int, default=32)
    p.add_argument("--nz", type=int, default=320)
    p.add_argument("--cases", type=int, default=8)
    p.add_argument("--tol", type=float, default=1e-8)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    import fea_tpu as ft
    from fea_tpu.ops.structured import build_structured_operator, structured_scene
    from fea_tpu.ops.transposed import build_multigrid_t
    from fea_tpu.solve import solve_operator_fpcg_t_staged
    from fea_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    )

    def say(s):
        print(f"[many] {s}", file=sys.stderr, flush=True)

    mat = ft.Material(E=10_000_000 * ft.units.psi, nu=0.3)
    lx = ly = 0.1
    lz = 1.0
    scene, dims = structured_scene(
        args.nx, args.ny, args.nz, lx, ly, lz, mat, dtype=jnp.float64
    )
    nodes = np.asarray(scene.nodes)
    fixed = np.asarray(scene.fixed, np.float64)
    tip = nodes[:, 2] == lz
    rng = np.random.default_rng(17)
    loads_b = np.zeros((args.cases, nodes.shape[0], 3))
    for i in range(args.cases):
        loads_b[i, tip, 1] = rng.uniform(0.5, 2.0) * 100.0 / tip.sum()
        loads_b[i, tip, 0] = rng.uniform(-1.0, 1.0) * 100.0 / tip.sum()
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), fixed, loads_b[0], mat,
        dtype=jnp.float64,
    )
    say(f"scene {scene.n_dof} DOF, {args.cases} cases")

    # warm single solve (same pipeline the batch uses), builds included
    def single():
        t0 = time.perf_counter()
        op = build_structured_operator(scene, dims, dtype=jnp.float64)
        mg_t = build_multigrid_t(
            op.astype(jnp.float32), dtype=jnp.float32,
            use_pallas=jax.default_backend() == "tpu",
            pallas_min_dof=50_000, free_np=1.0 - fixed,
        )
        sol = solve_operator_fpcg_t_staged(
            op, scene.loads, None, mg_t, tol=args.tol, max_iters=300,
        )
        jax.block_until_ready(sol.displacements)
        return time.perf_counter() - t0, sol

    say("single warmup (compiles)")
    t_single, sol1 = single()
    say(f"single cold-ish: {t_single:.3f} s")
    t_single, sol1 = single()
    say(
        f"single warm: {t_single:.3f} s, {int(sol1.stats.iterations)} its, "
        f"res {float(sol1.stats.relative_residual):.2e}"
    )

    say("batched warmup (compiles)")
    t0 = time.perf_counter()
    solm = ft.solve_many(scene, loads_b, tol=args.tol, max_iters=300)
    jax.block_until_ready(solm.displacements)
    say(f"batched cold-ish: {time.perf_counter() - t0:.3f} s")
    t0 = time.perf_counter()
    solm = ft.solve_many(scene, loads_b, tol=args.tol, max_iters=300)
    jax.block_until_ready(solm.displacements)
    t_batch = time.perf_counter() - t0
    per_case = t_batch / args.cases
    conv = np.asarray(solm.stats.converged)
    say(
        f"batched warm: {t_batch:.3f} s = {per_case:.3f} s/case "
        f"({per_case / t_single:.3f}x warm single); iterations "
        f"{np.asarray(solm.stats.iterations).tolist()}"
    )
    # case-0 parity with the single solve
    du = float(jnp.max(jnp.abs(solm.displacements[0] - sol1.displacements)))
    scale = float(jnp.max(jnp.abs(sol1.displacements)))
    say(f"case-0 vs single solve: {du / scale:.2e} relative")

    print(json.dumps(dict(
        n_dof=scene.n_dof,
        cases=args.cases,
        t_single_warm=round(t_single, 4),
        t_batch_warm=round(t_batch, 4),
        per_case_s=round(per_case, 4),
        amortized_ratio=round(per_case / t_single, 4),
        converged=bool(conv.all()),
        worst_relative_residual=float(
            np.max(np.asarray(solm.stats.relative_residual))
        ),
        case0_vs_single_rel=du / scale,
    )), flush=True)


if __name__ == "__main__":
    main()
