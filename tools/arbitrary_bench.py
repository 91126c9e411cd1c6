"""Arbitrary-topology family benchmark (round-4, VERDICT r3 #5): an
L-shaped (step) domain whose connectivity is NOT any renumbered box
grid — every full-grid detector and the canonicalization pass reject
it.  Since round 5 `ft.solve` auto-routes such box-SUBSET meshes through
the subgrid EMBEDDING (solve/embed.py): the curvilinear stencil pipeline
on the bounding box with exactly-zero weights in the void — the
TPU-native answer to the ~150M elem/s device gather rate that walls any
index-based apply.  `FEA_TPU_NO_EMBED=1` instead records the honest
no-structure route (node-major BCSR + smoothed-aggregation AMG,
ops/amg.py — the fallback for meshes that embed in no box).  Prints one
JSON line; on deadline/failure a PARTIAL JSON with completed stages."""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from _family_util import Stages  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=20)
    p.add_argument("--ny", type=int, default=20)
    p.add_argument("--nz", type=int, default=72)
    p.add_argument("--tol", type=float, default=1e-8)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--deadline-s", type=float, default=420.0)
    args = p.parse_args()

    st = Stages("arb", deadline_s=args.deadline_s)
    try:
        run(args, st)
    except SystemExit:
        raise
    except BaseException as exc:
        st.fail(exc)


def run(args, st: Stages):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    import fea_tpu as ft
    from fea_tpu.ops.canonical import infer_renumbered_grid
    from fea_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    )

    with st.stage("scene"):
        nodes, elements = ft.mesh.l_hex_mesh(
            args.nx, args.ny, args.nz, 0.1, 0.1, 0.1 * args.nz / args.nx
        )
        nodes = np.asarray(nodes, np.float64)
        rng = np.random.default_rng(7)
        h = 0.1 / args.nx
        lz = 0.1 * args.nz / args.nx
        interior = (nodes[:, 2] > 1e-12) & (nodes[:, 2] < lz - 1e-12)
        nodes = nodes + 0.2 * h * rng.uniform(-1, 1, nodes.shape) * interior[:, None]
        fixed = ft.fix_where(nodes, lambda q: np.isclose(q[:, 2], 0.0), 3)
        loads = np.zeros_like(nodes)
        tip = np.isclose(nodes[:, 2], lz)
        loads[tip, 1] = 1.0 / max(tip.sum(), 1)
        scene = ft.make_scene(
            nodes, np.asarray(elements), fixed, loads,
            ft.Material(E=10_000_000 * ft.units.psi, nu=0.3), dtype=jnp.float64,
        )
    assert infer_renumbered_grid(scene) is None, (
        "the L-domain must defeat canonicalization"
    )
    st.extra["n_dof"] = scene.n_dof
    st.extra["n_elements"] = scene.n_elements
    st.say(f"L-domain scene {scene.n_dof} DOF, {scene.n_elements} elements "
           "(non-grid topology)")

    best = None
    for rep in range(max(args.repeats, 2)):
        with st.stage(f"solve_{rep}"):
            t0 = time.perf_counter()
            sol = ft.solve(scene, tol=args.tol)
            jax.block_until_ready(sol.displacements)
            t = time.perf_counter() - t0
        stats = dict(
            iterations=int(sol.stats.iterations),
            relative_residual=float(sol.stats.relative_residual),
            converged=bool(sol.stats.converged),
        )
        st.say(f"repeat {rep}: {t:.2f} s, {stats['iterations']} iters, "
               f"res {stats['relative_residual']:.2e}")
        if best is None or t < best[0]:
            best = (t, stats, sol)
    t_solve, stats, sol = best

    st.finish(dict(
        dof_per_s=scene.n_dof / t_solve,
        t_solve=t_solve,
        route=(
            "arbitrary-amg-bcsr" if os.environ.get("FEA_TPU_NO_EMBED")
            else "subgrid-embedded-stencil"
        ),
        **stats,
    ))


if __name__ == "__main__":
    main()
