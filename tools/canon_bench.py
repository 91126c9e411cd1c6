"""Canonicalized-grid family benchmark (round-4, VERDICT r3 #5): the
curv_bench distorted scene with its nodes RANDOMLY RENUMBERED — the
connectivity, as given, is not any recognized grid ordering, so round 3
would have dropped it to the ~30x-slower arbitrary-topology route.
`ft.solve` now recovers the grid by pure index arithmetic
(ops/canonical.py), solves through the production curvilinear pipeline,
and permutes the solution back.  Prints one JSON line (same keys as
curv_bench, plus the canonicalization overhead); on deadline/failure a
PARTIAL JSON with completed stages (round-5, VERDICT r4 #1)."""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

from _family_util import Stages  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=24)
    p.add_argument("--ny", type=int, default=24)
    p.add_argument("--nz", type=int, default=96)
    p.add_argument("--tol", type=float, default=1e-8)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--deadline-s", type=float, default=420.0)
    args = p.parse_args()

    st = Stages("canon", deadline_s=args.deadline_s)
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
    from fea_tpu.ops.curvilinear import infer_topo_dims
    from fea_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    )

    with st.stage("scene"):
        # EXACTLY curv_bench's scene, then a random node renumbering
        nodes, elements = ft.mesh.box_hex_mesh(args.nx, args.ny, args.nz, 0.1, 0.1, 1.0)
        rng = np.random.default_rng(7)
        h = 0.1 / args.nx
        interior = (nodes[:, 2] > 0) & (nodes[:, 2] < 1.0)
        nodes = nodes + 0.25 * h * rng.uniform(-1, 1, nodes.shape) * interior[:, None]
        N = nodes.shape[0]
        pi = rng.permutation(N)
        inv = np.empty_like(pi)
        inv[pi] = np.arange(N)
        nodes_r = np.asarray(nodes)[inv]
        el_r = pi[np.asarray(elements)]
        el_r = el_r[rng.permutation(el_r.shape[0])]
        fixed = ft.fix_where(nodes_r, lambda q: np.isclose(q[:, 2], 0.0), 3)
        loads = np.zeros_like(nodes_r)
        tip = np.isclose(nodes_r[:, 2], 1.0)
        loads[tip, 1] = 1.0 / tip.sum()
        scene = ft.make_scene(
            nodes_r, el_r, fixed, loads,
            ft.Material(E=10_000_000 * ft.units.psi, nu=0.3), dtype=jnp.float64,
        )
    st.extra["n_dof"] = scene.n_dof
    st.extra["n_elements"] = scene.n_elements
    assert infer_topo_dims(scene) is None, "scene must NOT be canonical as-given"
    with st.stage("detect"):
        t0 = time.perf_counter()
        det = infer_renumbered_grid(scene)
        t_detect = time.perf_counter() - t0
    assert det is not None and det[0] == (args.nx, args.ny, args.nz)
    st.say(f"scene {scene.n_dof} DOF (renumbered); canonicalization detect {t_detect:.2f} s")

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
    # sanity: reactions balance the load in the CALLER's ordering
    react = np.asarray(sol.reactions)
    bal = abs(react[:, 1].sum()) / max(abs(loads[:, 1]).sum(), 1e-30)
    st.say(f"reaction balance {bal:.2e}")

    st.finish(dict(
        dof_per_s=scene.n_dof / t_solve,
        t_detect=t_detect,
        t_solve=t_solve,
        host_certified_relative_residual=stats["relative_residual"],
        route="canonicalized-grid -> curvilinear pipeline",
        **stats,
    ))


if __name__ == "__main__":
    main()
