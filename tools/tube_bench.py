"""On-chip scale measurement for the extruded (tube) path — VERDICT r2 #5.

Builds the reference's tube geometry (/root/reference/fea.py:28-65,
utils.py:356-376 extrusion) at >= 500k DOF and solves it to 1e-8 with
``fea_tpu.solve.solve_extruded`` (semi-structured MXU operator + z-semi-
coarsened multigrid, ops/extruded*.py).  Prints one JSON line; on
deadline/failure a PARTIAL JSON with the stages completed (round-5).

Usage: python tools/tube_bench.py [--segments 256] [--layers 384]
       [--repeats 2] [--cpu]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from _family_util import Stages  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--segments", type=int, default=256)
    p.add_argument("--layers", type=int, default=384, help="element layers; k*2^m, k<=16")
    p.add_argument("--tol", type=float, default=1e-8)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--degree", type=int, default=3, help="Chebyshev smoother degree")
    p.add_argument("--no-section-coarse", action="store_true")
    p.add_argument("--section-aggregates", type=int, default=64)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--deadline-s", type=float, default=420.0)
    args = p.parse_args()

    st = Stages("tube", deadline_s=args.deadline_s)
    try:
        run(args, st)
    except SystemExit:
        raise
    except BaseException as exc:
        st.fail(exc)


def run(args, st: Stages) -> None:
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import fea_tpu as ft
    from fea_tpu.ops.extruded import extruded_scene_tube
    from fea_tpu.solve import build_extruded, solve_extruded
    from fea_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    )

    with st.stage("scene"):
        mat = ft.Material(E=10_000_000 * ft.units.psi, nu=0.3)
        # reference proportions: 4 in outer / 3.9 in inner radius, 2 ft long
        r_out = 4 * ft.units.inch
        r_in = 3.9 * ft.units.inch
        length = 2 * ft.units.ft
        scene, detected = extruded_scene_tube(
            args.segments, args.layers, r_in, r_out, length, mat, dtype=jnp.float64
        )
        nodes = np.asarray(scene.nodes)
        loads = np.zeros_like(nodes)
        # cosine-weighted downward load on the lower outer tip ring (the
        # reference's L1 pattern, tile-corrected), applied at the free end
        tip = nodes[:, 2] == nodes[:, 2].max()
        r_xy = np.hypot(nodes[:, 0], nodes[:, 1])
        outer = np.abs(r_xy - r_out) < 1e-9
        lower = nodes[:, 1] < 0
        sel = tip & outer & lower
        w = np.cos(0.5 * np.pi * nodes[sel, 0] / r_out)
        loads[sel, 1] = -1000.0 * w / w.sum()
        scene = ft.make_scene(
            nodes, np.asarray(scene.elements), np.asarray(scene.fixed), loads, mat,
            dtype=jnp.float64,
        )
    st.extra["n_dof"] = scene.n_dof
    st.extra["n_elements"] = scene.n_elements
    st.say(f"scene: {scene.n_dof} DOF, {scene.n_elements} elements")

    # one-time host setup (operator + z-semicoarsened hierarchy: f64
    # section-block inverses + Thomas factors), then solve repeatedly —
    # the production shape for many load cases on one mesh
    with st.stage("hierarchy_setup"):
        prebuilt = build_extruded(
            scene, detected, degree=args.degree,
            section_coarse=not args.no_section_coarse,
            section_aggregates=args.section_aggregates,
        )
    setup_s = st.stage_s["hierarchy_setup"]

    with st.stage("warmup"):
        t0 = time.perf_counter()
        sol = solve_extruded(scene, detected, tol=args.tol, degree=args.degree, prebuilt=prebuilt)
        jax.block_until_ready(sol.displacements)
        warm_s = time.perf_counter() - t0
    st.say(f"warmup (incl. compile): {warm_s:.1f} s, "
           f"{int(sol.stats.iterations)} iters, rel_res "
           f"{float(sol.stats.relative_residual):.3e}")

    times = []
    for rep in range(args.repeats):
        with st.stage(f"solve_{rep}"):
            t0 = time.perf_counter()
            sol = solve_extruded(scene, detected, tol=args.tol, degree=args.degree, prebuilt=prebuilt)
            jax.block_until_ready(sol.displacements)
            times.append(time.perf_counter() - t0)
    best = min(times) if times else warm_s

    u = np.asarray(sol.displacements)
    st.finish({
        "metric": "tube_extruded_solve_s",
        "value": round(best, 3),
        "unit": "s",
        "dof_per_s": round(scene.n_dof / best, 1),
        "iterations": int(sol.stats.iterations),
        "relative_residual": float(sol.stats.relative_residual),
        "converged": bool(sol.stats.converged),
        "tip_uy_m": float(u[tip, 1].mean()),
        "hierarchy_setup_s": round(setup_s, 3),
        "backend": jax.default_backend(),
    })
    if not bool(sol.stats.converged):
        sys.exit(1)


if __name__ == "__main__":
    main()
