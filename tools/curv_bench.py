"""On-chip benchmark of the CURVILINEAR solve path (topologically
structured mesh, distorted geometry): variable-coefficient 27-offset
block stencil + Galerkin-RAP geometric multigrid FCG.

The scene is IDENTICAL to tools/unstructured_bench.py's (box mesh with
randomly distorted interior nodes, same rng seed/amplitude/loads), so
the two tools measure the same physical problem through the two routes
— unstructured gather/scatter + two-level vs the curvilinear stencil.

Round-5 hardening (VERDICT r4 #1/#2): stage heartbeats from INSIDE the
builds (per-weight-slab, per-MG-level), a SIGALRM wall deadline, and a
partial-result JSON line on any failure — the round-4 driver run of
this tool timed out at 480 s having printed one line and no JSON.
Prints one JSON line (success or partial).
"""
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
    p.add_argument("--degree", type=int, default=2, help="Chebyshev smoother degree "
                   "(V(2,2) measured best end-to-end at 812k on-chip, round 4)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--deadline-s", type=float, default=420.0,
                   help="SIGALRM wall deadline: on expiry a PARTIAL JSON "
                   "with the stages completed is printed (rc=3)")
    args = p.parse_args()

    st = Stages("curv", deadline_s=args.deadline_s)
    try:
        run(args, st)
    except SystemExit:
        raise
    except BaseException as exc:  # FamilyDeadline, backend death, ...
        st.fail(exc)


def run(args, st: Stages):
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

    with st.stage("scene"):
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
    st.extra["n_dof"] = scene.n_dof
    st.extra["n_elements"] = scene.n_elements
    st.say(f"scene {scene.n_dof} DOF")

    dims = cv.infer_topo_dims(scene)
    assert dims == (args.nx, args.ny, args.nz), dims

    with st.stage("operator_build"):
        op = cv.build_curv_operator(
            scene, dims, dtype=jnp.float64, progress=st.say
        )
        jax.block_until_ready(op.w)
    t_op = st.stage_s["operator_build"]

    with st.stage("mg_build"):
        free_np = 1.0 - np.asarray(scene.fixed, np.float64)
        mg = cv.build_curv_multigrid(
            np.asarray(scene.nodes), dims, free_np, scene.material,
            w0=op.w, degree=args.degree, progress=st.say,
        )
        jax.block_until_ready(mg.coarse_inv)
    t_mg = st.stage_s["mg_build"]
    st.say(f"multigrid levels {[l.dims for l in mg.levels]}")

    # in-run window reference (VERDICT r4 #5): the production f32
    # variable-weight kernel apply on the fine level, by repeat timing —
    # cross-run DOF/s claims normalize by this (the axon tunnel swings
    # ~1.5x between windows)
    fine_apply_ms = None
    if jax.default_backend() == "tpu":
        with st.stage("apply_probe"):
            from fea_tpu.ops.pallas_varstencil import (
                var_apply_transposed,
                var_fields_f32,
            )

            tabs = var_fields_f32(op.w.astype(jnp.float32))
            nx, ny, nz = dims
            gT = jnp.zeros((3, ny + 1, nx + 1, nz + 1), jnp.float32) + 1.0
            out = var_apply_transposed(tabs, gT)
            jax.block_until_ready(out)
            n_probe = 10
            t0 = time.perf_counter()
            for _ in range(n_probe):
                out = var_apply_transposed(tabs, out / jnp.maximum(jnp.max(jnp.abs(out)), 1.0))
            jax.block_until_ready(out)
            fine_apply_ms = (time.perf_counter() - t0) / n_probe * 1e3
        st.extra["fine_apply_ms"] = round(fine_apply_ms, 3)
        st.say(f"fine f32 kernel apply {fine_apply_ms:.2f} ms")

    best = None
    for rep in range(max(args.repeats, 2)):  # >=1 warm repeat: repeat 0
        # carries the staged-program compiles/uploads
        with st.stage(f"solve_{rep}"):
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
        st.say(f"repeat {rep}: {t:.2f} s, {stats['iterations']} iters, "
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
    st.say(f"host-certified rel residual {true_rel:.2e} (in-solve)")

    st.finish(dict(
        dof_per_s=scene.n_dof / t_solve,
        t_operator_build=t_op,
        t_mg_build=t_mg,
        t_solve=t_solve,
        host_certified_relative_residual=true_rel,
        **stats,
    ))


if __name__ == "__main__":
    main()
