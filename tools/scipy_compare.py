"""Honest CPU sparse-direct baseline at scale: SciPy spsolve vs fea-tpu.

The reference has no sparse path at all (dense K only, BASELINE.md); the
north star asks for >= 50x over SciPy spsolve at scale.  This assembles
the same voxel cantilever as bench.py into a scipy CSR matrix (reduced
to free DOFs) and times SuperLU spsolve, then runs the fea-tpu solve on
the same scene and prints one JSON line with both numbers and the
displacement agreement.

Sized for feasibility: 3D sparse direct factorization has O(N^2)-ish
fill — 1M DOF would need tens of GB — so the default compares at
16x16x160 (~140k DOF), where spsolve is already minutes.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=16)
    p.add_argument("--ny", type=int, default=16)
    p.add_argument("--nz", type=int, default=160)
    p.add_argument("--cpu", action="store_true", help="run fea-tpu on CPU too")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from fea_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    )
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    import fea_tpu as ft
    from fea_tpu.ops.structured import structured_scene

    lx = ly = 0.1
    lz = 1.0
    mat = ft.Material(E=10_000_000 * ft.units.psi, nu=0.3)
    scene, dims = structured_scene(args.nx, args.ny, args.nz, lx, ly, lz, mat, dtype=jnp.float64)
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == lz
    loads[tip, 1] = (100.0 * ft.units.lbf / ft.units.ft * lz) / tip.sum()
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed), loads, mat, dtype=jnp.float64
    )

    # --- scipy path: CSR assembly + SuperLU on the reduced system ---------
    t0 = time.perf_counter()
    op = ft.build_operator(scene, dtype=jnp.float64)
    ke = np.asarray(op.element_matrices())  # (E, 24, 24)
    elements = np.asarray(scene.elements)
    dof = (3 * elements[:, :, None] + np.arange(3)).reshape(len(elements), 24)
    rows = np.repeat(dof, 24, axis=1).ravel()
    cols = np.tile(dof, (1, 24)).ravel()
    K = sp.coo_matrix(
        (ke.ravel(), (rows, cols)), shape=(scene.n_dof, scene.n_dof)
    ).tocsr()
    free = np.asarray(scene.free_mask(jnp.float64)).reshape(-1) > 0
    Kff = K[free][:, free]
    f = np.asarray(scene.loads).reshape(-1)[free]
    t_asm = time.perf_counter() - t0
    t0 = time.perf_counter()
    u_free = spla.spsolve(Kff.tocsc(), f)
    t_solve = time.perf_counter() - t0
    u_sp = np.zeros(scene.n_dof)
    u_sp[free] = u_free
    scipy_s = t_asm + t_solve

    # --- fea-tpu path (same end-to-end definition as bench.py) ------------
    sol = ft.solve(scene, tol=1e-10)  # warm-up/compile
    t0 = time.perf_counter()
    sol = ft.solve(scene, tol=1e-10)
    jax.block_until_ready(sol.displacements)
    ours_s = time.perf_counter() - t0

    u_ours = np.asarray(sol.displacements).reshape(-1)
    agree = float(np.max(np.abs(u_ours - u_sp)) / np.max(np.abs(u_sp)))
    print(
        json.dumps(
            {
                "n_dof": scene.n_dof,
                "scipy_assembly_s": round(t_asm, 2),
                "scipy_spsolve_s": round(t_solve, 2),
                "scipy_total_s": round(scipy_s, 2),
                "fea_tpu_total_s": round(ours_s, 3),
                "speedup_vs_scipy": round(scipy_s / ours_s, 1),
                "displacement_rel_diff": agree,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
