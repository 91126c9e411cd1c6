"""Square-section hex8 cantilever — the reference's main demo
(``/root/reference/cubebeam.py``) on the TPU-native stack.

4x4x49 = 784 hex8 elements, E = 10^7 psi, nu = 0.3, +y face load; prints
reactions in lbf and displacements in inch like the original
(cubebeam.py:123-124), then renders the deformed mesh (x100 exaggeration,
cubebeam.py:121) with whichever viz backend is available.

Run:  python examples/cubebeam.py [--show]
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

# The demos mirror the f64 reference scripts and run host-side like the
# reference: correctness over speed (the performance path is bench.py,
# which runs f32 + wide accumulation on the accelerator).  The TPU
# backend has no f64 dense factorizations, so small f64 demos belong on
# CPU anyway.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import argparse
import time

import numpy as np

import fea_tpu as ft
from fea_tpu.materials import units

np.set_printoptions(precision=5, linewidth=200, suppress=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--show", action="store_true", help="open an interactive render")
    args = ap.parse_args()

    nodes, elements = ft.mesh.box_hex_mesh(4, 4, 49, 0.1, 0.1, 1.0)

    linear_load = 100.0 * units.lbf / units.ft
    total_load = linear_load * 1.0
    force_per_node = total_load / ((4 + 1) * (50 + 1))
    loads = np.zeros_like(nodes)
    loads[nodes[:, 1] == 0.0, 1] += force_per_node

    fixed = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, 3)
    scene = ft.make_scene(
        nodes, elements, fixed, loads, ft.Material(E=10_000_000 * units.psi, nu=0.3)
    )

    t0 = time.perf_counter()
    sol = ft.solve(scene, method="cg", tol=1e-8)
    wall = time.perf_counter() - t0
    rec = ft.utils.record_solve(scene, sol.stats, wall, method="cg")
    print(rec.to_json())

    u = np.asarray(sol.displacements)
    r = np.asarray(sol.reactions)
    print("forces / lbf:\n", r / units.lbf)
    print("displacements / inch:\n", u / units.inch)
    print("max |u| =", np.abs(u).max(), "m  (reference anchor: 3.0504e-4)")

    if args.show:
        displaced = nodes + u * 100
        if ft.viz.HAS_PYVISTA:
            import pyvista as pv

            plotter = pv.Plotter()
            ft.viz.pv.plot_deformed_overlay(plotter, nodes, elements, u, scale=100)
            plotter.show()
        else:
            import matplotlib.pyplot as plt

            fig = plt.figure()
            ax = fig.add_subplot(111, projection="3d")
            ft.viz.mpl.plot_hex_elements(ax, nodes, elements, wireframe=True)
            mags = np.linalg.norm(u, axis=1)[elements].mean(axis=1)
            ft.viz.mpl.plot_hex_elements(ax, displaced, elements, scalars=mags)
            plt.show()


if __name__ == "__main__":
    import fea_tpu.utils  # noqa: F401
    import fea_tpu.viz  # noqa: F401

    main()
