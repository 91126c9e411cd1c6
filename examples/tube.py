"""Hollow-tube hex8 cantilever — the reference's fea.py demo
(``/root/reference/fea.py``) on the TPU-native stack.

26-segment annulus (4 in outer / 3.9 in inner radius) extruded to 50
layers (1,274 elements, 7,800 DOF), cosine-distributed downward load on
the lower outer surface, root fixed.  The per-layer load replication uses
``np.tile`` — the reference's ``repeat`` (fea.py:71) scrambles the
layer-major node ordering (SURVEY.md §2 L1); intent is preserved, defect
is not.

Run:  python examples/tube.py [--show]
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
    ap.add_argument("--show", action="store_true")
    ap.add_argument("--layers", type=int, default=50)
    args = ap.parse_args()

    n_seg = 26
    outer = 4 * units.inch
    nodes2d, quads = ft.mesh.annulus_section(n_seg, 3.9 * units.inch, outer)

    forces2d = np.zeros_like(nodes2d)
    sel = slice(n_seg, (3 * n_seg) // 2)
    forces2d[sel, 1] = -np.cos(np.pi / 2 * nodes2d[sel, 0] / outer) * np.pi / 4 / outer

    nodes, elements = ft.mesh.extrude_quads(
        nodes2d, quads, np.linspace(0.0, 1.0, args.layers)
    )
    loads = np.zeros_like(nodes)
    loads[:, :2] = np.tile(forces2d, (args.layers, 1))

    fixed = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, 3)
    scene = ft.make_scene(
        nodes, elements, fixed, loads, ft.Material(E=10_000_000 * units.psi, nu=0.3)
    )

    t0 = time.perf_counter()
    sol = ft.solve(scene, method="cg", tol=1e-8)
    wall = time.perf_counter() - t0
    print(ft.utils.record_solve(scene, sol.stats, wall).to_json())

    u = np.asarray(sol.displacements)
    print("forces / lbf:\n", np.asarray(sol.reactions) / units.lbf)
    print("displacements / inch:\n", u / units.inch)

    if args.show:
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
            ft.viz.mpl.plot_hex_elements(ax, nodes + u * 100, elements, scalars=mags)
            plt.show()


if __name__ == "__main__":
    main()
