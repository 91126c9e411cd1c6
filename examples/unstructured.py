"""Distorted (genuinely unstructured) hex8 cantilever — the mesh family
the reference cannot scale at all and fea-tpu's structured/extruded fast
paths cannot claim.

Every interior node is randomly perturbed, so neither the voxel-stencil
detector nor the extrusion detector fires and the solve exercises the
general path: gather/scatter matrix-free operator + two-level
preconditioned CG (per-aggregate rigid-body-mode coarse space + nodal
3x3 block-Jacobi, ops/twolevel.py).  The demo prints the iteration
counts of scalar Jacobi vs block vs two-level on the same scene — the
3-10x cut is the capability being demonstrated — and validates the
two-level solution against a dense solve.

Run:  python examples/unstructured.py [--show]
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import argparse

import jax.numpy as jnp
import numpy as np

import fea_tpu as ft
from fea_tpu.ops.twolevel import build_two_level, build_two_level_cheb
from fea_tpu.solvers.cg import fpcg, pcg

np.set_printoptions(precision=5, linewidth=200, suppress=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--show", action="store_true", help="open an interactive render")
    args = ap.parse_args()

    nx, ny, nz = 4, 4, 30
    nodes, elements = ft.mesh.box_hex_mesh(nx, ny, nz, 0.1, 0.1, 1.0)
    rng = np.random.default_rng(7)
    h = 0.1 / nx
    interior = (nodes[:, 2] > 0) & (nodes[:, 2] < 1.0)
    nodes = nodes + 0.25 * h * rng.uniform(-1, 1, nodes.shape) * interior[:, None]

    fixed = ft.fix_where(nodes, lambda p: np.isclose(p[:, 2], 0.0), dofs_per_node=3)
    loads = np.zeros_like(nodes)
    tip = np.isclose(nodes[:, 2], 1.0)
    loads[tip, 1] = 100.0 / tip.sum()

    scene = ft.make_scene(nodes, elements, fixed, loads,
                          ft.Material(E=1e7, nu=0.3), dtype=jnp.float64)
    op = ft.build_operator(scene, dtype=jnp.float64)
    zero = jnp.zeros_like(scene.loads)
    b = op.rhs(scene.loads, zero)

    print(f"{scene.n_dof} DOF, {elements.shape[0]} distorted hex8 elements "
          f"(min detJ = {float(op.geom.min_detj):.3e} > 0)")

    sol_j = ft.solve_operator(op, scene.loads, zero, method="cg",
                              tol=1e-8, max_iters=50_000, precondition=True)
    sol_b = ft.solve_operator(op, scene.loads, zero, method="cg",
                              tol=1e-8, max_iters=50_000, precondition="block")
    tl = build_two_level(op, scene.nodes)
    u_add, stats_add = pcg(op.apply, b, precond=tl, tol=1e-8, max_iters=50_000)
    # production route (solve() auto): f64 flexible-CG recurrence, all
    # smoothing/coarse work in f32 inside the preconditioner
    tlc = build_two_level_cheb(op, scene.nodes)
    u, stats = fpcg(op.apply, b, precond=tlc, tol=1e-8, max_iters=50_000)

    print(f"scalar Jacobi : {int(sol_j.stats.iterations):5d} iterations")
    print(f"block-Jacobi  : {int(sol_b.stats.iterations):5d} iterations")
    print(f"two-level     : {int(stats_add.iterations):5d} iterations "
          f"({tl.n_aggs} aggregates)")
    print(f"cheb two-level: {int(stats.iterations):5d} iterations "
          f"(fpcg, f32 smoothing, rel. residual "
          f"{float(stats.relative_residual):.2e})")

    sol_d = ft.solve_operator(op, scene.loads, zero, method="dense")
    err = float(jnp.max(jnp.abs(u - sol_d.displacements))
                / jnp.max(jnp.abs(sol_d.displacements)))
    print(f"cheb two-level vs dense solve: max relative error {err:.2e}")
    assert err < 1e-6
    err_add = float(jnp.max(jnp.abs(u_add - u)) / jnp.max(jnp.abs(u)))
    print(f"additive vs cheb two-level agreement: {err_add:.2e}")
    assert err_add < 1e-6

    if args.show:
        import fea_tpu.viz

        u_np = np.asarray(u)
        if ft.viz.HAS_PYVISTA:
            import pyvista as pv

            plotter = pv.Plotter()
            ft.viz.pv.plot_deformed_overlay(plotter, nodes, elements, u_np, scale=100)
            plotter.show()
        else:
            import matplotlib.pyplot as plt

            fig = plt.figure()
            ax = fig.add_subplot(111, projection="3d")
            ft.viz.mpl.plot_hex_elements(ax, nodes, elements, wireframe=True)
            mags = np.linalg.norm(u_np, axis=1)
            ft.viz.mpl.plot_hex_elements(ax, nodes + 100 * u_np, elements, scalars=mags)
            plt.show()

    return u


if __name__ == "__main__":
    main()
