"""Two-bar truss — the reference's truss.py scene, solved both linearly
and with the geometrically nonlinear Newton-Krylov path (the convergent
replacement for the reference's endless relaxation loop, truss.py:95-119).

Run:  python examples/truss.py [--show]
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

import numpy as np

import fea_tpu as ft
from fea_tpu.elements import truss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--show", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    k = 1000.0
    nodes = np.array([[0.0, 0.0], [0.0, 1.0], [1.0, 0.5]])
    members = np.array([[0, 2], [1, 2]])
    fixed = np.zeros((3, 2), dtype=bool)
    fixed[0] = fixed[1] = True
    loads = np.zeros((3, 2))
    loads[2] = [0.0, -100.0]

    scene = ft.make_scene(
        nodes, members, fixed, loads, ft.Material(1.0, 0.0),
        family="bar2d", section=np.full(2, k), dtype=jnp.float64,
    )

    lin = ft.solve(scene, method="dense")
    print("linear apex displacement:", np.asarray(lin.displacements)[2])

    u_nl, stats = ft.solve_nonlinear(scene, tol=1e-12)
    u_nl = np.asarray(u_nl)
    print("nonlinear apex displacement:", u_nl[2])
    print(f"newton iterations: {int(stats.iterations)}, residual: {float(stats.residual_norm):.2e}")

    mf = np.asarray(truss.member_forces(scene.nodes, scene.elements, jnp.asarray(u_nl), scene.section))
    print("member axial forces (tension +):", mf)

    if args.show:
        import matplotlib.pyplot as plt

        fig, (ax0, ax1) = plt.subplots(1, 2, figsize=(10, 5))
        ft.viz.mpl.plot_truss(ax0, nodes, members, loads=loads, annotate_members=True)
        ax0.set_title("undeformed + loads")
        ft.viz.mpl.plot_truss(ax1, nodes, members, displacement=u_nl, member_forces=mf)
        ax1.set_title("deformed (nonlinear), colored by axial force")
        plt.show()


if __name__ == "__main__":
    main()
