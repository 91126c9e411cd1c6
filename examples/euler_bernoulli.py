"""Fixed-fixed Euler-Bernoulli beam under uniform load — the reference's
euler_bernoulli.py demo, with the same constants (E = 210 GPa, I = 1e-6,
L = 1 m, q = 1 kN/m, 100 elements) and a 3-panel displacement / moment /
shear plot.  Verifiable against qL^4/384EI (prints the relative error).

Run:  python examples/euler_bernoulli.py [--show]
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
from fea_tpu.elements import beam

E, I, L, q = 210e9, 1e-6, 1.0, 1000.0
N_ELEM = 100


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--show", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp

    x = np.linspace(0.0, L, N_ELEM + 1)[:, None]
    elements = np.stack([np.arange(N_ELEM), np.arange(N_ELEM) + 1], axis=1)

    # consistent nodal load for uniform q (assembled from the element rule)
    fe = np.asarray(
        beam.uniform_load_vector(jnp.asarray(x), jnp.asarray(elements, jnp.int32), q)
    )
    loads = np.zeros((N_ELEM + 1, 2))
    dof = (elements[:, :, None] * 2 + np.arange(2)[None, None, :]).reshape(-1)
    np.add.at(loads.reshape(-1), dof, fe.reshape(-1))

    fixed = np.zeros((N_ELEM + 1, 2), dtype=bool)
    fixed[0] = fixed[-1] = True

    scene = ft.make_scene(
        x, elements, fixed, loads, ft.Material(E, 0.0), family="eb_beam",
        section=np.float64(I), dtype=jnp.float64,
    )
    sol = ft.solve(scene, method="dense")
    w = np.asarray(sol.displacements)[:, 0]

    exact = q * L**4 / (384 * E * I)
    print(f"midspan deflection: {w[N_ELEM // 2]:.9e} m")
    print(f"closed form qL^4/384EI: {exact:.9e} m")
    print(f"relative error: {abs(w[N_ELEM // 2] - exact) / exact:.2e}")

    M0, M1, V = (np.asarray(a) for a in ft.post.beam_moment_shear(scene, sol.displacements))
    print("end moment (exact qL^2/12 = {:.1f}):".format(q * L**2 / 12), M0[0])

    if args.show:
        import matplotlib.pyplot as plt

        ft.viz.mpl.plot_beam_results(x, w, M0, V)
        plt.show()


if __name__ == "__main__":
    main()
