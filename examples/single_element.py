"""Single-hex8 forward / inverse round trip — the reference's pedagogical
example pair (``/root/reference/utils.py:242-348``) on the TPU-native
stack.

Forward: impose a -0.1 z-shear on the top face of a 2x2x2 cube and
compute the nodal forces f = Ke u.  Inverse: fix the bottom face, apply
those forces, and solve for the displacements.  The recovered free-node
displacements must reproduce the imposed shear ("there and back again",
utils.py:341-348) — checked numerically here instead of by eyeballing
a render.

Run:  python examples/single_element.py [--show]
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

UNIT_CUBE = np.array(
    [
        [-1, -1, -1], [+1, -1, -1], [+1, +1, -1], [-1, +1, -1],
        [-1, -1, +1], [+1, -1, +1], [+1, +1, +1], [-1, +1, +1],
    ],
    dtype=float,
)


def forward(material: ft.Material):
    """Impose u (top-face shear) -> nodal forces f = Ke u
    (reference utils.py:242-300, same E=1000, nu=0 material)."""
    from fea_tpu.elements import hex8

    ke = hex8.stiffness_matrices(
        jnp.asarray(UNIT_CUBE), jnp.arange(8, dtype=jnp.int32)[None], material
    )[0]
    displacements = np.zeros((8, 3))
    displacements[4:] += np.array([0.0, 0.0, -0.1])  # shear the top face
    forces = (np.asarray(ke) @ displacements.reshape(-1)).reshape(-1, 3)
    return displacements, forces


def inverse(material: ft.Material, forces: np.ndarray):
    """Fix bottom face, apply f -> solve for u
    (reference utils.py:305-338, via the framework's solve())."""
    elements = np.arange(8, dtype=np.int64)[None]
    fixed = np.zeros((8, 3), dtype=np.int64)
    fixed[:4] = 1  # bottom face fully constrained
    scene = ft.make_scene(UNIT_CUBE, elements, fixed, forces, material, dtype=jnp.float64)
    sol = ft.solve(scene, method="dense")
    return np.asarray(sol.displacements)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--show", action="store_true", help="render with matplotlib")
    args = p.parse_args()

    material = ft.Material(E=1000.0, nu=0.0)  # reference's single-element material
    u_imposed, forces = forward(material)
    print("imposed displacements\n", u_imposed)
    print("forces = Ke @ u\n", forces)

    u_solved = inverse(material, forces)
    print("recovered displacements\n", u_solved)

    # there and back again: the free (top) nodes recover the imposed shear
    err = np.abs(u_solved[4:] - u_imposed[4:]).max()
    print(f"round-trip max |u_solved - u_imposed| on free nodes = {err:.3e}")
    assert err < 1e-9, "round trip failed"

    if args.show:
        import matplotlib.pyplot as plt

        from fea_tpu.viz.mpl import plot_forces, plot_hex_elements

        fig = plt.figure()
        ax = fig.add_subplot(111, projection="3d")
        hexes = np.arange(8, dtype=np.int64)[None]
        plot_hex_elements(ax, UNIT_CUBE, hexes, wireframe=True)
        plot_hex_elements(ax, UNIT_CUBE + u_solved, hexes)
        plot_forces(ax, UNIT_CUBE + u_solved, forces)
        ax.set_xlabel("X"), ax.set_ylabel("Y"), ax.set_zlabel("Z")
        plt.axis("scaled")
        plt.show()


if __name__ == "__main__":
    main()
