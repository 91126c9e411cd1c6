"""L-shaped bracket: arbitrary (box-subset) topology end to end.

The L-domain's connectivity is NOT a box grid — every full-grid
detector and the canonicalization pass reject it — but it IS a subset
of one, so `ft.solve` auto-routes it through the subgrid embedding
(fea_tpu/solve/embed.py): exact lattice detection by index arithmetic,
the curvilinear variable-weight stencil on the bounding box with
exactly-zero weights in the void, and host-certified residuals.  No
reference analog (the reference's np.linalg.solve would need the dense
K); this is the round-5 answer to its own `# TODO iterative solver`
(/root/reference/fea.py:106) for meshes with no usable structure.

Run: python examples/lshape.py  (~seconds on CPU at this size)
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax

# f64 demo with a dense-LU oracle: CPU (TPU has no f64 factorizations,
# and axon ignores JAX_PLATFORMS — the config update is authoritative)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import fea_tpu as ft


def main():
    nx, nz = 6, 18
    lz = 0.1 * nz / nx
    nodes, elements = ft.mesh.l_hex_mesh(nx, nx, nz, 0.1, 0.1, lz)
    nodes = np.asarray(nodes, np.float64)
    # distort the interior so no voxel shortcut applies
    rng = np.random.default_rng(11)
    interior = (nodes[:, 2] > 1e-12) & (nodes[:, 2] < lz - 1e-12)
    nodes += 0.15 * (0.1 / nx) * rng.uniform(-1, 1, nodes.shape) * interior[:, None]

    fixed = ft.fix_where(nodes, lambda q: np.isclose(q[:, 2], 0.0), 3)
    loads = np.zeros_like(nodes)
    tip = np.isclose(nodes[:, 2], lz)
    loads[tip, 1] = 50.0 / tip.sum()

    scene = ft.make_scene(
        nodes, np.asarray(elements), fixed, loads,
        ft.Material(E=10_000_000 * ft.units.psi, nu=0.3), dtype=jnp.float64,
    )
    print(f"L-domain: {scene.n_dof} DOF, {scene.n_elements} elements "
          "(connectivity defeats every full-grid detector)")

    from fea_tpu.ops.canonical import infer_renumbered_grid, infer_subgrid_embedding

    assert infer_renumbered_grid(scene) is None
    det = infer_subgrid_embedding(scene)
    dims, lat, valid = det
    print(f"subgrid embedding detected: box {dims}, "
          f"{int(valid.sum())}/{valid.size} cells present")

    from fea_tpu.solve.embed import build_subgrid_embedded, solve_subgrid_embedded

    built = build_subgrid_embedded(scene, det)
    sol = solve_subgrid_embedded(scene, built, tol=1e-9)
    u = np.asarray(sol.displacements)
    print(f"solved: {int(sol.stats.iterations)} iterations, rel. residual "
          f"{float(sol.stats.relative_residual):.2e}, "
          f"max |u| = {np.abs(u).max():.4e} m")

    # cross-check against the element-gather dense oracle
    sol_d = ft.solve(scene, method="dense")
    err = np.abs(u - np.asarray(sol_d.displacements)).max()
    rel = err / np.abs(np.asarray(sol_d.displacements)).max()
    print(f"vs dense oracle: max relative error {rel:.2e}")
    assert rel < 1e-7

    if "--show" in sys.argv:
        import matplotlib.pyplot as plt

        from fea_tpu.viz.mpl import plot_hex_elements

        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
        mags = np.linalg.norm(u, axis=1)[np.asarray(scene.elements)].mean(axis=1)
        plot_hex_elements(
            ax, nodes + 200.0 * u, np.asarray(scene.elements), scalars=mags
        )
        plt.show()


if __name__ == "__main__":
    main()
