"""Batched design sweep — thousands of solves per chip via vmap
(SURVEY.md §2 "Batch/sweep parallel"; the reference runs one scene per
process).

Sweeps the cantilever's load magnitude AND its Young's modulus in one
vmapped solve each: the operator is rebuilt per material inside the
vmap (closed over the batched Ke), while the topology/index plans are
shared — the pattern that makes parametric studies one jax.vmap away.
On multi-device hardware the same batch shards across the mesh with
fea_tpu.parallel.sharded_sweep (tested on 8 virtual devices).

Run:  python examples/sweep.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import fea_tpu as ft


def main() -> None:
    mat = ft.Material(E=10_000_000 * ft.units.psi, nu=0.3)
    nodes, elements = ft.mesh.box_hex_mesh(4, 4, 24, 0.1, 0.1, 0.5)
    fixed = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, 3)
    base_loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == 0.5
    base_loads[tip, 1] = 1000.0 / tip.sum()
    scene = ft.make_scene(nodes, elements, fixed, base_loads, mat, dtype=jnp.float64)
    op = ft.build_operator(scene, dtype=jnp.float64)
    zero = scene.prescribed_or_zero(jnp.float64)

    # --- sweep 1: load magnitude (linear: tips scale exactly) -------------
    scales = jnp.linspace(0.5, 4.0, 8)
    loads_batch = scales[:, None, None] * scene.loads[None]
    u_batch = jax.vmap(
        lambda l: ft.solve_displacements(op, l, zero, tol=1e-10, max_iters=20000)
    )(loads_batch)
    tips = np.asarray(u_batch)[:, tip, 1].mean(axis=1)
    print("load scale -> tip deflection (m):")
    for s, t in zip(np.asarray(scales), tips):
        print(f"  {s:4.2f} x  ->  {t: .6e}")
    lin_err = np.max(np.abs(tips / tips[0] - np.asarray(scales) / float(scales[0])))
    print(f"linearity check: max deviation {lin_err:.2e} (exact for a linear model)")
    assert lin_err < 1e-8

    # --- sweep 2: material stiffness (tip ~ 1/E) --------------------------
    Es = jnp.linspace(0.5, 2.0, 4) * mat.E

    # materials enter through operator leaves -> rebuild per E on host,
    # stack, and solve the batch in one vmapped program
    ops = [ft.build_operator(
        ft.make_scene(nodes, elements, fixed, base_loads, ft.Material(E=float(E), nu=0.3), dtype=jnp.float64),
        dtype=jnp.float64,
    ) for E in np.asarray(Es)]
    op_batch = jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves), *ops)
    u_E = jax.vmap(
        lambda o: ft.solve_displacements(o, scene.loads, zero, tol=1e-10, max_iters=20000)
    )(op_batch)
    tips_E = np.asarray(u_E)[:, tip, 1].mean(axis=1)
    print("E sweep -> tip deflection (m):")
    for E, t in zip(np.asarray(Es), tips_E):
        print(f"  E={E:.3e}  ->  {t: .6e}")
    inv_err = np.max(np.abs(tips_E * np.asarray(Es) / (tips_E[0] * float(Es[0])) - 1.0))
    print(f"1/E scaling check: max deviation {inv_err:.2e}")
    assert inv_err < 1e-6

    # --- sweep 3: many load CASES through the production multigrid --------
    # ft.solve_many builds the operator/hierarchy once and runs all k
    # flexible-PCG solves in ONE batched jitted program — the flagship-
    # class path for the reference's own one-mesh-many-scenes pattern
    # (amortizes build + compile + per-dispatch tunnel latency; measured
    # ~0.1x the per-case cost of cold solves at 56k DOF on-chip).
    rng = np.random.default_rng(3)
    k = 8
    cases = np.zeros((k, nodes.shape[0], 3))
    for i in range(k):
        cases[i, tip, 1] = rng.uniform(0.5, 2.0) * 1000.0 / tip.sum()
        cases[i, tip, 0] = rng.uniform(-1.0, 1.0) * 500.0 / tip.sum()
    sol_many = ft.solve_many(scene, cases, tol=1e-9)
    tips_many = np.asarray(sol_many.displacements)[:, tip, 1].mean(axis=1)
    print("8 load cases, one batched multigrid program:")
    for i, t in enumerate(tips_many):
        it = int(np.asarray(sol_many.stats.iterations)[i])
        print(f"  case {i}: tip {t: .6e} m  ({it} iterations)")
    assert bool(np.all(np.asarray(sol_many.stats.converged)))


if __name__ == "__main__":
    main()
