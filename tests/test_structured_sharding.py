"""Z-slab GSPMD sharding of the structured operator on 8 virtual devices:
must compile, execute, and match the single-device solve exactly."""
import jax
import jax.numpy as jnp
import numpy as np

import fea_tpu as ft
from fea_tpu.ops.structured import build_structured_operator, structured_scene
from fea_tpu.parallel import make_device_mesh, shard_structured_operator


def make_case(nz=31):  # (nz+1)*25 nodes = 800, divisible by 8 devices
    mat = ft.Material(E=1e9, nu=0.3)
    scene, dims = structured_scene(4, 4, nz, 0.1, 0.1, 1.0, mat, dtype=jnp.float64)
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == 1.0
    loads[tip, 1] = 5.0 / tip.sum()
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed), loads, mat,
        dtype=jnp.float64,
    )
    return scene, dims


def test_sharded_structured_apply_matches(rng):
    scene, dims = make_case()
    op = build_structured_operator(scene, dims, dtype=jnp.float64)
    mesh = make_device_mesh(8, axis_name="z")
    op_s, constrain = shard_structured_operator(op, mesh)
    x = jnp.asarray(rng.normal(size=(scene.n_nodes, 3)), jnp.float64)
    want = np.asarray(op.apply_raw(x))
    got_arr = jax.jit(op_s.apply_raw)(constrain(x))
    got = np.asarray(got_arr)
    assert np.allclose(got, want, rtol=1e-13, atol=1e-13 * np.max(np.abs(want)))
    # the computation really ran sharded: output keeps the z-sharding
    assert len(got_arr.sharding.device_set) == 8


def test_sharded_structured_solve_matches(scope="module"):
    scene, dims = make_case()
    op = build_structured_operator(scene, dims, dtype=jnp.float64)
    mesh = make_device_mesh(8, axis_name="z")
    op_s, constrain = shard_structured_operator(op, mesh)
    zero = scene.prescribed_or_zero(jnp.float64)
    sol_1 = ft.solve_operator(op, scene.loads, zero, tol=1e-11)
    sol_8 = ft.solve_operator(op_s, constrain(scene.loads), constrain(zero), tol=1e-11)
    u1 = np.asarray(sol_1.displacements)
    u8 = np.asarray(sol_8.displacements)
    assert bool(sol_8.stats.converged)
    assert np.max(np.abs(u1 - u8)) < 1e-9 * np.max(np.abs(u1))


def test_sharded_fpcg_multigrid_matches_single_device():
    """The flagship production solver, multichip: f64 fpcg on the z-slab
    sharded operator with the f32 multigrid V-cycle preconditioner must
    converge and match the single-device solve."""
    from fea_tpu.ops.multigrid import build_multigrid

    scene, dims = make_case()
    op = build_structured_operator(scene, dims, dtype=jnp.float64)
    mg = build_multigrid(op.astype(jnp.float32), dtype=jnp.float32)
    zero = scene.prescribed_or_zero(jnp.float64)

    sol_1 = ft.solve_operator_fpcg(op, scene.loads, zero, mg, tol=1e-10, max_iters=100)

    mesh = make_device_mesh(8, axis_name="z")
    op_s, constrain = shard_structured_operator(op, mesh)
    sol_8 = ft.solve_operator_fpcg(
        op_s, constrain(scene.loads), constrain(zero), mg, tol=1e-10, max_iters=100
    )
    assert bool(sol_8.stats.converged)
    u1 = np.asarray(sol_1.displacements)
    u8 = np.asarray(sol_8.displacements)
    assert np.max(np.abs(u1 - u8)) < 1e-8 * np.max(np.abs(u1))
    assert int(sol_8.stats.iterations) <= int(sol_1.stats.iterations) + 3
