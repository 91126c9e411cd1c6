"""Multi-device tests on the 8-virtual-CPU-device mesh (SURVEY.md §4.4:
the TPU analog of a fake distributed backend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fea_tpu as ft
from fea_tpu.parallel import make_device_mesh, shard_operator, sharded_sweep


@pytest.fixture(scope="module")
def scene():
    nodes, elements = ft.mesh.box_hex_mesh(2, 2, 6, 0.1, 0.1, 0.6)
    fixed = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, 3)
    loads = np.zeros_like(nodes)
    loads[nodes[:, 2] == 0.6, 1] = 2.0
    return ft.make_scene(
        nodes, elements, fixed, loads, ft.Material(1e7, 0.3), dtype=jnp.float64
    )


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("uniform", [False, True], ids=["matfree", "uniform"])
def test_sharded_apply_matches_single_device(scene, rng, uniform):
    """Element-sharded K@u (psum of per-device partials) must be bitwise-
    close to the single-device operator — note 6*8=48 elements does NOT
    divide 8 evenly in the matfree case once padded, exercising padding."""
    op = ft.build_operator(scene, dtype=jnp.float64, uniform=uniform)
    mesh = make_device_mesh(8)
    sop = shard_operator(op, mesh)
    x = jnp.asarray(rng.normal(size=(scene.n_nodes, 3)), jnp.float64)
    got = np.asarray(sop.apply_raw(x))
    want = np.asarray(op.apply_raw(x))
    assert np.allclose(got, want, rtol=1e-12, atol=1e-12 * np.max(np.abs(want)))
    # diagonals too (pad elements must contribute zero)
    d_got = np.asarray(sop.diag_raw())
    d_want = np.asarray(op.diag_raw())
    assert np.allclose(d_got, d_want, rtol=1e-12)


def test_sharded_solve_matches_single_device(scene):
    op = ft.build_operator(scene, dtype=jnp.float64)
    mesh = make_device_mesh(8)
    sop = shard_operator(op, mesh)
    loads = scene.loads
    zero = scene.prescribed_or_zero(jnp.float64)
    sol_single = ft.solve_operator(op, loads, zero, tol=1e-11)
    sol_sharded = ft.solve_operator(sop, loads, zero, tol=1e-11)
    u_s = np.asarray(sol_single.displacements)
    u_m = np.asarray(sol_sharded.displacements)
    assert np.max(np.abs(u_s - u_m)) < 1e-9 * np.max(np.abs(u_s))
    assert bool(sol_sharded.stats.converged)


def test_padding_with_uneven_shard_count(scene, rng):
    """7 devices does not divide 48 elements — padding path must stay exact."""
    op = ft.build_operator(scene, dtype=jnp.float64, uniform=False)
    mesh = make_device_mesh(7)
    sop = shard_operator(op, mesh)
    x = jnp.asarray(rng.normal(size=(scene.n_nodes, 3)), jnp.float64)
    assert np.allclose(
        np.asarray(sop.apply_raw(x)), np.asarray(op.apply_raw(x)), rtol=1e-12
    )


def test_sharded_sweep_data_parallel(scene):
    """8 load cases sharded across 8 devices; each case solved independently
    and linearly scaled loads give linearly scaled displacements."""
    op = ft.build_operator(scene, dtype=jnp.float64, uniform=False)
    scales = jnp.arange(1.0, 9.0, dtype=jnp.float64)
    loads_batch = scales[:, None, None] * scene.loads[None]
    zero = scene.prescribed_or_zero(jnp.float64)

    def solve_one(loads):
        return ft.solve_displacements(op, loads, zero, tol=1e-11)

    mesh = make_device_mesh(8, axis_name="batch")
    u_batch = np.asarray(sharded_sweep(solve_one, loads_batch, mesh))
    assert u_batch.shape[0] == 8
    for i in range(1, 8):
        assert np.allclose(u_batch[i], (i + 1) * u_batch[0], rtol=1e-7)
