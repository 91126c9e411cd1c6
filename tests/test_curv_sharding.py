"""Z-slab GSPMD sharding of the curvilinear (variable-weight stencil)
pipeline on 8 virtual devices: apply parity, V-cycle parity, and a full
sharded fpcg solve matching the single-device solve (VERDICT r4 #4 —
the curvilinear family's multi-device path)."""
import jax
import jax.numpy as jnp
import numpy as np

import fea_tpu as ft
import fea_tpu.ops.curvilinear as cv
from fea_tpu.parallel import make_device_mesh, shard_curvilinear
from fea_tpu.solve import solve_operator_fpcg


def _distorted_scene(nx, ny, nz, *, seed=11, amp=0.2):
    """Grid-connectivity scene with smoothly distorted node positions —
    the curvilinear family's shape (reference analog: utils.py:356-376
    extrusions with nodes moved anywhere)."""
    from fea_tpu.mesh import box_hex_mesh

    mat = ft.Material(E=2.0e9, nu=0.3)
    nodes, elements = box_hex_mesh(nx, ny, nz, 0.4, 0.5, 2.0)
    rng = np.random.default_rng(seed)
    h = np.array([0.4 / nx, 0.5 / ny, 2.0 / nz])
    interior = (nodes[:, 2] > 1e-12) & (nodes[:, 2] < 2.0 - 1e-12)
    nodes = nodes + amp * h * rng.uniform(-1, 1, nodes.shape) * interior[:, None]
    fixed = np.zeros_like(nodes)
    fixed[np.abs(nodes[:, 2]) < 1e-9] = 1.0
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == nodes[:, 2].max()
    loads[tip, 1] = 3.0 / tip.sum()
    return ft.make_scene(nodes, elements, fixed, loads, mat, dtype=jnp.float64)


def _build(scene):
    dims = cv.infer_topo_dims(scene)
    op = cv.build_curv_operator(scene, dims, dtype=jnp.float64)
    free_np = 1.0 - np.asarray(scene.fixed, np.float64)
    mg = cv.build_curv_multigrid(
        np.asarray(scene.nodes), dims, free_np, scene.material, w0=op.w,
        degree=2,
    )
    return op, mg


def test_sharded_curv_apply_matches(rng):
    scene = _distorted_scene(4, 4, 15)  # Z = 16 planes, 2/device
    op, mg = _build(scene)
    mesh = make_device_mesh(8, axis_name="zc")
    op_s, mg_s, constrain = shard_curvilinear(op, mg, mesh)
    x = jnp.asarray(rng.normal(size=(scene.n_nodes, 3)), jnp.float64)
    want = np.asarray(op.apply_raw(x))
    got_arr = jax.jit(op_s.apply_raw)(constrain(x))
    got = np.asarray(got_arr)
    assert np.allclose(got, want, rtol=1e-13, atol=1e-13 * np.max(np.abs(want)))
    # the computation really ran sharded: output keeps the z-sharding
    assert len(got_arr.sharding.device_set) == 8


def test_sharded_curv_vcycle_matches(rng):
    scene = _distorted_scene(4, 4, 15)
    op, mg = _build(scene)
    mesh = make_device_mesh(8, axis_name="zc")
    op_s, mg_s, constrain = shard_curvilinear(op, mg, mesh)
    r = jnp.asarray(rng.normal(size=(scene.n_nodes, 3)), jnp.float32)
    want = np.asarray(mg(r))
    # pass the preconditioner as a pytree argument (jitting the frozen
    # dataclass instance itself would hash its array fields)
    got = np.asarray(jax.jit(lambda m, x: m(x))(mg_s, constrain(r)))
    # f32 V-cycle: sharded reduction order may differ in the last ulps
    assert np.allclose(got, want, rtol=1e-5, atol=1e-5 * np.max(np.abs(want)))


def test_sharded_curv_solve_matches_single_device():
    scene = _distorted_scene(4, 4, 15)
    op, mg = _build(scene)
    loads = scene.loads.astype(jnp.float64)
    zero = scene.prescribed_or_zero(jnp.float64)
    sol_1 = solve_operator_fpcg(op, loads, zero, mg, tol=1e-9, max_iters=120)
    mesh = make_device_mesh(8, axis_name="zc")
    op_s, mg_s, constrain = shard_curvilinear(op, mg, mesh)
    sol_8 = solve_operator_fpcg(
        op_s, constrain(loads), constrain(zero), mg_s, tol=1e-9, max_iters=120
    )
    assert bool(sol_8.stats.converged)
    u1 = np.asarray(sol_1.displacements)
    u8 = np.asarray(sol_8.displacements)
    # identical algorithm; differences only from f32-preconditioner
    # reduction-order noise steering slightly different Krylov steps
    assert np.max(np.abs(u1 - u8)) < 1e-7 * np.max(np.abs(u1))
    # both residuals certified at tol against the same operator
    r8 = np.asarray(op.apply(jnp.asarray(u8)) - op.rhs(loads, zero))
    assert np.linalg.norm(r8) <= 5e-9 * np.linalg.norm(np.asarray(op.rhs(loads, zero)))


def test_sharded_level_state_is_distributed():
    """Per-device fine-level weight state scales ~1/n_dev: the fine level
    w-field must actually be sharded, not replicated."""
    scene = _distorted_scene(4, 4, 15)
    op, mg = _build(scene)
    mesh = make_device_mesh(8, axis_name="zc")
    op_s, mg_s, _ = shard_curvilinear(op, mg, mesh)
    assert len(op_s.w.sharding.device_set) == 8
    assert not op_s.w.sharding.is_fully_replicated
    assert not mg_s.levels[0].w.sharding.is_fully_replicated
    # coarsest data replicated by design
    assert mg_s.coarse_inv.sharding.is_fully_replicated
