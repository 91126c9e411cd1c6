"""Assembly tests (SURVEY.md §4 tier 2): incidence-plan scatter vs direct
scatter-add, dense/BCOO assembly vs the scipy sparse oracle, DOF maps."""
import jax.numpy as jnp
import numpy as np

import fea_tpu as ft
from fea_tpu import assembly
from fea_tpu.elements import hex8
from fea_tpu.scene import dof_ids

from oracle import assemble_sparse


def small_mesh():
    return ft.mesh.box_hex_mesh(2, 3, 4, 0.2, 0.3, 0.4)


def test_incidence_plan_equals_direct_scatter(rng):
    nodes, elements = small_mesh()
    N = nodes.shape[0]
    plan = assembly.build_incidence_plan(elements, 3, N)
    f_e = jnp.asarray(rng.normal(size=(elements.shape[0], 8, 3)), jnp.float64)
    via_plan = plan.scatter_add(f_e.reshape(-1)).reshape(N, 3)
    direct = assembly.scatter_add_direct(f_e, jnp.asarray(elements, jnp.int32), N)
    assert np.allclose(np.asarray(via_plan), np.asarray(direct), rtol=1e-14, atol=1e-14)


def test_dense_assembly_matches_scipy_oracle():
    nodes, elements = small_mesh()
    E, nu = 3e6, 0.25
    Ke = hex8.stiffness_matrices(
        jnp.asarray(nodes, jnp.float64), jnp.asarray(elements, jnp.int32), ft.Material(E, nu)
    )
    K = assembly.assemble_dense(Ke, jnp.asarray(elements, jnp.int32), 3, nodes.size)
    K_oracle = assemble_sparse(nodes, elements, E, nu).toarray()
    scale = np.max(np.abs(K_oracle))
    assert np.max(np.abs(np.asarray(K) - K_oracle)) < 1e-9 * scale


def test_bcoo_matches_dense():
    nodes, elements = small_mesh()
    Ke = hex8.stiffness_matrices(
        jnp.asarray(nodes, jnp.float64), jnp.asarray(elements, jnp.int32), ft.Material(1e6, 0.3)
    )
    elements_j = jnp.asarray(elements, jnp.int32)
    K_dense = assembly.assemble_dense(Ke, elements_j, 3, nodes.size)
    K_bcoo = assembly.assemble_bcoo(Ke, elements_j, 3, nodes.size)
    assert np.allclose(np.asarray(K_bcoo.todense()), np.asarray(K_dense), rtol=1e-12, atol=1e-6)


def test_dof_ids_layout():
    """dof map matches the reference's i*dpn+j layout (fea.py:93)."""
    elements = jnp.asarray([[2, 5], [5, 7]], jnp.int32)
    got = np.asarray(dof_ids(elements, 3))
    expected = np.array([[6, 7, 8, 15, 16, 17], [15, 16, 17, 21, 22, 23]])
    assert np.array_equal(got, expected)


def test_operator_diag_matches_dense_diag():
    nodes, elements = small_mesh()
    fixed = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, 3)
    scene = ft.make_scene(
        nodes, elements, fixed, np.zeros_like(nodes), ft.Material(1e6, 0.3), dtype=jnp.float64
    )
    op = ft.build_operator(scene, dtype=jnp.float64, uniform=False)
    assert op.kind == "hex8_matfree"
    d = np.asarray(op.diag_raw()).reshape(-1)
    K = np.asarray(op.dense())
    assert np.allclose(d, np.diag(K), rtol=1e-10)


def test_uniform_mode_detected_and_correct(rng):
    """Voxel meshes get the single-shared-Ke operator; distorted meshes
    don't. Both agree with the dense matrix."""
    nodes, elements = small_mesh()
    fixed = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, 3)
    mat = ft.Material(1e6, 0.3)
    scene = ft.make_scene(nodes, elements, fixed, np.zeros_like(nodes), mat, dtype=jnp.float64)
    op_u = ft.build_operator(scene, dtype=jnp.float64)
    assert op_u.kind == "uniform"

    warped = nodes + 0.01 * rng.normal(size=nodes.shape)
    scene_w = ft.make_scene(warped, elements, fixed, np.zeros_like(nodes), mat, dtype=jnp.float64)
    op_w = ft.build_operator(scene_w, dtype=jnp.float64)
    assert op_w.kind == "hex8_matfree"

    x = jnp.asarray(rng.normal(size=nodes.shape), jnp.float64)
    for op in (op_u, op_w):
        K = np.asarray(op.dense())
        got = np.asarray(op.apply_raw(x)).reshape(-1)
        want = K @ np.asarray(x).reshape(-1)
        assert np.max(np.abs(got - want)) < 1e-9 * max(np.max(np.abs(want)), 1.0)
