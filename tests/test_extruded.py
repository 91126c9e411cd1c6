"""Extruded (semi-structured) operator: exact equivalence with the
unstructured operator on the same mesh, detection, and end-to-end solve.

The extruded path is the scale story for the reference's tube family
(/root/reference/fea.py:28-65, utils.py:356-376) — same math as the
generic element-by-element operator, with z-structure exploited.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import fea_tpu as ft
from fea_tpu.ops.extruded import (
    build_extruded_operator,
    extruded_scene_tube,
    infer_extruded,
)

MAT = ft.Material(2e6, 0.3)


@pytest.fixture(scope="module")
def tube():
    scene, detected = extruded_scene_tube(10, 6, 0.08, 0.1, 0.5, MAT, dtype=jnp.float64)
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == nodes[:, 2].max()
    loads[tip, 1] = 1.0 / tip.sum()
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed), loads, MAT,
        dtype=jnp.float64,
    )
    return scene, detected


def test_extruded_apply_equals_unstructured(tube, rng):
    scene, detected = tube
    op_e = build_extruded_operator(scene, detected, dtype=jnp.float64)
    op_u = ft.build_operator(scene, dtype=jnp.float64, uniform=False)
    x = jnp.asarray(rng.normal(size=(scene.n_nodes, 3)), jnp.float64)
    got = np.asarray(op_e.apply_raw(x))
    want = np.asarray(op_u.apply_raw(x))
    assert np.max(np.abs(got - want)) < 1e-9 * np.max(np.abs(want))


def test_extruded_diag_equals_unstructured(tube):
    scene, detected = tube
    op_e = build_extruded_operator(scene, detected, dtype=jnp.float64)
    op_u = ft.build_operator(scene, dtype=jnp.float64, uniform=False)
    assert np.allclose(
        np.asarray(op_e.diag_raw()), np.asarray(op_u.diag_raw()), rtol=1e-10
    )


def test_infer_extruded_detects_tube(tube):
    scene, detected = tube
    inferred = infer_extruded(scene)
    assert inferred is not None
    quads, n2, L = inferred
    assert (n2, L) == (detected[1], detected[2])
    assert np.array_equal(quads, detected[0])


def test_infer_extruded_rejects_non_extruded():
    # voxel box IS an extrusion (of the quad grid) — but a z-graded one is not
    from fea_tpu.mesh import extrude_quads, generate_quad_grid

    nodes2d, quads = generate_quad_grid(2, 2, 0.1, 0.1)
    z = np.array([0.0, 0.1, 0.3, 0.7])  # non-uniform spacing
    nodes, elements = extrude_quads(nodes2d, quads, z)
    fix = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, 3)
    scene = ft.make_scene(nodes, elements, fix, np.zeros_like(nodes), MAT, dtype=jnp.float64)
    assert infer_extruded(scene) is None


def test_extruded_solve_matches_unstructured(tube):
    scene, detected = tube
    op_e = build_extruded_operator(scene, detected, dtype=jnp.float64)
    zero = scene.prescribed_or_zero(jnp.float64)
    sol_e = ft.solve_operator(op_e, scene.loads, zero, tol=1e-11)
    sol_u = ft.solve(scene, method="cg", tol=1e-11)
    u_e = np.asarray(sol_e.displacements)
    u_u = np.asarray(sol_u.displacements)
    assert bool(sol_e.stats.converged)
    assert np.max(np.abs(u_e - u_u)) < 1e-8 * np.max(np.abs(u_u))


def test_extruded_mg_solver_matches_cg():
    """z-semicoarsened MG-FCG == Jacobi-CG ground truth on a mesh deep
    enough for a 2-level hierarchy (32 -> 16 element layers)."""
    from fea_tpu.solve import solve_extruded

    scene, detected = extruded_scene_tube(8, 32, 0.08, 0.1, 0.6, MAT, dtype=jnp.float64)
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == nodes[:, 2].max()
    loads[tip, 1] = 1.0 / tip.sum()
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed), loads, MAT,
        dtype=jnp.float64,
    )
    sol = solve_extruded(scene, detected, tol=1e-10)
    assert bool(sol.stats.converged)
    assert int(sol.stats.iterations) <= 40  # Jacobi-CG needs hundreds here
    u_cg = np.asarray(ft.solve(scene, method="cg", tol=1e-10).displacements)
    u_mg = np.asarray(sol.displacements)
    # both are tol=1e-10 iterates; the dd pair-space recurrence stops
    # nearer the threshold than all-f64 fpcg, so compare at the level the
    # tolerance actually guarantees (~cond * tol), not at f64 roundoff
    assert np.max(np.abs(u_mg - u_cg)) < 3e-8 * np.max(np.abs(u_cg))


def test_extruded_mg_prescribed_exact():
    from fea_tpu.solve import solve_extruded

    scene, detected = extruded_scene_tube(8, 16, 0.08, 0.1, 0.3, MAT, dtype=jnp.float64)
    nodes = np.asarray(scene.nodes)
    presc = np.zeros_like(nodes)
    root = nodes[:, 2] == 0.0
    presc[root, 0] = 1e-4
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed),
        np.zeros_like(nodes), MAT, prescribed=presc, dtype=jnp.float64,
    )
    sol = solve_extruded(scene, detected, tol=1e-10)
    assert bool(sol.stats.converged)
    u = np.asarray(sol.displacements)
    fixed = np.asarray(scene.fixed) > 0
    assert np.array_equal(u[fixed], presc[fixed])
    # with no loads, the tube rigidly follows the imposed root translation
    assert np.max(np.abs(u[:, 0] - 1e-4)) < 1e-9


def test_extruded_mg_device_build_matches_host():
    """The on-device hierarchy build (f32 LU + Newton inverses, scatter-
    assembled section blocks, scanned Thomas chain) must agree with the
    all-host f64 NumPy oracle: same special layers, certified lam_max
    within the bound's own inflation band, and an equivalent
    preconditioner (solves converge to the same answer in ~the same
    iterations)."""
    from fea_tpu.ops.extruded import build_extruded_operator
    from fea_tpu.ops.extruded_mg import build_extruded_multigrid
    from fea_tpu.solve import solve_extruded

    scene, detected = extruded_scene_tube(8, 32, 0.08, 0.1, 0.6, MAT, dtype=jnp.float64)
    mg_h = build_extruded_multigrid(scene, detected, device_build=False)
    mg_d = build_extruded_multigrid(scene, detected, device_build=True)
    assert len(mg_h.levels) == len(mg_d.levels)
    for lh, ld in zip(mg_h.levels, mg_d.levels):
        assert lh.special_idx == ld.special_idx
        lam_h, lam_d = float(lh.lam_max), float(ld.lam_max)
        # same certified bound up to the f32 evaluation/diag-deviation slack
        assert abs(lam_d - lam_h) < 5e-3 * lam_h
        scale = float(jnp.max(jnp.abs(lh.minv_interior)))
        assert float(jnp.max(jnp.abs(lh.minv_interior - ld.minv_interior))) < 1e-4 * scale
    assert float(
        jnp.max(jnp.abs(mg_h.thomas_uinv - mg_d.thomas_uinv))
    ) < 1e-4 * float(jnp.max(jnp.abs(mg_h.thomas_uinv)))

    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == nodes[:, 2].max()
    loads[tip, 1] = 1.0 / tip.sum()
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed), loads, MAT,
        dtype=jnp.float64,
    )
    op = build_extruded_operator(scene, detected, dtype=jnp.float64)
    s_h = solve_extruded(scene, detected, tol=1e-10, prebuilt=(op, mg_h))
    s_d = solve_extruded(scene, detected, tol=1e-10, prebuilt=(op, mg_d))
    assert bool(s_d.stats.converged)
    assert abs(int(s_d.stats.iterations) - int(s_h.stats.iterations)) <= 2
    u_h, u_d = np.asarray(s_h.displacements), np.asarray(s_d.displacements)
    # two tol=1e-10 iterates under slightly different preconditioners:
    # compare at the accuracy the tolerance guarantees, not f64 roundoff
    assert np.max(np.abs(u_d - u_h)) < 3e-8 * np.max(np.abs(u_h))


def test_extruded_sharded_solve_matches_single_device():
    """Layer-slab GSPMD sharding of the extruded pipeline on 8 virtual
    devices: the apply runs sharded (±1-layer halos inserted by the
    partitioner) and the full MG-FCG solve matches single-device."""
    import jax

    from fea_tpu.ops.extruded import build_extruded_operator
    from fea_tpu.parallel import make_device_mesh, shard_extruded
    from fea_tpu.solve import build_extruded, solve_extruded

    # 33 node layers x 16 section nodes = 528 nodes; rows divide by 8
    scene, detected = extruded_scene_tube(8, 32, 0.08, 0.1, 0.6, MAT, dtype=jnp.float64)
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == nodes[:, 2].max()
    loads[tip, 1] = 1.0 / tip.sum()
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed), loads, MAT,
        dtype=jnp.float64,
    )
    op, mg = build_extruded(scene, detected)
    mesh = make_device_mesh(8, axis_name="zl")
    op_s, mg_s, constrain = shard_extruded(op, mg, mesh)

    x = jnp.asarray(np.linspace(-1.0, 1.0, op.n_dof).reshape(-1, 3), jnp.float64)
    want = np.asarray(op.apply_raw(x))
    got_arr = jax.jit(op_s.apply_raw)(constrain(x))
    assert np.allclose(np.asarray(got_arr), want, rtol=1e-13,
                       atol=1e-13 * np.max(np.abs(want)))
    assert len(got_arr.sharding.device_set) == 8

    sol_1 = solve_extruded(scene, detected, tol=1e-10, prebuilt=(op, mg))
    sol_8 = solve_extruded(scene, detected, tol=1e-10, prebuilt=(op_s, mg_s))
    assert bool(sol_8.stats.converged)
    u1 = np.asarray(sol_1.displacements)
    u8 = np.asarray(sol_8.displacements)
    assert np.max(np.abs(u8 - u1)) < 1e-9 * np.max(np.abs(u1))
    assert abs(int(sol_8.stats.iterations) - int(sol_1.stats.iterations)) <= 2


def test_extruded_dd_krylov_matches_f64():
    """The pair-space (double-f32 EFT) outer recurrence around the exact
    f64 apply must reproduce the all-f64 fpcg: same answer, ~same
    iteration count — it exists purely to dodge TPU-emulated f64 vector
    algebra (26.6 -> ~7 ms/iter at tube scale)."""
    from fea_tpu.solve import build_extruded, solve_extruded

    scene, detected = extruded_scene_tube(8, 32, 0.08, 0.1, 0.6, MAT, dtype=jnp.float64)
    nodes = np.asarray(scene.nodes)
    loads = np.zeros_like(nodes)
    tip = nodes[:, 2] == nodes[:, 2].max()
    loads[tip, 1] = 1.0 / tip.sum()
    scene = ft.make_scene(
        nodes, np.asarray(scene.elements), np.asarray(scene.fixed), loads, MAT,
        dtype=jnp.float64,
    )
    pre = build_extruded(scene, detected)
    s_dd = solve_extruded(scene, detected, tol=1e-10, prebuilt=pre, krylov="dd")
    s_64 = solve_extruded(scene, detected, tol=1e-10, prebuilt=pre, krylov="f64")
    assert bool(s_dd.stats.converged) and bool(s_64.stats.converged)
    assert abs(int(s_dd.stats.iterations) - int(s_64.stats.iterations)) <= 2
    u_dd, u_64 = np.asarray(s_dd.displacements), np.asarray(s_64.displacements)
    # both tol=1e-10 iterates; the true-residual check below is the
    # sharp criterion, this one only guards gross divergence
    assert np.max(np.abs(u_dd - u_64)) < 3e-8 * np.max(np.abs(u_64))
    # true f64 residual of the dd iterate confirms the recurrence honest
    b = np.asarray(scene.loads, np.float64)
    r = b - np.asarray(pre[0].apply(jnp.asarray(u_dd, jnp.float64)))
    free = np.asarray(pre[0].free) > 0
    rel = np.linalg.norm(r[free]) / np.linalg.norm(b)
    assert rel < 5e-10


def test_extruded_mg_coarsenable():
    from fea_tpu.solve import extruded_mg_coarsenable

    assert extruded_mg_coarsenable(16)
    assert extruded_mg_coarsenable(128)
    assert extruded_mg_coarsenable(12 * 2**5)
    assert not extruded_mg_coarsenable(100 * 2**0 + 1)  # odd, large
    assert not extruded_mg_coarsenable(2 * 81)  # halves once to 81, stuck


def test_extruded_rejects_inverted_section():
    from fea_tpu.mesh import extrude_quads

    nodes2d = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    quads = np.array([[0, 3, 2, 1]])  # clockwise -> inverted
    nodes, elements = extrude_quads(nodes2d, quads, np.array([0.0, 1.0]))
    fix = ft.fix_where(nodes, lambda p: p[:, 2] == 0.0, 3)
    scene = ft.make_scene(nodes, elements, fix, np.zeros_like(nodes), MAT, dtype=jnp.float64)
    with pytest.raises(ValueError, match="inverted"):
        build_extruded_operator(scene, dtype=jnp.float64)
