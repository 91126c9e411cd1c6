"""Curvilinear (topologically-structured) stencil path: detection,
weight-field assembly, apply parity, certified smoother bounds, the
re-discretized multigrid solve, and the solve() auto route.

The mesh family under test is the general-mesh shape every
reference-style generator produces — grid connectivity with moved nodes
(`/root/reference/utils.py:356-376` extrusion of `cubebeam.py:28-57`
quad grids).  Ground truth is the unstructured gather/scatter operator
(itself scipy-oracle-tested) and the dense solve.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fea_tpu as ft
from fea_tpu.ops import curvilinear as cv


def _distorted_scene(nx, ny, nz, *, seed=7, amp=0.25, lz=None):
    lz = lz if lz is not None else 0.1 * nz / nx
    nodes, elements = ft.mesh.box_hex_mesh(nx, ny, nz, 0.1, 0.12, lz)
    rng = np.random.default_rng(seed)
    h = 0.1 / nx
    interior = (nodes[:, 2] > 0) & (nodes[:, 2] < lz)
    nodes = nodes + amp * h * rng.uniform(-1, 1, nodes.shape) * interior[:, None]
    fixed = ft.fix_where(nodes, lambda q: np.isclose(q[:, 2], 0.0), dofs_per_node=3)
    loads = np.zeros_like(nodes)
    tip = np.isclose(nodes[:, 2], lz)
    loads[tip, 1] = 1.0 / tip.sum()
    mat = ft.Material(E=1e7, nu=0.3)
    return ft.make_scene(nodes, elements, fixed, loads, mat, dtype=jnp.float64)


@pytest.fixture(scope="module")
def small_scene():
    # deliberately non-uniform axis counts: catches (z, y, x) order bugs
    return _distorted_scene(3, 4, 6)


@pytest.fixture(scope="module")
def small_ops(small_scene):
    dims = cv.infer_topo_dims(small_scene)
    op_u = ft.build_operator(small_scene, dtype=jnp.float64)
    op_c = cv.build_curv_operator(small_scene, dims, dtype=jnp.float64)
    return dims, op_u, op_c


def test_infer_topo_dims_detects_distorted_grid(small_scene):
    assert cv.infer_topo_dims(small_scene) == (3, 4, 6)
    # the distorted geometry must NOT pass the voxel (geometric) detector
    from fea_tpu.ops.structured import infer_box_dims

    assert infer_box_dims(small_scene) is None


def test_infer_topo_dims_rejects_non_grid_connectivity(small_scene):
    el = np.asarray(small_scene.elements).copy()
    el[[0, 1]] = el[[1, 0]]  # same mesh, permuted element order
    s2 = ft.make_scene(
        np.asarray(small_scene.nodes), el, np.asarray(small_scene.fixed),
        np.asarray(small_scene.loads), small_scene.material, dtype=jnp.float64,
    )
    assert cv.infer_topo_dims(s2) is None
    # annulus extrusion: wraparound connectivity is not a box grid
    n2, q2 = ft.mesh.annulus_section(8, 0.05, 0.08)
    n3, e3 = ft.mesh.extrude_quads(n2, q2, np.linspace(0, 0.2, 4))
    s3 = ft.make_scene(
        n3, e3, np.zeros((len(n3), 3), np.int64), np.zeros((len(n3), 3)),
        small_scene.material, dtype=jnp.float64,
    )
    assert cv.infer_topo_dims(s3) is None


def test_curv_apply_matches_unstructured_operator(small_ops, rng):
    dims, op_u, op_c = small_ops
    x = jnp.asarray(rng.standard_normal((op_u.n_nodes, 3)))
    y_u = op_u.apply(x)
    y_c = op_c.apply(x)
    scale = float(jnp.max(jnp.abs(y_u)))
    assert float(jnp.max(jnp.abs(y_u - y_c))) < 1e-12 * scale
    # raw (unmasked) apply too — reactions come through it
    y_ur = op_u.apply_raw(x)
    y_cr = op_c.apply_raw(x)
    assert float(jnp.max(jnp.abs(y_ur - y_cr))) < 1e-12 * scale


def test_host_twin_matches_device(small_scene, small_ops, rng):
    dims, _, op_c = small_ops
    nx, ny, nz = dims
    w_np = cv.assemble_curv_weights_np(
        np.asarray(small_scene.nodes), dims, small_scene.material
    )
    err = float(np.max(np.abs(w_np - np.asarray(op_c.w))))
    assert err < 1e-9 * float(np.max(np.abs(w_np)))
    g = rng.standard_normal((nz + 1, ny + 1, nx + 1, 3))
    y_np = cv.curv_apply_np(w_np, g)
    y_dev = np.asarray(
        op_c.apply_raw(jnp.asarray(g.reshape(-1, 3)))
    ).reshape(g.shape)
    assert np.max(np.abs(y_np - y_dev)) < 1e-9 * np.max(np.abs(y_np))


def test_gershgorin_bound_is_certified(small_scene, small_ops):
    """lam_max from the row-sum bound must NEVER under-estimate the true
    spectrum of D^-1 A (an under-estimate diverges Chebyshev — the
    round-1 1M-DOF incident, ops/multigrid.py)."""
    dims, op_u, op_c = small_ops
    w_np = np.asarray(op_c.w, np.float64)
    free = np.asarray(small_scene.free_mask(jnp.float64)).reshape(
        dims[2] + 1, dims[1] + 1, dims[0] + 1, 3
    )
    inv_diag, lam = cv._gershgorin_np(w_np, free)
    A = np.asarray(op_u.dense())
    d = np.diag(A).copy()
    lam_true = float(np.max(np.abs(np.linalg.eigvals(A / d[:, None]))))
    assert lam >= lam_true
    assert lam <= 3.0 * lam_true  # and not uselessly loose
    # device twin agrees with the host computation
    inv_dev, lam_dev = cv._gershgorin_dev(op_c.w, jnp.asarray(free))
    assert abs(float(lam_dev) - lam) < 1e-9 * lam
    assert np.max(np.abs(np.asarray(inv_dev) - inv_diag)) < 1e-9 * np.max(inv_diag)


def test_curv_multigrid_matches_dense(rng):
    """Two-level re-discretized hierarchy on a distorted mesh: converges
    fast and to the dense-solve displacements; the f64 recurrence
    residual must match the host-IEEE true residual (the honesty
    property the route's reported stats rely on)."""
    scene = _distorted_scene(8, 8, 16)
    dims = cv.infer_topo_dims(scene)
    op_c = cv.build_curv_operator(scene, dims, dtype=jnp.float64)
    free_np = 1.0 - np.asarray(scene.fixed, np.float64)
    mg = cv.build_curv_multigrid(
        np.asarray(scene.nodes), dims, free_np, scene.material,
        w0=op_c.w, degree=4,
    )
    assert len(mg.levels) == 2  # 4131 DOF fine, 2025 coarse(dense)
    from fea_tpu.solve import solve_operator_fpcg

    sol = solve_operator_fpcg(
        op_c, scene.loads.astype(jnp.float64),
        scene.prescribed_or_zero(jnp.float64), mg, tol=1e-9, max_iters=60,
    )
    assert bool(sol.stats.converged)
    assert int(sol.stats.iterations) <= 25
    sol_d = ft.solve(scene, method="dense")
    scale = float(jnp.max(jnp.abs(sol_d.displacements)))
    assert float(jnp.max(jnp.abs(sol.displacements - sol_d.displacements))) < 1e-7 * scale
    # recurrence honesty: exact IEEE host residual at the same magnitude
    w_np = cv.assemble_curv_weights_np(
        np.asarray(scene.nodes), dims, scene.material
    )
    u = np.asarray(sol.displacements)
    g = (free_np * u).reshape(dims[2] + 1, dims[1] + 1, dims[0] + 1, 3)
    r = free_np * (np.asarray(scene.loads) - cv.curv_apply_np(w_np, g).reshape(-1, 3))
    true_rel = np.linalg.norm(r) / np.linalg.norm(free_np * np.asarray(scene.loads))
    assert true_rel < 3.0 * max(float(sol.stats.relative_residual), 1e-10)


def test_semicoarsening_handles_odd_axes():
    """A mesh with an odd axis must still build a multilevel hierarchy
    (coarsening only the even axes) and solve correctly."""
    scene = _distorted_scene(6, 5, 12)
    dims = cv.infer_topo_dims(scene)
    assert dims == (6, 5, 12)
    step = cv.coarsen_dims_partial(dims)
    assert step == ((3, 5, 6), (0, 2))  # y (odd) passes through
    op_c = cv.build_curv_operator(scene, dims, dtype=jnp.float64)
    free_np = 1.0 - np.asarray(scene.fixed, np.float64)
    mg = cv.build_curv_multigrid(
        np.asarray(scene.nodes), dims, free_np, scene.material,
        w0=op_c.w, degree=4, max_coarse_dof=500,
    )
    assert len(mg.levels) >= 2
    from fea_tpu.solve import solve_operator_fpcg

    sol = solve_operator_fpcg(
        op_c, scene.loads.astype(jnp.float64),
        scene.prescribed_or_zero(jnp.float64), mg, tol=1e-9, max_iters=80,
    )
    assert bool(sol.stats.converged)
    sol_d = ft.solve(scene, method="dense")
    scale = float(jnp.max(jnp.abs(sol_d.displacements)))
    assert float(jnp.max(jnp.abs(sol.displacements - sol_d.displacements))) < 1e-7 * scale


def test_detj_check_raises_on_inverted_elements(small_scene):
    nodes = np.asarray(small_scene.nodes).copy()
    # collapse one element by swapping two nodes of element 0
    el0 = np.asarray(small_scene.elements)[0]
    nodes[[el0[0], el0[6]]] = nodes[[el0[6], el0[0]]]
    s2 = ft.make_scene(
        nodes, np.asarray(small_scene.elements), np.asarray(small_scene.fixed),
        np.asarray(small_scene.loads), small_scene.material, dtype=jnp.float64,
    )
    dims = cv.infer_topo_dims(s2)
    with pytest.raises(ValueError, match="Jacobian"):
        cv.build_curv_operator(s2, dims, dtype=jnp.float64)


def test_solve_auto_routes_topological_grids():
    """A large distorted grid through plain ft.solve() must take the
    curvilinear stencil path automatically: mesh-independent ~16
    iterations (the gather/scatter two-level route needs ~40 and ~30x
    the per-iteration cost)."""
    scene = _distorted_scene(16, 16, 64)
    assert scene.n_dof >= 50_000
    sol = ft.solve(scene, tol=1e-8)
    assert bool(sol.stats.converged)
    assert int(sol.stats.iterations) <= 30
    nodes = np.asarray(scene.nodes)
    react = np.asarray(sol.reactions)
    loads = np.asarray(scene.loads)
    root = np.isclose(nodes[:, 2], 0.0)
    assert abs(react[root, 1].sum() + loads[:, 1].sum()) < 1e-6 * abs(loads[:, 1].sum())


def test_prescribed_displacements_through_curv_route():
    scene0 = _distorted_scene(4, 4, 8)
    nodes = np.asarray(scene0.nodes)
    lz = nodes[:, 2].max()
    fixed = np.asarray(scene0.fixed).astype(np.int64)
    tip = np.isclose(nodes[:, 2], lz)
    fixed[tip, 1] = 1  # prescribe uy at the tip
    prescribed = np.zeros_like(nodes)
    prescribed[tip, 1] = 1e-4
    scene = ft.make_scene(
        nodes, np.asarray(scene0.elements), fixed, np.zeros_like(nodes),
        scene0.material, prescribed=prescribed, dtype=jnp.float64,
    )
    dims = cv.infer_topo_dims(scene)
    sol = ft.solve_curvilinear(scene, dims, tol=1e-10, max_iters=60)
    sol_d = ft.solve(scene, method="dense")
    scale = float(jnp.max(jnp.abs(sol_d.displacements)))
    assert float(jnp.max(jnp.abs(sol.displacements - sol_d.displacements))) < 1e-7 * scale
    # prescribed values honored exactly
    u = np.asarray(sol.displacements)
    assert np.allclose(u[tip, 1], 1e-4)


@pytest.fixture(scope="module")
def tiny_kernel_setup(small_scene, small_ops):
    """Kernel-pipeline objects in interpreter mode on the tiny scene."""
    from fea_tpu.ops.curvilinear import build_curv_multigrid

    dims, op_u, op_c = small_ops
    free_np = 1.0 - np.asarray(small_scene.fixed, np.float64)
    mg = build_curv_multigrid(
        np.asarray(small_scene.nodes), dims, free_np, small_scene.material,
        w0=op_c.w, degree=2, max_coarse_dof=500,
    )
    pair_op = cv.build_curv_pair_operator(op_c, interpret=True)
    mg_t = cv.transpose_curv_multigrid(mg, interpret=True)
    return dims, op_c, mg, pair_op, mg_t


def test_var_kernels_match_oracle(small_scene, small_ops, rng):
    """f32 and dd variable-weight Pallas kernels (interpreter mode) vs
    the host IEEE-f64 oracle."""
    from fea_tpu.ops import pallas_varstencil as pv

    dims, _, op_c = small_ops
    nx, ny, nz = dims
    w_np = np.asarray(op_c.w, np.float64)
    x = rng.standard_normal((nz + 1, ny + 1, nx + 1, 3))
    y_host = cv.curv_apply_np(w_np, x)
    xT = jnp.asarray(np.transpose(x, (3, 1, 2, 0)))
    tabs = pv.var_fields_f32(jnp.asarray(w_np))
    y32 = np.transpose(
        np.asarray(pv.var_apply_transposed(tabs, xT.astype(jnp.float32),
                                           interpret=True)),
        (3, 1, 2, 0),
    )
    scale = np.abs(y_host).max()
    assert np.abs(y32 - y_host).max() < 1e-5 * scale
    tdd = pv.var_fields_dd(jnp.asarray(w_np))
    hi = xT.astype(jnp.float32)
    lo = (xT - hi.astype(jnp.float64)).astype(jnp.float32)
    oh, ol = pv.var_apply_transposed_dd(tdd, hi, lo, interpret=True)
    ydd = np.transpose(
        np.asarray(oh, np.float64) + np.asarray(ol, np.float64), (3, 1, 2, 0)
    )
    assert np.abs(ydd - y_host).max() < 1e-9 * scale


def test_kernel_vcycle_matches_flat(tiny_kernel_setup, rng):
    """The transposed kernel V-cycle agrees with the flat XLA V-cycle to
    f32-class accuracy (same hierarchy data; level dtypes differ — the
    kernel pipeline runs all levels f32 like the flagship)."""
    dims, op_c, mg, pair_op, mg_t = tiny_kernel_setup
    r = rng.standard_normal((op_c.n_nodes, 3)).astype(np.float32)
    free = np.asarray(op_c.free, np.float32)
    r = r * free
    z_flat = np.asarray(mg(jnp.asarray(r, jnp.float64)))
    z_kern = np.asarray(mg_t(jnp.asarray(r)))
    scale = np.abs(z_flat).max()
    assert np.abs(z_kern - z_flat).max() < 1e-4 * scale


def test_pair_operator_matches_masked_apply(tiny_kernel_setup, rng):
    dims, op_c, mg, pair_op, mg_t = tiny_kernel_setup
    x = rng.standard_normal((op_c.n_nodes, 3))
    hi = jnp.asarray(x, jnp.float32)
    lo = jnp.asarray((x - np.asarray(hi, np.float64)), jnp.float32)
    oh, ol = pair_op.apply((hi, lo))
    got = np.asarray(oh, np.float64) + np.asarray(ol, np.float64)
    want = np.asarray(op_c.apply(jnp.asarray(x)))
    assert np.abs(got - want).max() < 1e-9 * np.abs(want).max()


@pytest.mark.slow
def test_kernel_pipeline_solve_matches_dense(tiny_kernel_setup, small_scene):
    """Full kernel-pipeline staged solve (interpret mode) on the tiny
    scene vs the dense solution."""
    from fea_tpu.solve import _solve_unstructured_ddq

    dims, op_c, mg, pair_op, mg_t = tiny_kernel_setup
    loads = small_scene.loads.astype(jnp.float64)
    b = op_c.rhs(loads, jnp.zeros_like(loads))
    u, stats = _solve_unstructured_ddq(
        op_c, mg_t, b, jnp.zeros_like(b), tol=1e-9, max_iters=200,
        pair_op=pair_op,
    )
    assert bool(stats.converged)
    ref = ft.solve(small_scene, method="dense")
    scale = float(jnp.max(jnp.abs(ref.displacements)))
    assert float(jnp.max(jnp.abs(u - ref.displacements))) < 1e-7 * scale


def test_rap_matches_dense_galerkin():
    """rap_np == dense P^T A P (the V-cycle's own _prolong/_restrict
    pair) and rap_dev == rap_np, full and semi-coarsening."""
    import numpy as np

    from fea_tpu.ops import multigrid as mgmod
    from fea_tpu.ops.curvilinear import (
        _dense_from_w_np,
        assemble_curv_weights_np,
        rap_dev,
        rap_np,
    )
    from fea_tpu.mesh import box_hex_mesh

    rng = np.random.default_rng(11)
    for dims, axes in [((4, 4, 4), (0, 1, 2)), ((3, 4, 6), (0, 1))]:
        nx, ny, nz = dims
        nodes, _ = box_hex_mesh(nx, ny, nz, 1.0, 1.0, 1.0)
        nodes = np.asarray(nodes, np.float64)
        h = 1.0 / max(dims)
        interior = (nodes > 1e-9) & (nodes < 1 - 1e-9)
        nodes = nodes + 0.2 * h * rng.uniform(-1, 1, nodes.shape) * interior
        w = assemble_curv_weights_np(
            nodes, dims, ft.Material(E=1e7, nu=0.3)
        )
        wc = rap_np(w, axes)
        # device twin bit-class identical (same einsum contractions)
        wc_dev = np.asarray(rap_dev(jnp.asarray(w), axes=tuple(axes)))
        assert np.abs(wc_dev - wc).max() <= 1e-12 * np.abs(wc).max()
        # dense Galerkin oracle through the cycle's actual transfers
        Zf, Yf, Xf = nz + 1, ny + 1, nx + 1
        ones = np.ones((Zf, Yf, Xf, 3))
        A = _dense_from_w_np(w, ones)
        cs = [Zf, Yf, Xf]
        for ax in axes:
            cs[ax] = (cs[ax] + 1) // 2
        Nc = cs[0] * cs[1] * cs[2] * 3
        P = np.zeros((A.shape[0], Nc))
        for j in range(Nc):
            e = np.zeros(Nc)
            e[j] = 1.0
            P[:, j] = np.asarray(
                mgmod._prolong(
                    jnp.asarray(e.reshape(cs[0], cs[1], cs[2], 3)),
                    axes=tuple(axes),
                )
            ).reshape(-1)
        Ac_dense = P.T @ A @ P
        Ac_stencil = _dense_from_w_np(wc, np.ones((cs[0], cs[1], cs[2], 3)))
        scale = np.abs(Ac_dense).max()
        assert np.abs(Ac_stencil - Ac_dense).max() <= 1e-12 * scale


def test_rap_hierarchy_spd_diag_positive():
    """RAP of the SPD fine operator keeps every level's free-DOF
    diagonal strictly positive (the failure mode ADVICE r3 flagged for
    re-discretized coarse levels cannot occur by construction)."""
    import numpy as np

    scene = _distorted_scene(4, 4, 12)
    from fea_tpu.ops.curvilinear import (
        _offset_index,
        build_curv_multigrid,
        build_curv_operator,
        infer_topo_dims,
    )

    dims = infer_topo_dims(scene)
    op = build_curv_operator(scene, dims, dtype=jnp.float64)
    free_np = 1.0 - np.asarray(scene.fixed, np.float64)
    mg = build_curv_multigrid(
        np.asarray(scene.nodes), dims, free_np, scene.material, w0=op.w
    )
    for lvl in mg.levels:
        w = np.asarray(lvl.w, np.float64)
        free = np.asarray(lvl.free, np.float64)
        diag = np.diagonal(w[_offset_index(0, 0, 0)], axis1=-2, axis2=-1)
        assert (diag[free > 0] > 0).all()


def test_apply_pr_matches_einsum_and_host():
    """The product-reduce certification lowering == the einsum apply ==
    the host NumPy oracle (same values, different reduction order)."""
    import numpy as np

    scene = _distorted_scene(3, 4, 6)
    dims = cv.infer_topo_dims(scene)
    op = cv.build_curv_operator(scene, dims, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((scene.n_nodes, 3))
    a = np.asarray(op.apply(jnp.asarray(x)))
    b = np.asarray(op.apply_certify(jnp.asarray(x)))
    scale = np.abs(a).max()
    assert np.abs(a - b).max() <= 1e-12 * scale
    # host oracle on the raw apply
    Z, Y, X = op.grid_shape
    w_np = np.asarray(op.w, np.float64)
    want_raw = cv.curv_apply_np(w_np, x.reshape(Z, Y, X, 3)).reshape(-1, 3)
    got_raw = np.asarray(
        cv.curv_apply_grid_pr(op.w, jnp.asarray(x.reshape(Z, Y, X, 3)))
    ).reshape(-1, 3)
    assert np.abs(got_raw - want_raw).max() <= 1e-12 * np.abs(want_raw).max()
