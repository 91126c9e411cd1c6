"""Native C++ host-certification kernel (fea_tpu/native) vs its NumPy
twin ``ops.structured.stencil_apply_np``.

The native kernel assembles the 27-offset region-weight table once (f64
sums of Ke blocks) and multiplies; the NumPy twin sums 64 corner-pair
pad-add products — different summation orders of the same assembled K,
so agreement is to f64 rounding (~1e-15 relative), not bitwise.
"""
from __future__ import annotations

import numpy as np
import pytest

import fea_tpu.native as nat
from fea_tpu.ops.structured import stencil_apply_np

pytestmark = pytest.mark.skipif(
    not nat.available(), reason="no host toolchain for the native kernel"
)


def _random_sym_ke(seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(24, 24))
    return a + a.T


@pytest.mark.parametrize(
    "dims", [(1, 1, 1), (1, 2, 5), (2, 3, 4), (4, 4, 9), (3, 1, 7)]
)
def test_apply_matches_numpy_twin(dims):
    ke = _random_sym_ke()
    nx, ny, nz = dims
    rng = np.random.default_rng(42)
    g = rng.normal(size=(nz + 1, ny + 1, nx + 1, 3))
    want = stencil_apply_np(ke, g, dims)
    got = nat.stencil_apply_host(ke, g, dims)
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) <= 1e-13 * scale


def test_apply_real_hex8_ke():
    """Same check with the actual reference-element stiffness the
    certification tier runs on (symmetric PSD, wide entry range)."""
    import jax.numpy as jnp

    import fea_tpu as ft
    from fea_tpu.ops.structured import build_structured_operator, structured_scene

    mat = ft.Material(E=10_000_000 * ft.units.psi, nu=0.3)
    scene, dims = structured_scene(3, 3, 8, 0.1, 0.1, 1.0, mat, dtype=jnp.float64)
    op = build_structured_operator(scene, dims, dtype=jnp.float64)
    ke = np.asarray(op.ke, np.float64)
    Z, Y, X = op.grid_shape
    rng = np.random.default_rng(7)
    g = rng.normal(size=(Z, Y, X, 3))
    want = stencil_apply_np(ke, g, dims)
    got = nat.stencil_apply_host(ke, g, dims)
    assert np.max(np.abs(got - want)) <= 1e-12 * np.max(np.abs(want))


def test_fused_residual_matches_composition():
    ke = _random_sym_ke(3)
    dims = (4, 3, 6)
    nx, ny, nz = dims
    shape = (nz + 1, ny + 1, nx + 1, 3)
    rng = np.random.default_rng(11)
    u = rng.normal(size=shape)
    b = rng.normal(size=shape)
    free = (rng.uniform(size=shape) > 0.2).astype(np.float64)
    out = nat.stencil_residual_host(ke, u, b, free, dims)
    assert out is not None
    r, rn, au = out
    want_au = stencil_apply_np(ke, u, dims)
    want_r = (free * (b - want_au)).reshape(-1, 3)
    scale = np.max(np.abs(want_au))
    assert np.max(np.abs(au - want_au.reshape(-1, 3))) <= 1e-13 * scale
    assert np.max(np.abs(r - want_r)) <= 1e-13 * scale
    assert abs(rn - np.linalg.norm(want_r)) <= 1e-12 * np.linalg.norm(want_r)


def test_weight_table_existence_rule():
    """Offsets that point outside the grid carry exactly-zero weight in
    every boundary region (so the in-kernel bounds skip drops only
    zero-weight terms)."""
    W = nat.region_weight_table(_random_sym_ke(5)).reshape(
        3, 3, 3, 3, 3, 3, 3, 3
    )
    # min-face region (r=0): offset d=-1 on that axis must be zero
    assert np.all(W[0, :, :, 0, :, :] == 0.0)  # rz=0, dz=-1
    assert np.all(W[:, 0, :, :, 0, :] == 0.0)  # ry=0, dy=-1
    assert np.all(W[:, :, 0, :, :, 0] == 0.0)  # rx=0, dx=-1
    # max-face region (r=2): offset d=+1 zero
    assert np.all(W[2, :, :, 2, :, :] == 0.0)
    assert np.all(W[:, 2, :, :, 2, :] == 0.0)
    assert np.all(W[:, :, 2, :, :, 2] == 0.0)


def test_var_stencil_matches_numpy_twin():
    """Native variable-weight apply/residual == curv_apply_np on a
    distorted grid-connectivity mesh, to f64 rounding."""
    import numpy as np
    import jax.numpy as jnp

    import fea_tpu as ft
    from fea_tpu import native
    from fea_tpu.ops.curvilinear import assemble_curv_weights_np, curv_apply_np

    if not native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(5)
    dims = (3, 4, 6)
    nodes, _ = ft.mesh.box_hex_mesh(*dims, 0.3, 0.4, 0.6)
    nodes = np.asarray(nodes, np.float64)
    h = 0.1
    lo, hi = nodes.min(0), nodes.max(0)
    interior = (nodes > lo + 1e-9) & (nodes < hi - 1e-9)
    nodes = nodes + 0.2 * h * rng.uniform(-1, 1, nodes.shape) * interior
    w = assemble_curv_weights_np(nodes, dims, ft.Material(E=1e7, nu=0.3))
    Z, Y, X = dims[2] + 1, dims[1] + 1, dims[0] + 1
    g = rng.standard_normal((Z, Y, X, 3))
    want = curv_apply_np(w, g)
    Wn = native.pack_var_weights(w)
    got = native.var_stencil_apply_host(Wn, g)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() <= 1e-13 * scale
    # fused residual twin
    b = rng.standard_normal((Z, Y, X, 3))
    free = (rng.uniform(size=(Z, Y, X, 3)) > 0.2).astype(np.float64)
    r, rn, au = native.var_stencil_residual_host(Wn, g, b, free)
    r_want = (free * (b - want)).reshape(-1, 3)
    assert np.abs(au - want.reshape(-1, 3)).max() <= 1e-13 * scale
    assert np.abs(r - r_want).max() <= 1e-13 * max(scale, np.abs(b).max())
    assert rn == pytest.approx(float(np.linalg.norm(r_want)), rel=1e-12)


def test_slab_residual_matches_full():
    """Chunked slab residual accumulation == the one-pass full-grid
    kernel (the round-4 streaming certification tier's decomposition)."""
    if not nat.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(9)
    dims = (4, 3, 11)
    nx, ny, nz = dims
    Z, Y, X = nz + 1, ny + 1, nx + 1
    ke = _random_sym_ke(9)
    u = rng.standard_normal((Z, Y, X, 3))
    b = rng.standard_normal((Z, Y, X, 3))
    free = (rng.uniform(size=(Z, Y, X, 3)) > 0.2).astype(np.float64)
    want = nat.stencil_residual_host(ke, u, b, free, dims)
    assert want is not None
    r_w, rn_w, au_w = want
    r_np = np.empty((Z, Y, X, 3))
    au_np = np.empty_like(r_np)
    nrm2 = 0.0
    for z0 in range(0, Z, 3):
        z1 = min(z0 + 3, Z)
        g0 = max(z0 - 1, 0)
        g1 = min(z1 + 1, Z)
        out = nat.stencil_residual_slab_host(
            ke, u[g0:g1], b[z0:z1], free[z0:z1],
            r_np[z0:z1], au_np[z0:z1], dims, z0, g0,
        )
        nrm2 += out
    assert np.array_equal(r_np.reshape(-1, 3), r_w)
    assert np.array_equal(au_np.reshape(-1, 3), au_w)
    assert np.sqrt(nrm2) == pytest.approx(rn_w, rel=1e-14)
