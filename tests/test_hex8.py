"""Hex8 element unit tests (SURVEY.md §4 tier 1).

Physics ground truth: symmetry, positive semidefiniteness with exactly
six rigid-body modes, constant-strain (patch) energy identity, analytic
golden values on the +-1 cube, and agreement with the independent NumPy
oracle on randomly distorted elements.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from fea_tpu import Material
from fea_tpu.elements import hex8

from oracle import hex8_ke, elastic_C

CUBE = hex8.CORNER_SIGNS.astype(float)  # the +-1 cube


def distorted_element(rng, scale=0.25):
    return CUBE + rng.uniform(-scale, scale, size=(8, 3))


def ke(coords, E=1000.0, nu=0.3):
    return np.asarray(
        hex8.stiffness_matrices(
            jnp.asarray(coords, jnp.float64), jnp.arange(8, dtype=jnp.int32)[None], Material(E, nu)
        )[0]
    )


def test_golden_unit_cube():
    """Analytic values on the +-1 cube with E=1000, nu=0: clean rationals."""
    K = ke(CUBE, E=1000.0, nu=0.0)
    assert K[0, 0] == pytest.approx(4000.0 / 9.0, rel=1e-12)
    assert K[0, 1] == pytest.approx(250.0 / 3.0, rel=1e-12)
    assert K[0, 3] == pytest.approx(-1000.0 / 9.0, rel=1e-12)
    assert np.trace(K) == pytest.approx(32000.0 / 3.0, rel=1e-12)


def test_symmetry_and_psd(rng):
    K = ke(distorted_element(rng))
    assert np.max(np.abs(K - K.T)) < 1e-9 * np.max(np.abs(K))
    eig = np.linalg.eigvalsh(K)
    assert eig.min() > -1e-9 * eig.max()


def test_six_rigid_body_modes(rng):
    """Exactly 6 zero eigenvalues; translations and linearized rotations
    produce zero force."""
    coords = distorted_element(rng)
    K = ke(coords)
    eig = np.linalg.eigvalsh(K)
    assert (np.abs(eig) < 1e-8 * eig.max()).sum() == 6

    for t in np.eye(3):  # translations
        u = np.tile(t, 8)
        assert np.max(np.abs(K @ u)) < 1e-8 * np.max(np.abs(K))
    for axis in np.eye(3):  # linearized rotations u = axis x (X - c)
        u = np.cross(np.broadcast_to(axis, (8, 3)), coords - coords.mean(0)).reshape(-1)
        assert np.max(np.abs(K @ u)) < 1e-7 * np.max(np.abs(K)) * np.max(np.abs(u))


def test_patch_constant_strain_energy(rng):
    """For a linear displacement field u = A x the strain is constant, so
    u^T K u must equal V * eps^T C eps (V = element volume)."""
    coords = distorted_element(rng)
    E, nu = 70e9, 0.33
    K = ke(coords, E, nu)
    A = rng.normal(size=(3, 3)) * 1e-3
    u = (coords @ A.T).reshape(-1)
    epsilon = 0.5 * (A + A.T)
    voigt = np.array(
        [
            epsilon[0, 0],
            epsilon[1, 1],
            epsilon[2, 2],
            2 * epsilon[0, 1],
            2 * epsilon[1, 2],
            2 * epsilon[0, 2],
        ]
    )
    geom = hex8.precompute_geometry(
        jnp.asarray(coords, jnp.float64), jnp.arange(8, dtype=jnp.int32)[None]
    )
    volume = float(jnp.sum(geom.wdetj))
    energy_fem = u @ K @ u
    energy_exact = volume * voigt @ elastic_C(E, nu) @ voigt
    assert energy_fem == pytest.approx(energy_exact, rel=1e-9)


def test_matches_numpy_oracle(rng):
    for _ in range(3):
        coords = distorted_element(rng)
        K = ke(coords, E=70e9, nu=0.3)
        K_oracle = hex8_ke(coords, 70e9, 0.3)
        assert np.max(np.abs(K - K_oracle)) < 1e-9 * np.max(np.abs(K_oracle))


def test_matrix_free_apply_equals_ke(rng):
    """apply_elements (quadrature-level, no Ke) == Ke @ u for a batch."""
    coords = np.stack([distorted_element(rng) for _ in range(5)])
    nodes = coords.reshape(-1, 3)
    elements = jnp.arange(40, dtype=jnp.int32).reshape(5, 8)
    mat = Material(70e9, 0.3)
    nodes_j = jnp.asarray(nodes, jnp.float64)
    geom = hex8.precompute_geometry(nodes_j, elements)
    Ke = hex8.stiffness_matrices(nodes_j, elements, mat)
    u_e = jnp.asarray(rng.normal(size=(5, 8, 3)), jnp.float64)
    f_mf = hex8.apply_elements(geom, u_e, mat)
    f_ke = jnp.einsum("eab,eb->ea", Ke, u_e.reshape(5, 24)).reshape(5, 8, 3)
    assert float(jnp.max(jnp.abs(f_mf - f_ke))) < 1e-9 * float(jnp.max(jnp.abs(f_ke)))


def test_diagonal_closed_form(rng):
    coords = np.stack([distorted_element(rng) for _ in range(3)])
    nodes = jnp.asarray(coords.reshape(-1, 3), jnp.float64)
    elements = jnp.arange(24, dtype=jnp.int32).reshape(3, 8)
    mat = Material(70e9, 0.3)
    geom = hex8.precompute_geometry(nodes, elements)
    d = hex8.diagonal(geom, mat)
    Ke = hex8.stiffness_matrices(nodes, elements, mat)
    d_ref = jnp.diagonal(Ke, axis1=-2, axis2=-1).reshape(3, 8, 3)
    assert float(jnp.max(jnp.abs(d - d_ref))) < 1e-9 * float(jnp.max(jnp.abs(d_ref)))


def test_inverted_element_flagged():
    """Non-positive detJ surfaces as min_detj <= 0 (the jit-safe flag that
    replaces the reference's ValueError, utils.py:212-215)."""
    bad = CUBE.copy()
    bad[[0, 1]] = bad[[1, 0]]  # swap two corners -> inverted
    geom = hex8.precompute_geometry(
        jnp.asarray(bad, jnp.float64), jnp.arange(8, dtype=jnp.int32)[None]
    )
    assert float(geom.min_detj) <= 0.0
    good = hex8.precompute_geometry(
        jnp.asarray(CUBE, jnp.float64), jnp.arange(8, dtype=jnp.int32)[None]
    )
    assert float(good.min_detj) > 0.0


def test_centroid_stress_constant_field(rng):
    """Uniaxial strain field reproduces the exact constitutive stress."""
    coords = CUBE * 0.5
    mat = Material(200e9, 0.3)
    strain = 1e-4
    u = np.zeros((8, 3))
    u[:, 0] = coords[:, 0] * strain  # eps_xx = strain
    eps, sig, vm = (
        np.asarray(a)
        for a in (
            *hex8.centroid_strain_stress(
                jnp.asarray(coords, jnp.float64),
                jnp.arange(8, dtype=jnp.int32)[None],
                jnp.asarray(u, jnp.float64),
                mat,
            ),
            jnp.zeros(1),
        )
    )
    C = elastic_C(200e9, 0.3)
    expected = C @ np.array([strain, 0, 0, 0, 0, 0])
    assert np.allclose(eps[0], [strain, 0, 0, 0, 0, 0], atol=1e-18 + 1e-10 * strain)
    assert np.allclose(sig[0], expected, rtol=1e-9)
