"""Independent NumPy/SciPy oracle for the test suite.

A from-scratch dense/sparse FEA implementation of the same textbook
formulations (trilinear hex8 with 2x2x2 Gauss quadrature, isotropic
elasticity; reduce-and-solve boundary conditions).  Used as the
side-by-side ground truth the acceptance tests compare against
(SURVEY.md §4.3: displacements must match the reference's algorithms to
1e-6 on its demo configurations).

Deliberately written in a different style from both the framework (no
JAX) and the reference (vectorized over quadrature points, scipy sparse
assembly) so agreement is evidence of correct physics, not shared code.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

# Corner natural coordinates: bottom face CCW, then top face CCW.
_SIGNS = np.array(
    [
        [-1, -1, -1],
        [1, -1, -1],
        [1, 1, -1],
        [-1, 1, -1],
        [-1, -1, 1],
        [1, -1, 1],
        [1, 1, 1],
        [-1, 1, 1],
    ],
    dtype=float,
)
_QP = _SIGNS / np.sqrt(3.0)


def elastic_C(E: float, nu: float) -> np.ndarray:
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    C = np.zeros((6, 6))
    C[:3, :3] = lam
    C[np.arange(3), np.arange(3)] = lam + 2 * mu
    C[np.arange(3, 6), np.arange(3, 6)] = mu
    return C


def _dshape(q: np.ndarray) -> np.ndarray:
    """Natural gradients dN_a/dxi_d at one point q, shape (3, 8)."""
    t = 1.0 + q[None, :] * _SIGNS  # (8, 3)
    D = np.empty((3, 8))
    for d in range(3):
        o = [x for x in range(3) if x != d]
        D[d] = _SIGNS[:, d] / 8.0 * t[:, o[0]] * t[:, o[1]]
    return D


def hex8_ke(coords: np.ndarray, E: float, nu: float) -> np.ndarray:
    """24x24 stiffness of one hex8 element (coords (8, 3))."""
    C = elastic_C(E, nu)
    Ke = np.zeros((24, 24))
    for q in _QP:
        D = _dshape(q)
        J = D @ coords
        detJ = np.linalg.det(J)
        assert detJ > 0, "oracle: inverted element"
        G = np.linalg.solve(J, D)  # (3, 8) global gradients
        B = np.zeros((6, 24))
        B[0, 0::3] = G[0]
        B[1, 1::3] = G[1]
        B[2, 2::3] = G[2]
        B[3, 0::3] = G[1]
        B[3, 1::3] = G[0]
        B[4, 1::3] = G[2]
        B[4, 2::3] = G[1]
        B[5, 0::3] = G[2]
        B[5, 2::3] = G[0]
        Ke += (B.T @ C @ B) * detJ
    return Ke


def assemble_sparse(nodes: np.ndarray, elements: np.ndarray, E: float, nu: float) -> sp.csr_matrix:
    """Global stiffness as CSR via COO triplets."""
    ndof = nodes.size
    rows, cols, vals = [], [], []
    for conn in elements:
        Ke = hex8_ke(nodes[conn], E, nu)
        dofs = (conn[:, None] * 3 + np.arange(3)[None, :]).reshape(-1)
        rows.append(np.repeat(dofs, 24))
        cols.append(np.tile(dofs, 24))
        vals.append(Ke.reshape(-1))
    K = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(ndof, ndof),
    )
    return K.tocsr()


def solve_reduced(K: sp.csr_matrix, forces: np.ndarray, fixed_mask: np.ndarray) -> np.ndarray:
    """Reduce-and-solve with scipy: the reference's BC treatment
    (index reduction) on a sparse matrix.  forces/fixed_mask (N, 3)."""
    free = np.flatnonzero(~fixed_mask.reshape(-1).astype(bool))
    Kff = K[np.ix_(free, free)]
    u = np.zeros(K.shape[0])
    u[free] = spla.spsolve(Kff.tocsc(), forces.reshape(-1)[free])
    return u.reshape(forces.shape)


def solve_dense_generic(K: np.ndarray, f: np.ndarray, fixed_flat: np.ndarray) -> np.ndarray:
    """Dense reduce-and-solve for any DOF layout (beam/truss oracles)."""
    free = np.flatnonzero(~fixed_flat.astype(bool))
    u = np.zeros(K.shape[0])
    u[free] = np.linalg.solve(K[np.ix_(free, free)], f[free])
    return u
