"""Assembly: element <-> global DOF gather/scatter and global-matrix builders.

The reference assembles a dense global K with per-element fancy-indexed
scatter inside a serial Python loop (``/root/reference/fea.py:87-97``).
Here the topology is *fixed*, so everything data-dependent is precomputed
once on the host into static index plans, and the per-solve work is pure
gathers, batched einsums, and one padded-incidence reduction:

  * gather:   u (N, dpn) -> u_e (E, npe, dpn) is a plain XLA gather.
  * scatter:  instead of scatter-add (slow / serializing on TPU), the
    transpose "incidence plan" is precomputed: for every global DOF, the
    (at most ``max_valence``) positions in the flat element-force array
    that accumulate into it, padded.  Scatter-add then becomes
    gather + masked sum over the valence axis — fully vectorized,
    deterministic, and identical in spirit to the CSR node->element plan
    of SURVEY.md §7 "Scatter performance".

Explicit global matrices (dense / BCOO) are only for small systems and
test oracles; the large-scale path is matrix-free (fea_tpu.operator).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .scene import dof_ids

__all__ = [
    "gather_element_dofs",
    "scatter_add_direct",
    "IncidencePlan",
    "build_incidence_plan",
    "assemble_dense",
    "assemble_bcoo",
]


def gather_element_dofs(u: jax.Array, elements: jax.Array) -> jax.Array:
    """u (N, dpn) -> per-element nodal values (E, npe, dpn)."""
    return u[elements]


def scatter_add_direct(f_e: jax.Array, elements: jax.Array, n_nodes: int) -> jax.Array:
    """Reference scatter path: (E, npe, dpn) -> (N, dpn) via XLA scatter-add.

    Correct everywhere; used as the oracle for the incidence plan and as
    the fallback when no plan was precomputed.
    """
    out = jnp.zeros((n_nodes, f_e.shape[-1]), f_e.dtype)
    return out.at[elements].add(f_e)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IncidencePlan:
    """Transpose of the element->dof map, padded to uniform valence.

    positions: (ndof, max_valence) int32 — flat indices into the
               (E * npe * dpn,) element-force array contributing to each
               global DOF (padded entries point at slot 0).
    mask:      (ndof, max_valence) compute-dtype — 1.0 real, 0.0 pad.
    """

    positions: jax.Array
    mask: jax.Array

    @property
    def n_dof(self) -> int:
        return self.positions.shape[0]

    def scatter_add(self, f_e_flat: jax.Array) -> jax.Array:
        """(E*npe*dpn,) flat element forces -> (ndof,) assembled vector."""
        vals = f_e_flat[self.positions] * self.mask.astype(f_e_flat.dtype)
        return jnp.sum(vals, axis=1)


def build_incidence_plan(elements: np.ndarray, dofs_per_node: int, n_nodes: int) -> IncidencePlan:
    """Host-side (NumPy) construction of the padded incidence plan.

    Runs once per topology; cost is one argsort of E*npe*dpn int32s.
    """
    elements = np.asarray(elements)
    E, npe = elements.shape
    k = npe * dofs_per_node
    # flat global dof target of each slot in the (E, npe, dpn) force array
    targets = (
        elements[:, :, None].astype(np.int64) * dofs_per_node
        + np.arange(dofs_per_node)[None, None, :]
    ).reshape(-1)
    ndof = n_nodes * dofs_per_node

    order = np.argsort(targets, kind="stable")
    sorted_targets = targets[order]
    counts = np.bincount(sorted_targets, minlength=ndof)
    max_val = int(counts.max()) if counts.size else 0

    positions = np.zeros((ndof, max_val), dtype=np.int32)
    mask = np.zeros((ndof, max_val), dtype=np.float32)
    # slot index of each sorted entry within its dof's run
    starts = np.zeros(ndof + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    slot = np.arange(targets.size, dtype=np.int64) - starts[sorted_targets]
    positions[sorted_targets, slot] = order.astype(np.int32)
    mask[sorted_targets, slot] = 1.0
    return IncidencePlan(positions=jnp.asarray(positions), mask=jnp.asarray(mask))


def assemble_dense(Ke: jax.Array, elements: jax.Array, dofs_per_node: int, n_dof: int) -> jax.Array:
    """Dense global K from a batched Ke — small systems & oracles only.

    The jit-compatible equivalent of the reference's
    ``K[np.ix_(dof, dof)] += Ke`` loop (fea.py:96-97): one scatter-add
    with precomputed (E, k, k) row/col index grids.
    """
    dmap = dof_ids(elements, dofs_per_node)  # (E, k)
    rows = dmap[:, :, None]
    cols = dmap[:, None, :]
    K = jnp.zeros((n_dof, n_dof), Ke.dtype)
    return K.at[rows, cols].add(Ke)


def assemble_bcoo(Ke: jax.Array, elements: jax.Array, dofs_per_node: int, n_dof: int):
    """Sparse BCOO global K (duplicates summed) — medium systems / export."""
    from jax.experimental import sparse as jsparse

    dmap = dof_ids(elements, dofs_per_node)
    E, k = dmap.shape
    rows = jnp.broadcast_to(dmap[:, :, None], (E, k, k)).reshape(-1)
    cols = jnp.broadcast_to(dmap[:, None, :], (E, k, k)).reshape(-1)
    idx = jnp.stack([rows, cols], axis=-1)
    mat = jsparse.BCOO((Ke.reshape(-1), idx), shape=(n_dof, n_dof))
    return mat.sum_duplicates(nse=None)
