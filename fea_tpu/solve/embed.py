"""Subgrid-embedded solve: box-subset meshes through the curvilinear
stencil pipeline (round-5, VERDICT r4 #3 "arbitrary-topology
throughput").

Any hex8 connectivity that is a SUBSET of a box grid's cells —
L-domains, steps, plates with holes, voxelized CAD — embeds into its
bounding box: real nodes keep their positions, void lattice sites get
synthetic placeholders, void cells assemble EXACTLY zero weights
(``assemble_curv_weights(valid=...)``), and every void DOF is fixed at
zero.  Restricted to the real DOFs the embedded operator IS the mesh's
stiffness (pinned by tests/test_embed.py against the element-gather
oracle), so the full curvilinear machinery — variable-weight 27-offset
block stencil, Galerkin-RAP V-cycle, pair-space staged FCG, host
exact-IEEE certification — serves it unchanged at stencil (slice-shift)
data-movement cost.

WHY this exists: the honest no-structure BCSR route pays a V*b*N-element
gather per apply, and the device gather rate (~150 M elem/s measured,
docs/PERF.md round-5) walls it ~400x off the HBM floor.  The embedding
trades that for the box volume (an L-domain is 3/4 of its box — 1.33x
padding), which the stencil kernels cover at flagship-class rates.  The
BCSR/AMG route remains the fallback for connectivity that genuinely
embeds in no box (tests construct one by twisting two grids).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..scene import Scene, make_scene
from ._types import Solution

__all__ = ["build_subgrid_embedded", "solve_subgrid_embedded"]


def build_subgrid_embedded(scene: Scene, det, *, degree: int = 2,
                           check_jacobians: bool = True, progress=None):
    """One-time setup: embedded scene carrier (zero loads), operator,
    V-cycle, and the lattice map.  ``det = (dims, lat, valid)`` from
    ``ops.canonical.infer_subgrid_embedding``."""
    from ..ops.curvilinear import (
        CurvilinearOperator,
        assemble_curv_weights,
        build_curv_multigrid,
    )

    dims, lat, valid = det
    nx, ny, nz = dims
    X, Y, Z = nx + 1, ny + 1, nz + 1
    M = X * Y * Z
    nodes = np.asarray(scene.nodes, np.float64)
    fixed = np.asarray(scene.fixed, np.float64)

    # synthetic positions for void lattice sites: the regular lattice at
    # the mesh's mean per-axis spacing.  They only have to give FINITE
    # geometry (their cells' Ke is masked to exact zero before it can
    # touch the weight field, and their detJ is excluded from the
    # Jacobian check).
    lo = nodes.min(axis=0)
    hi = nodes.max(axis=0)
    h = (hi - lo) / np.maximum(np.asarray([nx, ny, nz], np.float64), 1.0)
    iz, rem = np.divmod(np.arange(M), X * Y)
    iy, ix = np.divmod(rem, X)
    emb_nodes = lo + np.stack([ix, iy, iz], axis=1).astype(np.float64) * h
    emb_nodes[lat] = nodes
    emb_fixed = np.ones((M, 3), np.float64)  # void DOFs pinned at zero
    emb_fixed[lat] = fixed

    w, min_detj = assemble_curv_weights(
        emb_nodes, dims, scene.material, valid=valid, progress=progress,
    )
    if check_jacobians:
        mdj = float(min_detj)
        if mdj <= 0.0:
            raise ValueError(
                f"Non-positive Jacobian determinant (min detJ = {mdj:g}); "
                "check element shapes / node ordering."
            )
    free_np = 1.0 - emb_fixed
    op = CurvilinearOperator(
        w=w, free=jnp.asarray(free_np, jnp.float64), dims=dims
    )
    mg = build_curv_multigrid(
        emb_nodes, dims, free_np, scene.material, w0=op.w, degree=degree,
        progress=progress,
    )
    # scene carrier: geometry/topology only — loads/prescribed are
    # placed fresh on every solve (the ADVICE r4 stale-loads lesson)
    base = make_scene(
        emb_nodes, np.asarray(lat)[np.asarray(scene.elements)], emb_fixed,
        np.zeros((M, 3)), scene.material, dtype=jnp.float64,
    )
    return base, op, mg, np.asarray(lat)


def solve_subgrid_embedded(scene: Scene, built, *, tol: float = 1e-8,
                           max_iters: int = 300) -> Solution:
    """Solve the original scene through its box embedding.

    ``built`` from :func:`build_subgrid_embedded`.  Loads/prescribed are
    scattered into the lattice per call; the returned Solution is in the
    ORIGINAL node order (displacements/reactions gathered back through
    the lattice map).
    """
    from .curv import solve_curvilinear

    base, op, mg, lat = built
    M = base.n_nodes
    loads = np.zeros((M, 3))
    loads[lat] = np.asarray(scene.loads, np.float64)
    presc = None
    if scene.prescribed is not None:
        presc = np.zeros((M, 3))
        presc[lat] = np.asarray(scene.prescribed, np.float64)
    emb_scene = dataclasses.replace(
        base,
        loads=jnp.asarray(loads, jnp.float64),
        prescribed=None if presc is None else jnp.asarray(presc, jnp.float64),
    )
    sol = solve_curvilinear(
        emb_scene, op.dims, tol=tol, max_iters=max_iters,
        prebuilt=(op, mg),
    )
    lat_j = jnp.asarray(lat)
    reactions = sol.reactions
    if isinstance(reactions, np.ndarray):
        reactions = reactions[lat]
    elif reactions is not None:
        reactions = reactions[lat_j]
    return Solution(
        displacements=sol.displacements[lat_j],
        reactions=reactions,
        stats=sol.stats,
    )
