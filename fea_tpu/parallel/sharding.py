"""Element-domain decomposition and sharded sweeps over a jax device Mesh.

Design (SURVEY.md §5.8): there is no explicit communication backend —
partitioning is expressed with ``jax.sharding.Mesh`` + ``shard_map`` and
the only collective is a ``psum`` of shared-node force partials over the
mesh axis, which XLA lowers onto ICI (all-reduce) on real multi-chip
hardware.  Each device owns a contiguous block of elements; nodal vectors
(u, residuals) stay replicated, so CG's vector recurrences run redundantly
per device (cheap — the element apply dominates) and no halo exchange is
needed.

The element batch is padded to a multiple of the shard count with
zero-stiffness elements (``StiffnessOperator.valid``), keeping shapes
static and equal per device.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..operator import StiffnessOperator

__all__ = [
    "make_device_mesh",
    "shard_operator",
    "ShardedOperator",
    "sharded_sweep",
    "shard_structured_operator",
    "shard_extruded",
    "shard_curvilinear",
]


def make_device_mesh(n_devices: Optional[int] = None, axis_name: str = "dd") -> Mesh:
    """1D mesh over the first n (default: all) devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis_name,))


def _pad_operator(op: StiffnessOperator, n_shards: int) -> StiffnessOperator:
    """Pad the element batch to a multiple of n_shards with inert elements.

    Padding strategy per mode: matfree pads gradients with copies of
    element 0 but quadrature weights with ZERO (zero force and diagonal);
    stored pads Ke with zeros; uniform keeps the shared Ke and masks the
    padded slots via ``valid``.  The incidence plan is dropped — sharded
    scatter uses the direct local scatter-add + psum.
    """
    E = op.elements.shape[0]
    E_pad = -(-E // n_shards) * n_shards
    pad = E_pad - E
    if pad == 0 and op.plan is None:
        return op

    def pad_rows(x, fill="copy"):
        if pad == 0:
            return x
        if fill == "zero":
            filler = jnp.zeros((pad,) + x.shape[1:], x.dtype)
        else:
            filler = jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])
        return jnp.concatenate([x, filler], axis=0)

    elements = pad_rows(op.elements, "copy")
    geom = op.geom
    ke = op.ke
    valid = None
    if op.kind == "hex8_matfree":
        geom = dataclasses.replace(
            geom,
            grads=pad_rows(geom.grads, "copy"),
            wdetj=pad_rows(geom.wdetj, "zero"),
        )
    elif op.kind == "stored":
        ke = pad_rows(ke, "zero")
    elif op.kind == "uniform":
        valid = jnp.concatenate(
            [jnp.ones((E,), op.free.dtype), jnp.zeros((pad,), op.free.dtype)]
        )
    return dataclasses.replace(
        op, elements=elements, geom=geom, ke=ke, valid=valid, plan=None
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedOperator:
    """StiffnessOperator partitioned element-wise over a device mesh.

    Drop-in for StiffnessOperator in ``solve_operator``: same apply /
    apply_raw / rhs / diag_masked surface, with psum-combined partials.
    """

    inner: StiffnessOperator  # padded; element-batch leaves shard over axis
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))

    # -- pytree-spec plumbing -------------------------------------------------
    def _inner_specs(self):
        """PartitionSpec pytree for the inner operator: element-batch leaves
        shard on the mesh axis, everything else replicates."""
        shard_on = ("elements", "grads", "wdetj", "valid") + (
            ("ke",) if self.inner.kind == "stored" else ()
        )

        def spec_for(path, leaf):
            names = {getattr(k, "name", "") for k in path}
            if names & set(shard_on):
                return P(self.axis, *([None] * (leaf.ndim - 1)))
            return P(*([None] * getattr(leaf, "ndim", 0)))

        return jax.tree_util.tree_map_with_path(spec_for, self.inner)

    @property
    def free(self):
        return self.inner.free

    @property
    def n_dof(self) -> int:
        return self.inner.n_dof

    # -- sharded applies ------------------------------------------------------
    def apply_raw(self, u: jax.Array) -> jax.Array:
        """K @ u with element shards: local gather/apply/scatter + psum."""
        axis = self.axis

        def local(op_local: StiffnessOperator, u_rep: jax.Array) -> jax.Array:
            partial = op_local.apply_raw(u_rep)
            return jax.lax.psum(partial, axis)

        ndim_u = u.ndim
        return shard_map(
            local,
            mesh=self.mesh,
            in_specs=(self._inner_specs(), P(*([None] * ndim_u))),
            out_specs=P(*([None] * ndim_u)),
        )(self.inner, u)

    def apply(self, x: jax.Array) -> jax.Array:
        F = self.free.astype(x.dtype)
        return F * self.apply_raw(F * x) + (1.0 - F) * x

    def rhs(self, loads: jax.Array, prescribed: jax.Array) -> jax.Array:
        F = self.free.astype(loads.dtype)
        xp = (1.0 - F) * prescribed.astype(loads.dtype)
        return F * (loads - self.apply_raw(xp)) + xp

    def diag_raw(self) -> jax.Array:
        axis = self.axis

        def local(op_local: StiffnessOperator) -> jax.Array:
            return jax.lax.psum(op_local.diag_raw(), axis)

        out_ndim = self.inner.free.ndim
        return shard_map(
            local,
            mesh=self.mesh,
            in_specs=(self._inner_specs(),),
            out_specs=P(*([None] * out_ndim)),
        )(self.inner)

    def diag_masked(self) -> jax.Array:
        F = self.free
        return F * self.diag_raw() + (1.0 - F)

    @property
    def geom(self):
        return self.inner.geom


def shard_operator(op: StiffnessOperator, mesh: Mesh, axis_name: Optional[str] = None) -> ShardedOperator:
    """Partition an operator's elements across the mesh's (single) axis and
    place each block on its device."""
    axis = axis_name or mesh.axis_names[0]
    n_shards = mesh.shape[axis]
    padded = _pad_operator(op, n_shards)
    sharded = ShardedOperator(inner=padded, mesh=mesh, axis=axis)
    # Physically place the element-batch leaves on their devices so the
    # first jit does not need to reshuffle.
    specs = sharded._inner_specs()
    inner = jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, jax.sharding.NamedSharding(mesh, spec)),
        padded,
        specs,
    )
    return ShardedOperator(inner=inner, mesh=mesh, axis=axis)


def shard_structured_operator(op, mesh: Mesh, axis_name: Optional[str] = None):
    """Z-slab domain decomposition for the structured stencil operator.

    The structured operator's node order is z-major, so sharding the flat
    (N, 3) node axis over the mesh IS a z-slab decomposition of the grid.
    Because every data movement in the stencil apply is a static slice
    shift, the GSPMD partitioner inserts the +-1-slab halo exchanges
    automatically — no hand-written collectives, exactly the
    "annotate shardings and let XLA insert collectives" recipe.

    Returns (op_sharded, constrain) where ``constrain`` places a nodal
    (N, dpn) array on the same sharding (use it on loads / initial
    guesses so the whole CG runs distributed).

    Requires the flat node count N to divide evenly by the mesh axis size
    (cleanest: pick nz so the grid's z-plane count nz+1 is a multiple of
    the device count — then each device owns whole z-slabs).
    """
    axis = axis_name or mesh.axis_names[0]
    sharding = jax.sharding.NamedSharding(mesh, P(axis, None))
    op_sharded = dataclasses.replace(op, free=jax.device_put(op.free, sharding))

    def constrain(arr):
        return jax.device_put(arr, sharding)

    return op_sharded, constrain


def shard_extruded(op, mg, mesh: Mesh, axis_name: Optional[str] = None):
    """Layer-slab GSPMD decomposition of the extruded (tube) pipeline.

    The extruded node order is layer-major, so sharding the flat (N, 3)
    node axis over the mesh is a z-slab decomposition by LAYERS — the
    extruded twin of :func:`shard_structured_operator`.  All z movement
    in the extruded apply and the z-semicoarsened V-cycle is static
    slicing ([:-1], [1:], strided restriction), so the GSPMD partitioner
    inserts the ±1-layer halo exchanges; the per-layer section-block
    data (minv, Thomas factors) is small and replicated.  The sequential
    Thomas coarse solve runs effectively replicated (its lax.scan
    carries a layer dependency) — the coarse level is O(thomas_layers *
    (3 n2)^2) data, negligible next to the fine-level work.

    Returns (op_sharded, mg_sharded, constrain).  Solve with
    ``fea_tpu.solve.solve_extruded(..., prebuilt=(op_sharded,
    mg_sharded))`` after placing the scene's loads via ``constrain``,
    or call ``solve_operator_fpcg`` directly.  Exact-agreement test:
    tests/test_extruded.py; dryrun mode 6 in __graft_entry__.py.
    """
    from ..ops.extruded_mg import ComposedExtrudedPrecond

    axis = axis_name or mesh.axis_names[0]
    sh = jax.sharding.NamedSharding(mesh, P(axis, None))
    op_sharded = dataclasses.replace(op, free=jax.device_put(op.free, sh))
    # the section-coarse composition wraps the V-cycle: shard the inner
    # mg's level masks; the SectionCoarse payloads (per-layer Thomas
    # factors, aggregate ids) are small and stay replicated like the
    # z-coarse factors
    inner = mg.mg if isinstance(mg, ComposedExtrudedPrecond) else mg
    new_levels = tuple(
        dataclasses.replace(
            lv, op=dataclasses.replace(lv.op, free=jax.device_put(lv.op.free, sh))
        )
        for lv in inner.levels
    )
    inner_sharded = dataclasses.replace(inner, levels=new_levels)
    mg_sharded = (
        dataclasses.replace(mg, mg=inner_sharded)
        if isinstance(mg, ComposedExtrudedPrecond) else inner_sharded
    )

    def constrain(arr):
        return jax.device_put(arr, sh)

    return op_sharded, mg_sharded, constrain


def sharded_sweep(solve_fn, batch_args, mesh: Mesh, axis_name: Optional[str] = None):
    """Data-parallel sweep: vmap solve_fn over the leading batch axis and
    shard that axis across the mesh (the FEA analog of DP).

    ``batch_args`` is a pytree whose leaves have a leading batch dim that
    must be divisible by the mesh axis size.
    """
    axis = axis_name or mesh.axis_names[0]
    batched = jax.vmap(solve_fn)
    sharding = jax.sharding.NamedSharding(mesh, P(axis))
    batch_args = jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch_args)
    out_shardings = jax.sharding.NamedSharding(mesh, P(axis))
    return jax.jit(batched, out_shardings=out_shardings)(batch_args)


def shard_curvilinear(op, mg, mesh: Mesh, axis_name: Optional[str] = None):
    """Z-slab GSPMD decomposition of the curvilinear (variable-weight
    27-offset block-stencil) pipeline — VERDICT r4 #4: the fourth and
    last large-mesh family gains a multi-device path.

    The curvilinear node order is z-major, so sharding the flat (N, 3)
    node axis is a z-slab decomposition of the (Z, Y, X) grid, exactly
    like :func:`shard_structured_operator` — except the stencil weights
    are a per-node FIELD ``w (27, Z, Y, X, 3, 3)`` rather than one
    constant Ke, so the weight field itself is sharded along its Z axis
    and each device holds only its own slab's coefficients (the weight
    field dominates operator memory ~162 f64 words/node; per-device
    state scales ~1/n_dev).  Every data movement in the apply and the
    V-cycle transfers is a static pad/slice shift
    (ops/curvilinear.py::_shifted_states, ops/multigrid.py::_restrict/
    _prolong), so the GSPMD partitioner inserts the ±1-plane halo
    exchanges — on hardware these ride ICI.

    Multigrid levels whose Z-extent no longer yields at least two whole
    planes per device (or does not divide the axis) are replicated —
    they are geometrically tiny (≤ 1/8 the fine level per coarsening)
    and the dense coarsest inverse is already replicated by design.

    Returns ``(op_sharded, mg_sharded, constrain)``; solve with
    ``solve_operator_fpcg(op_sharded, constrain(loads), ...)``.
    Parity test: tests/test_curv_sharding.py; dryrun mode 7 in
    __graft_entry__.py.
    """
    axis = axis_name or mesh.axis_names[0]
    n = mesh.shape[axis]
    sh_flat = jax.sharding.NamedSharding(mesh, P(axis, None))   # (N, 3)
    sh_w = jax.sharding.NamedSharding(mesh, P(None, axis))      # (27, Z, ...)
    sh_grid = jax.sharding.NamedSharding(mesh, P(axis))         # (Z, Y, X, 3)
    rep = jax.sharding.NamedSharding(mesh, P())

    op_sharded = dataclasses.replace(
        op,
        w=jax.device_put(op.w, sh_w),
        free=jax.device_put(op.free, sh_flat),
    )

    def _shard_level(lv):
        Z = lv.free.shape[0]
        if Z % n == 0 and Z >= 2 * n:
            return dataclasses.replace(
                lv,
                w=jax.device_put(lv.w, sh_w),
                free=jax.device_put(lv.free, sh_grid),
                inv_diag=jax.device_put(lv.inv_diag, sh_grid),
            )
        return dataclasses.replace(
            lv,
            w=jax.device_put(lv.w, rep),
            free=jax.device_put(lv.free, rep),
            inv_diag=jax.device_put(lv.inv_diag, rep),
        )

    mg_sharded = dataclasses.replace(
        mg,
        levels=tuple(_shard_level(lv) for lv in mg.levels),
        coarse_inv=jax.device_put(mg.coarse_inv, rep),
    )

    def constrain(arr):
        return jax.device_put(arr, sh_flat)

    return op_sharded, mg_sharded, constrain
