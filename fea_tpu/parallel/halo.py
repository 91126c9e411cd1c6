"""z-slab domain decomposition of the flagship transposed Pallas pipeline.

VERDICT.md round-2 #4: the production solver (host-staged double-f32 FCG
over the fused Pallas dd stencil + f32 Pallas multigrid V-cycle) was
single-device only — everything sharded ran the ~4-10x slower XLA
pad-add twin.  This module makes the flagship kernels themselves the
multichip path:

  * The transposed state ``(3, Y, X, Z)`` is sharded along Z (the beam's
    long axis — the only one with pod-scale extent) over a 1D
    ``jax.sharding.Mesh`` axis (default ``"z"``).
  * Each stencil apply exchanges one ±1 z-plane halo with its neighbors
    (``lax.ppermute`` — two sends of a (3, Y, X) plane, ~13 KB at bench
    size, riding ICI on real hardware) and runs the UNMODIFIED Pallas
    kernel body per shard in halo form (``z_halo=True``: a halo-extended
    block is shape-identical to the kernel's own zero-padded one, so the
    kernel change is just "don't zero-pad z").
  * The kernel's z-boundary corrections are weight-table rows
    (``pallas_stencil.z_boundary_row_masks``), so per-device gating
    needs no kernel logic: z-min rows are scaled by ``axis_index == 0``.
    z-max rows are zeroed everywhere and the global z-max plane's
    correction is added as a thin-slab XLA term
    (``pallas_stencil.z_slab_correction``) on the last device —
    necessary because multigrid-compatible grids have odd Z (nz must be
    even to coarsen), so Z never divides the device count: the state is
    zero-padded to ``Zp = n * ceil(Z / n)`` planes (marked fixed) and
    the global end plane sits at a static mid-block column of the last
    shard, out of reach of the in-kernel correction.
  * The multigrid V-cycle shards its FINE level (where ~7/8 of the work
    is); levels 1+ run replicated on every device after one
    ``all_gather`` of the fine defect — no further communication, and no
    coarsening/divisibility constraints.  Amdahl cost: the un-sharded
    ~1/8 of V-cycle work.
  * The FCG Krylov algebra reuses the single-device staged stage
    programs (solve.py ``_st_*``) unchanged: they are elementwise ops +
    tree-reduction dots, which GSPMD auto-partitions over the same
    NamedSharding-placed arrays (dots become all-reduces).

Reference analog: none — the reference is a serial Python loop
(/root/reference/fea.py:89-97); SURVEY.md §5.8 specifies exactly this
halo-exchange design as the TPU-native replacement for an MPI backend.

Exact-agreement tests against the single-device staged solver on an
8-virtual-device CPU mesh: tests/test_halo_sharding.py.  Exercised as
dryrun mode 5 in __graft_entry__.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import df64
from ..ops.multigrid import _prolong, _restrict, chebyshev_smooth
from ..ops.pallas_stencil import (
    StencilTables,
    StencilTablesDD,
    stencil_apply_transposed,
    stencil_apply_transposed_dd,
    stencil_tables_dd,
    z_boundary_row_masks,
    z_slab_correction,
)
from ..ops.transposed import MultigridT
from ..solvers.cg import SolveStats

__all__ = ["ZShardedSolver", "build_zsharded_solver"]

_ZMIN_ROWS, _ZMAX_ROWS = z_boundary_row_masks()


def _gate_w(w: jax.Array, axis: str) -> jax.Array:
    """Per-shard scaling of a (125, 3, 3) weight table: z-min correction
    rows only on the first device, z-max rows removed everywhere (the
    XLA slab term on the last device replaces them)."""
    on_first = (lax.axis_index(axis) == 0).astype(w.dtype)
    scale = jnp.where(jnp.asarray(_ZMIN_ROWS), on_first, jnp.ones((), w.dtype))
    scale = jnp.where(jnp.asarray(_ZMAX_ROWS), jnp.zeros((), w.dtype), scale)
    return w * scale[:, None, None]


def _halo_exchange(x: jax.Array, axis: str) -> jax.Array:
    """Append the neighbors' boundary z-planes: (3, Y, X, Zl) ->
    (3, Y, X, Zl + 2), zeros at the global ends."""
    n = lax.axis_size(axis)
    if n == 1:
        zero = jnp.zeros_like(x[..., :1])
        return jnp.concatenate([zero, x, zero], axis=-1)
    idx = lax.axis_index(axis)
    from_left = lax.ppermute(x[..., -1:], axis, [(i, (i + 1) % n) for i in range(n)])
    from_right = lax.ppermute(x[..., :1], axis, [(i, (i - 1) % n) for i in range(n)])
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(idx == n - 1, jnp.zeros_like(from_right), from_right)
    return jnp.concatenate([from_left, x, from_right], axis=-1)


# -- per-shard apply bodies (called inside shard_map) -------------------------


def _dd_apply_shard(ddtabs, hi, lo, *, axis, z_real, interpret):
    """Raw dd stencil apply on one shard's (already masked) pair."""
    gated = StencilTablesDD(
        w1=_gate_w(ddtabs.w1, axis), w2=_gate_w(ddtabs.w2, axis),
        whi=_gate_w(ddtabs.whi, axis), wlo=_gate_w(ddtabs.wlo, axis),
    )
    ehi = _halo_exchange(hi, axis)
    elo = _halo_exchange(lo, axis)
    fh, fl = stencil_apply_transposed_dd(
        None, None, None, None, ehi, elo, tables=gated,
        interpret=interpret, z_halo=True,
    )
    # global z-max plane correction on one thin slab, in f64 (emulated
    # f64 on a (3, Y, X) plane is O(1/Z) of the kernel's work).  The
    # owning device and local column are static: plane z_real - 1 lives
    # on shard (z_real - 1) // Zl (not necessarily the last shard — the
    # zero padding can exceed one shard for tiny test grids).
    Zl = hi.shape[-1]
    dev_corr, cl = divmod(z_real - 1, Zl)
    w64 = ddtabs.whi.astype(jnp.float64) + ddtabs.wlo.astype(jnp.float64)
    slab64 = ehi[..., cl + 1].astype(jnp.float64) + elo[..., cl + 1].astype(jnp.float64)
    corr = z_slab_correction(w64, slab64, "max")
    corr = jnp.where(lax.axis_index(axis) == dev_corr, corr, jnp.zeros_like(corr))
    cur = fh[..., cl].astype(jnp.float64) + fl[..., cl].astype(jnp.float64) + corr
    chi = cur.astype(jnp.float32)
    clo = (cur - chi.astype(jnp.float64)).astype(jnp.float32)
    return fh.at[..., cl].set(chi), fl.at[..., cl].set(clo)


def _f32_apply_shard(tables, g, *, axis, z_real, interpret):
    """Raw f32 stencil apply on one shard."""
    gated = StencilTables(w=_gate_w(tables.w, axis))
    ext = _halo_exchange(g, axis)
    out = stencil_apply_transposed(
        None, ext, tables=gated, interpret=interpret, z_halo=True
    )
    Zl = g.shape[-1]
    dev_corr, cl = divmod(z_real - 1, Zl)
    corr = z_slab_correction(tables.w, ext[..., cl + 1], "max")
    corr = jnp.where(lax.axis_index(axis) == dev_corr, corr, jnp.zeros_like(corr))
    return out.at[..., cl].add(corr)


def _restrict_z_shard(d, *, axis):
    """Per-shard full-weighting restriction: y/x locally, z via the ±1
    halo (coarse plane j at fine 2j needs fine 2j-1 .. 2j+1, all in the
    halo-extended slab; even local plane counts keep local even indices
    global-even).  (3, Y, X, Zl) -> (3, Yc, Xc, Zl // 2)."""
    Zl2 = d.shape[-1] // 2
    d_ext = _halo_exchange(d, axis)
    dyx = _restrict(d_ext, axes=(1, 2))
    even = dyx[..., 1::2][..., :Zl2]
    left = dyx[..., 0::2][..., :Zl2]
    right = dyx[..., 2::2][..., :Zl2]
    return even + 0.5 * (left + right)


def _prolong_z_interleave(zcp, Zl):
    """Interleave even/odd fine planes from a y/x-prolonged local coarse
    slab with one right-halo plane: (..., Zl/2 + 1) -> (..., Zl)."""
    ev = zcp[..., :-1]
    od = 0.5 * (zcp[..., :-1] + zcp[..., 1:])
    return jnp.stack([ev, od], axis=-1).reshape(ev.shape[:-1] + (Zl,))


def _l1_cycle(l1, rc_loc, *, axis, degree, lam_min_frac, interpret):
    """Sharded LEVEL-1 segment of the V-cycle (round-4, VERDICT r3 #8).

    The level-1 smoother runs over the same z mesh as the fine level —
    level-1 state, mask, and diagonal are z-slab sharded (1/n_dev per
    device instead of replicated), its applies use the identical gated
    per-shard stencil machinery, and only the <= 1/64-size LEVEL-2
    defect is all-gathered for the replicated coarse remainder."""
    F1 = l1["free"]
    Zl2 = rc_loc.shape[-1]
    rc = F1 * rc_loc.astype(jnp.float32)

    def apply1(g):
        raw = _f32_apply_shard(
            l1["tables"], F1 * g, axis=axis, z_real=l1["z_real"],
            interpret=interpret,
        )
        return F1 * raw + (1.0 - F1) * g

    def smooth1(x, rr):
        return chebyshev_smooth(
            apply1, l1["inv_diag"], l1["lam"], lam_min_frac, degree, x, rr
        )

    z1 = smooth1(jnp.zeros_like(rc), rc)
    d1 = rc - apply1(z1)
    rc2_loc = _restrict_z_shard(d1, axis=axis)
    mg_rest2 = l1["mg_rest2"]
    coarse2 = mg_rest2.levels[0]
    z2_planes = coarse2.free.shape[-1]
    rc2_full = lax.all_gather(rc2_loc, axis, axis=3, tiled=True)[..., :z2_planes]
    c_dtype = coarse2.ke.dtype
    rc2 = coarse2.free.astype(c_dtype) * rc2_full.astype(c_dtype)
    zc2 = mg_rest2._vcycle(0, rc2)
    zc2_f = (coarse2.free.astype(zc2.dtype) * zc2).astype(rc.dtype)
    Zl4 = Zl2 // 2
    n = lax.axis_size(axis)
    zc2_pad = jnp.pad(
        zc2_f, ((0, 0), (0, 0), (0, 0), (0, n * Zl4 + 1 - z2_planes))
    )
    k0 = lax.axis_index(axis) * Zl4
    zc2_loc = lax.dynamic_slice_in_dim(zc2_pad, k0, Zl4 + 1, axis=3)
    corr1 = _prolong_z_interleave(_prolong(zc2_loc, axes=(1, 2)), Zl2)
    return smooth1(z1 + F1 * corr1, rc)


def _vcycle_shard(tables, mg_rest, free, inv_diag, lam_max, r, *,
                  axis, z_real, z_pad, degree, lam_min_frac, interpret,
                  l1=None):
    """Sharded fine level (+ optionally sharded level 1) + replicated
    coarse remainder of the V-cycle.

    Mirrors ``MultigridT._vcycle`` level 0; ``mg_rest`` is a MultigridT
    holding levels 1+ and the coarse inverse, evaluated identically
    (redundantly) on every device — UNLESS ``l1`` is given (round-4,
    VERDICT r3 #8), in which case level 1 also runs z-slab sharded
    (:func:`_l1_cycle`) and only the <= 1/64-size level-2 defect is
    gathered.

    Communication (VERDICT.md r2 #4): the fine defect is RESTRICTED
    PER-SHARD (one ±1-plane halo exchange; even ``Zl`` aligns local
    even indices with global even indices) and only the deepest
    replicated level's defect is all-gathered; prolongation back is
    computed per-shard — no full-fine-mesh array ever exists on a
    single device."""
    Ff = free
    Zl = r.shape[-1]
    Zl2 = Zl // 2
    Zc = (z_real + 1) // 2  # coarse node planes (z_real is odd: nz even)

    def apply_fine(g):
        raw = _f32_apply_shard(tables, Ff * g, axis=axis, z_real=z_real,
                               interpret=interpret)
        return Ff * raw + (1.0 - Ff) * g

    def smooth(x, rr):
        return chebyshev_smooth(
            apply_fine, inv_diag, lam_max, lam_min_frac, degree, x, rr
        )

    z = smooth(jnp.zeros_like(r), r)
    d = r - apply_fine(z)
    rc_loc = _restrict_z_shard(d, axis=axis)
    if l1 is not None:
        zc_f = l1["free"] * _l1_cycle(
            l1, rc_loc, axis=axis, degree=degree,
            lam_min_frac=lam_min_frac, interpret=interpret,
        ).astype(r.dtype)
        # per-shard prolongation from the SHARDED level-1 correction:
        # the +1 interpolation plane comes from the right halo
        ext = _halo_exchange(zc_f, axis)
        zc_loc = ext[..., 1 : Zl2 + 2]
        corr = _prolong_z_interleave(_prolong(zc_loc, axes=(1, 2)), Zl)
        return smooth(z + Ff * corr, r)
    rc_full = lax.all_gather(rc_loc, axis, axis=3, tiled=True)[..., :Zc]
    coarse = mg_rest.levels[0]
    c_dtype = coarse.ke.dtype
    rc = coarse.free.astype(c_dtype) * rc_full.astype(c_dtype)
    zc = mg_rest._vcycle(0, rc)
    zc_f = (coarse.free.astype(zc.dtype) * zc).astype(r.dtype)
    # per-shard prolongation: slice the local coarse planes (+1 for the
    # odd-plane interpolation), prolong y/x locally, interleave along z
    zc_pad = jnp.pad(
        zc_f, ((0, 0), (0, 0), (0, 0), (0, z_pad // 2 + 1 - Zc))
    )
    k0 = lax.axis_index(axis) * Zl2
    zc_loc = lax.dynamic_slice_in_dim(zc_pad, k0, Zl2 + 1, axis=3)
    corr = _prolong_z_interleave(_prolong(zc_loc, axes=(1, 2)), Zl)
    return smooth(z + Ff * corr, r)


# -- sharded layout transforms (device-side, GSPMD-partitioned) ---------------


# The flat interchange format is the PADDED z-major (Np, 3) with
# Np = Zp * Y * X: divisible by the mesh size by construction, so row
# slabs shard evenly (the real N = Z * Y * X rarely divides the device
# count).  Pad rows are fixed/zero and sliced off only at the API edge.


@partial(jax.jit, static_argnames=("grid_shape", "z_pad", "shard"))
def _t_of_flat_jit(flat_pad, *, grid_shape, z_pad, shard):
    Z, Y, X = grid_shape
    g = jnp.transpose(flat_pad.reshape(z_pad, Y, X, 3), (3, 1, 2, 0))
    return jax.lax.with_sharding_constraint(g, shard)


@partial(jax.jit, static_argnames=("grid_shape", "z_pad", "shard"))
def _t_pair_of_flat_jit(flat64_pad, *, grid_shape, z_pad, shard):
    g = _t_of_flat_jit(flat64_pad, grid_shape=grid_shape, z_pad=z_pad,
                       shard=shard)
    hi = g.astype(jnp.float32)
    lo = (g - hi.astype(jnp.float64)).astype(jnp.float32)
    return (
        jax.lax.with_sharding_constraint(hi, shard),
        jax.lax.with_sharding_constraint(lo, shard),
    )


@partial(jax.jit, static_argnames=("shard",))
def _flat_of_t_jit(gT, *, shard):
    flat = jnp.transpose(gT, (3, 1, 2, 0)).reshape(-1, 3)
    return jax.lax.with_sharding_constraint(flat, shard)


@jax.jit
def _combine_T_jit(pair):
    return df64.combine(pair, jnp.float64)


@jax.jit
def _split_T_jit(gT64):
    hi = gT64.astype(jnp.float32)
    return hi, (gT64 - hi.astype(jnp.float64)).astype(jnp.float32)


# -- the sharded staged solver ------------------------------------------------


class ZShardedSolver:
    """Staged FCG solve with the production Pallas pipeline z-sharded.

    Built by :func:`build_zsharded_solver`.  Not a pytree — holds device
    data (NamedSharding-placed) plus the two compiled shard_map stage
    programs; the Krylov algebra stages are the single-device ``_st_*``
    programs under GSPMD.
    """

    def __init__(self, op_hi, mg_t: MultigridT, mesh: Mesh, axis: str = "z",
                 *, interpret: bool = False, shard_levels: int = 2):
        if len(mg_t.levels) < 2:
            raise ValueError(
                "z-sharded solve needs a >= 2-level hierarchy (the fine "
                "level shards, levels 1+ replicate); got "
                f"{len(mg_t.levels)} level(s) — enlarge the scene or lower "
                "coarse_dof_limit"
            )
        Z, Y, X = op_hi.grid_shape
        n = mesh.shape[axis]
        # level-1 sharding (round-4, VERDICT r3 #8) needs a >= 3-level
        # hierarchy (level 1 shards like the fine level; the replicated
        # remainder needs >= 1 level + the coarse inverse) and local
        # level-1 plane counts that stay even (Zl % 4)
        self.shard_l1 = shard_levels >= 2 and len(mg_t.levels) >= 3
        Zl = -(-Z // n)
        if self.shard_l1:
            Zl += (-Zl) % 4  # Zl2 even: level-1 local evens stay global-even
        else:
            Zl += Zl % 2  # even shards: local even z indices stay
            # global-even, so the per-shard restriction needs only ±1 halo
        Zp = n * Zl
        self.mesh, self.axis = mesh, axis
        self.grid_shape = (Z, Y, X)
        self.z_pad = Zp
        self.interpret = interpret
        self.hi_dtype = op_hi.free.dtype
        # for the sharded exact-f64 certification (baked into the
        # shard_map program as a host constant) and the final
        # prescribed-row restore (padded row-sharded mask)
        self._op_ke = np.asarray(op_hi.ke, np.float64)
        self._exact_res_prog = None

        vspec = P(None, None, None, axis)
        self._vshard = NamedSharding(mesh, vspec)
        rep = NamedSharding(mesh, P())

        def put_v(arr):
            a = np.asarray(arr)
            if a.shape[-1] != Zp:
                a = np.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, Zp - a.shape[-1])])
            return jax.device_put(jnp.asarray(a), self._vshard)

        free_np = np.transpose(
            np.asarray(op_hi.free, np.float32).reshape(Z, Y, X, 3), (3, 1, 2, 0)
        )
        self.freeT32 = put_v(free_np)
        self.freeT64 = put_v(free_np.astype(np.float64))
        self.ones32 = put_v(np.ones_like(free_np))
        self._free_flat_pad = self.put_flat(
            np.asarray(op_hi.free, np.float64), jnp.float64
        )
        self.ddtabs = jax.device_put(
            stencil_tables_dd(np.asarray(op_hi.ke, np.float64)), rep
        )

        fine = mg_t.levels[0]
        if fine.tables is None:
            from ..ops.pallas_stencil import stencil_tables

            ftables = stencil_tables(np.asarray(fine.ke, np.float64))
        else:
            ftables = fine.tables
        self.fine_tables = jax.device_put(ftables, rep)
        self.fine_free = put_v(np.asarray(fine.free, np.float32))
        inv_d = np.asarray(fine.inv_diag, np.float32)
        inv_d = np.pad(
            inv_d, [(0, 0)] * 3 + [(0, Zp - Z)], constant_values=1.0
        )
        self.fine_inv_diag = jax.device_put(jnp.asarray(inv_d), self._vshard)
        self.fine_lam = jax.device_put(jnp.asarray(fine.lam_max, jnp.float32), rep)
        rest_from = 2 if self.shard_l1 else 1
        self.mg_rest = jax.device_put(
            MultigridT(
                levels=mg_t.levels[rest_from:], coarse_inv=mg_t.coarse_inv,
                degree=mg_t.degree, lam_min_frac=mg_t.lam_min_frac,
                lam_max_safety=mg_t.lam_max_safety,
            ),
            rep,
        )
        self.degree = mg_t.degree
        self.lam_min_frac = mg_t.lam_min_frac

        self.l1 = None
        if self.shard_l1:
            lvl1 = mg_t.levels[1]
            if lvl1.tables is None:
                from ..ops.pallas_stencil import stencil_tables

                t1 = stencil_tables(np.asarray(lvl1.ke, np.float64))
            else:
                t1 = lvl1.tables
            Zp2 = Zp // 2
            Zc_r = int(np.asarray(lvl1.free).shape[-1])  # real L1 planes

            def put_v2(arr, pad_value=0.0):
                a = np.asarray(arr)
                if a.shape[-1] != Zp2:
                    a = np.pad(
                        a, [(0, 0)] * (a.ndim - 1) + [(0, Zp2 - a.shape[-1])],
                        constant_values=pad_value,
                    )
                return jax.device_put(jnp.asarray(a), self._vshard)

            self.l1 = {
                "tables": jax.device_put(t1, rep),
                "free": put_v2(np.asarray(lvl1.free, np.float32)),
                "inv_diag": put_v2(
                    np.asarray(lvl1.inv_diag, np.float32), pad_value=1.0
                ),
                "lam": jax.device_put(
                    jnp.asarray(lvl1.lam_max, jnp.float32), rep
                ),
            }
            self._l1_z_real = Zc_r

        smap = partial(shard_map, mesh=mesh, check_vma=False)
        sd = P()
        dd_spec = StencilTablesDD(w1=sd, w2=sd, whi=sd, wlo=sd)
        f32_spec = StencilTables(w=sd)
        mg_spec = jax.tree_util.tree_map(lambda _: sd, self.mg_rest)
        vp = (vspec, vspec)

        def apply_dot_body(ddtabs, mask, p_pair):
            G = 1.0 - mask
            fh, fl = _dd_apply_shard(
                ddtabs, mask * p_pair[0], mask * p_pair[1],
                axis=axis, z_real=Z, interpret=interpret,
            )
            Ap = (mask * fh + G * p_pair[0], mask * fl + G * p_pair[1])
            return Ap, lax.psum(df64.dot(p_pair, Ap), axis)

        self._apply_dot = jax.jit(
            smap(
                apply_dot_body,
                in_specs=(dd_spec, vspec, vp),
                out_specs=(vp, P()),
            )
        )

        l1_z_real = getattr(self, "_l1_z_real", None)

        def precond_p_body(tables, mg_rest, free, inv_diag, lam,
                           l1_arrs, r_pair, r_old_pair, rz, p_pair):
            # V-cycle + Polak-Ribiere beta + p-update in ONE program
            # (mirrors solve.py::_st_precond_p, incl. its pre-loop reuse:
            # with a zero p the beta term vanishes exactly, so p = z)
            l1 = None
            if l1_arrs is not None:
                l1 = dict(l1_arrs)
                l1["z_real"] = l1_z_real
                l1["mg_rest2"] = mg_rest
            z32 = _vcycle_shard(
                tables, mg_rest, free, inv_diag, lam, r_pair[0],
                axis=axis, z_real=Z, z_pad=Zp, degree=self.degree,
                lam_min_frac=self.lam_min_frac, interpret=interpret,
                l1=l1,
            )
            zp = df64.from_f32(z32)
            rz_new = lax.psum(df64.dot(r_pair, zp), axis)
            rz_old_z = lax.psum(df64.dot(r_old_pair, zp), axis)
            beta = (rz_new - rz_old_z) / jnp.where(
                rz != 0, rz, jnp.asarray(1.0, rz.dtype)
            )
            p_new = df64.axpy(beta, p_pair, zp)
            return p_new, rz_new

        l1_spec = (
            None if self.l1 is None else {
                "tables": jax.tree_util.tree_map(
                    lambda _: sd, self.l1["tables"]
                ),
                "free": vspec,
                "inv_diag": vspec,
                "lam": sd,
            }
        )
        self._precond_p = jax.jit(
            smap(
                precond_p_body,
                in_specs=(
                    f32_spec, mg_spec, vspec, vspec, sd, l1_spec,
                    vp, vp, P(), vp,
                ),
                out_specs=(vp, P()),
            )
        )

    # -- data movement --------------------------------------------------------
    #
    # All transforms between the flat z-major (N, 3) view and the padded
    # transposed (3, Y, X, Zp) solver layout run ON DEVICE under jit with
    # sharding constraints (VERDICT.md r2 #4): flat z-major rows sharded
    # over the mesh ARE z-slabs, so both representations stay distributed
    # and no full-mesh array ever lands on one device.  (The old path
    # round-tripped through host NumPy — fine at dryrun scale, fatal at
    # the pod-scale meshes that are the only reason to shard.)

    def _nshard(self):
        """Sharding for PADDED flat (Np, 3) z-major arrays: row slabs."""
        return NamedSharding(self.mesh, P(self.axis, None))

    def put_flat(self, flat, dtype=jnp.float64):
        """(N, 3) or (Np, 3) input -> padded flat rows, sharded.  Host
        inputs pad on the host (their one unsharded existence is the
        caller's own array); device inputs are assumed already padded."""
        Z, Y, X = self.grid_shape
        N = Z * Y * X
        Np = self.z_pad * Y * X
        if isinstance(flat, jax.Array) and flat.shape[0] == Np:
            return jax.device_put(flat.astype(dtype), self._nshard())
        a = np.asarray(flat, dtype)
        if a.shape[0] == N:
            a = np.pad(a, ((0, Np - N), (0, 0)))
        return jax.device_put(jnp.asarray(a), self._nshard())

    def to_sharded_T(self, flat, dtype=None):
        """Flat (N, 3) -> padded transposed (3, Y, X, Zp), sharded."""
        a = self.put_flat(flat, dtype or jnp.asarray(flat).dtype)
        return _t_of_flat_jit(
            a, grid_shape=self.grid_shape, z_pad=self.z_pad,
            shard=self._vshard,
        )

    def pair_of_f64(self, flat64):
        """f64 (N, 3) -> sharded (hi, lo) f32 pair, transposed."""
        a = self.put_flat(flat64, jnp.float64)
        return _t_pair_of_flat_jit(
            a, grid_shape=self.grid_shape, z_pad=self.z_pad,
            shard=self._vshard,
        )

    def from_T_pair(self, pair):
        """Sharded transposed pair -> sharded f64 padded flat (Np, 3)."""
        return self._flat_of_T(_combine_T_jit(pair))

    # -- exact-f64 certification, sharded -------------------------------------

    def _exact_res_T(self, loadsT64, uT64, duT64):
        """(u_new, r, ||r||, A_raw u) in the transposed sharded layout —
        the z-sharded twin of ``solve._t_true_residual``.  Per shard:
        one ±1-plane f64 halo exchange, the exact XLA f64 element-sum
        stencil on the halo-extended slab, and thin-slab subtraction of
        the phantom-element over-count at the two global end planes.
        No array here ever exceeds one shard's slab (VERDICT.md r2 #4)."""
        if self._exact_res_prog is None:
            from ..ops.structured import stencil_apply_grid

            Z, Y, X = self.grid_shape
            axis = self.axis
            ke64 = np.asarray(self._op_ke, np.float64)

            def phantom(ke, plane_T, side):
                # contribution of a phantom element layer on ``side`` of
                # a plane whose neighbor plane is zero: one 1-element-
                # layer stencil apply on a (2, Y, X, 3) slab
                p = jnp.transpose(plane_T, (1, 2, 0))  # (Y, X, 3)
                if side == "below":
                    g2 = jnp.stack([jnp.zeros_like(p), p])
                    out = stencil_apply_grid(ke, g2, (X - 1, Y - 1, 1))[1]
                else:
                    g2 = jnp.stack([p, jnp.zeros_like(p)])
                    out = stencil_apply_grid(ke, g2, (X - 1, Y - 1, 1))[0]
                return jnp.transpose(out, (2, 0, 1))  # (3, Y, X)

            def body(ke, free, loadsT, uT, duT):
                u = uT + duT
                ext = _halo_exchange(u, axis)  # (3, Y, X, Zl + 2) f64
                Zl = u.shape[-1]
                g = jnp.transpose(ext, (3, 1, 2, 0))  # (Zl+2, Y, X, 3)
                out = stencil_apply_grid(ke, g, (X - 1, Y - 1, Zl + 1))
                AuT = jnp.transpose(out[1:-1], (3, 1, 2, 0))
                idx = lax.axis_index(axis)
                on0 = (idx == 0).astype(u.dtype)
                pmin = phantom(ke, ext[..., 1], "below")
                AuT = AuT.at[..., 0].add(-on0 * pmin)
                dev_corr, cl = divmod(Z - 1, Zl)
                onc = (idx == dev_corr).astype(u.dtype)
                pmax = phantom(ke, ext[..., cl + 1], "above")
                AuT = AuT.at[..., cl].add(-onc * pmax)
                r = free * (loadsT - AuT)
                rn2 = lax.psum(jnp.sum(r * r), axis)
                return u, r, jnp.sqrt(rn2), AuT

            vspec = P(None, None, None, self.axis)
            self._exact_res_prog = jax.jit(
                partial(shard_map, mesh=self.mesh, check_vma=False)(
                    partial(body, jnp.asarray(ke64)),
                    in_specs=(vspec, vspec, vspec, vspec),
                    out_specs=(vspec, vspec, P(), vspec),
                )
            )
        return self._exact_res_prog(self.freeT64, loadsT64, uT64, duT64)

    # -- the solve ------------------------------------------------------------

    def _solve_pair(self, b_pair, b2, x_pair, r_pair, rr, *, tol, max_iters,
                    say):
        """The staged FCG loop on prepared (b, x0, r) pairs; returns
        (x_pair, SolveStats)."""
        from ..solve import _st_update_xr

        b_norm = float(jnp.sqrt(b2))
        safe_b_norm = b_norm if b_norm > 0 else 1.0
        say("sharded: V-cycle")
        # pre-loop start reuses the in-loop program: zero p annihilates
        # the beta term exactly (x_pair is a throwaway r_old; every
        # argument a distinct buffer — see solve.py::_st_precond_p)
        p_pair, rz = self._precond_p(
            self.fine_tables, self.mg_rest, self.fine_free, self.fine_inv_diag,
            self.fine_lam, self.l1, r_pair, x_pair,
            jnp.asarray(1.0, jnp.float64),
            (jnp.zeros_like(r_pair[0]), jnp.zeros_like(r_pair[1])),
        )
        rr_f = float(rr)
        blowup = 1e12 * max(rr_f, safe_b_norm * safe_b_norm)
        k = 0
        converged = rr_f**0.5 <= tol * safe_b_norm
        say("sharded: dd apply + algebra")
        while not converged and k < max_iters and rr_f < blowup and rr_f == rr_f:
            Ap_pair, pAp = self._apply_dot(self.ddtabs, self.freeT32, p_pair)
            x_pair, r_new, rr = _st_update_xr(rz, pAp, p_pair, Ap_pair, x_pair, r_pair)
            p_pair, rz_new = self._precond_p(
                self.fine_tables, self.mg_rest, self.fine_free,
                self.fine_inv_diag, self.fine_lam, self.l1, r_new, r_pair,
                rz, p_pair,
            )
            r_pair, rz = r_new, rz_new
            k += 1
            rr_f = float(rr)
            converged = rr_f**0.5 <= tol * safe_b_norm
            if k <= 2 or k % 5 == 0:
                say(f"sharded iter {k}: rel_res {rr_f**0.5 / safe_b_norm:.3e}")
        res = rr_f**0.5
        stats = SolveStats(
            iterations=jnp.asarray(k, jnp.int32),
            residual_norm=jnp.asarray(res, jnp.float64),
            relative_residual=jnp.asarray(res / safe_b_norm, jnp.float64),
            converged=jnp.asarray(bool(converged), bool),
        )
        return x_pair, stats

    def _setup_from_loads(self, loads, prescribed):
        from ..solve import (
            _st_mask_pair,
            _st_pair_norm2,
            _st_rhs_inhomog,
            _st_setup_homog,
            _st_split_fixed,
        )

        loads_pair = self.pair_of_f64(loads)
        loadsT64 = loads_pair[0].astype(jnp.float64) + loads_pair[1].astype(jnp.float64)
        if prescribed is None:
            b_pair, b2 = _st_setup_homog(self.freeT32, loadsT64)
            x_pair = (jnp.zeros_like(b_pair[0]), jnp.zeros_like(b_pair[1]))
            return loadsT64, b_pair, b2, x_pair, b_pair, b2
        presc_pair = self.pair_of_f64(prescribed)
        xp_pair = _st_split_fixed(
            self.freeT32,
            presc_pair[0].astype(jnp.float64) + presc_pair[1].astype(jnp.float64),
        )
        Axp, _ = self._apply_dot(self.ddtabs, self.ones32, xp_pair)
        b_pair, b2 = _st_rhs_inhomog(self.freeT32, loadsT64, Axp, xp_pair)
        r_pair = _st_mask_pair(self.freeT32, b_pair)
        return loadsT64, b_pair, b2, xp_pair, r_pair, _st_pair_norm2(r_pair)

    def solve(self, loads, prescribed=None, *, tol=1e-8, max_iters=300,
              progress=None, refine_true=True, max_refine=3,
              want_reactions=True):
        """Host-staged FCG — the sharded twin of
        ``solve.solve_operator_fpcg_t_staged`` (same recurrence, same
        per-iteration stage sequence, dots all-reduced over the mesh).

        ``refine_true`` (default): certify/refine against the exact f64
        operator — the dd kernel's cancellation-amplified apply floor
        makes the raw recurrence optimistic near equilibrium.  The
        certification apply, the refinement iterate, and every
        correction stay z-slab SHARDED end to end (``_exact_res_T``);
        the single-device host-IEEE tier of the unsharded path does not
        apply here (at pod scale, gathering the iterate IS the step this
        path removes — scale the mesh, not the gather)."""
        from ..solve import _DD_RECURRENCE_FLOOR, Solution

        say = progress if progress is not None else (lambda s: None)
        loadsT64, b_pair, b2, x0_pair, r_pair, rr = self._setup_from_loads(
            loads, prescribed
        )
        b_norm = float(jnp.sqrt(b2))
        safe_b_norm = b_norm if b_norm > 0 else 1.0
        tol1 = tol if not refine_true else max(tol, _DD_RECURRENCE_FLOOR)
        x_pair, stats = self._solve_pair(
            b_pair, b2, x0_pair, r_pair, rr, tol=tol1, max_iters=max_iters,
            say=say,
        )
        iters = int(stats.iterations)
        uT = _combine_T_jit(x_pair)
        if refine_true and bool(stats.converged):
            zeroT = jnp.zeros_like(uT)
            uT, rT, rn, AuT = self._exact_res_T(loadsT64, uT, zeroT)
            rn_f = float(rn)
            passes = 0
            while rn_f > tol * safe_b_norm and passes < max_refine and np.isfinite(rn_f):
                say(
                    f"sharded refine pass {passes + 1}: true rel_res "
                    f"{rn_f / safe_b_norm:.3e} — solving the correction"
                )
                tol_pass = min(1e-2, max(0.3 * tol * safe_b_norm / rn_f, tol))
                r_split = _split_T_jit(rT)
                rn2 = jnp.asarray(rn_f * rn_f, jnp.float64)
                d_pair, st_d = self._solve_pair(
                    r_split, rn2,
                    (jnp.zeros_like(rT, jnp.float32),) * 2,
                    r_split, rn2,
                    tol=tol_pass, max_iters=max_iters, say=say,
                )
                iters += int(st_d.iterations)
                if not bool(st_d.converged):
                    break
                uT, rT, rn, AuT = self._exact_res_T(
                    loadsT64, uT, _combine_T_jit(d_pair)
                )
                rn_f = float(rn)
                passes += 1
            stats = SolveStats(
                iterations=jnp.asarray(iters, jnp.int32),
                residual_norm=jnp.asarray(rn_f, jnp.float64),
                relative_residual=jnp.asarray(rn_f / safe_b_norm, jnp.float64),
                converged=jnp.asarray(bool(rn_f <= tol * safe_b_norm), bool),
            )
            u = self._flat_of_T(uT)
            reactions = self._flat_of_T(AuT) if want_reactions else None
        else:
            u = self.from_T_pair(x_pair)
            reactions = None
            if want_reactions:
                say("sharded: reactions")
                react_pair, _ = self._apply_dot(self.ddtabs, self.ones32, x_pair)
                reactions = self.from_T_pair(react_pair)
        if prescribed is not None:
            pres = self.put_flat(prescribed, jnp.float64)
            u = jnp.where(self._free_flat_pad > 0, u, pres)
        # API edge: strip the z padding (the only place the real-N view
        # exists; everything upstream stayed padded + row/slab sharded)
        Z, Y, X = self.grid_shape
        N = Z * Y * X
        u = u[:N]
        if reactions is not None:
            reactions = reactions[:N]
        return Solution(displacements=u, reactions=reactions, stats=stats)

    def _flat_of_T(self, gT64):
        return _flat_of_t_jit(gT64, shard=self._nshard())


def build_zsharded_solver(
    op_hi,
    mg,
    mesh: Mesh,
    axis: str = "z",
    *,
    interpret: bool = False,
    shard_levels: int = 2,
) -> ZShardedSolver:
    """Build the z-sharded production solver.

    ``op_hi``: an f64 ``StructuredOperator``; ``mg``: a ``MultigridT``
    (or a flat-layout hierarchy, converted here); ``mesh``: a 1D device
    mesh whose ``axis`` names the z shards.  ``interpret=True`` runs the
    Pallas kernels in interpreter mode (CPU tests).  ``shard_levels``
    (round-4, VERDICT r3 #8): 2 (default) z-shards multigrid level 1 as
    well as the fine level when the hierarchy is deep enough — per-device
    MG state then scales ~1/n_dev and only the <= 1/64-size level-2
    defect is gathered; 1 restores the fine-only sharding."""
    from ..ops.transposed import transpose_multigrid

    if not isinstance(mg, MultigridT):
        mg = transpose_multigrid(mg, use_pallas=not interpret, interpret=interpret)
    return ZShardedSolver(op_hi, mg, mesh, axis, interpret=interpret,
                          shard_levels=shard_levels)
