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


def _vcycle_shard(tables, mg_rest, free, inv_diag, lam_max, r, *,
                  axis, z_real, z_pad, degree, lam_min_frac, interpret):
    """Sharded fine level + replicated coarse remainder of the V-cycle.

    Mirrors ``MultigridT._vcycle`` level 0; ``mg_rest`` is a MultigridT
    holding levels 1+ and the coarse inverse, evaluated identically
    (redundantly) on every device from the gathered fine defect."""
    Ff = free

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
    d_full = lax.all_gather(d, axis, axis=3, tiled=True)[..., :z_real]
    coarse = mg_rest.levels[0]
    c_dtype = coarse.ke.dtype
    rc = coarse.free.astype(c_dtype) * _restrict(d_full, axes=(1, 2, 3)).astype(c_dtype)
    zc = mg_rest._vcycle(0, rc)
    corr_full = _prolong(coarse.free.astype(zc.dtype) * zc, axes=(1, 2, 3)).astype(r.dtype)
    if z_pad != z_real:
        corr_full = jnp.pad(corr_full, ((0, 0), (0, 0), (0, 0), (0, z_pad - z_real)))
    Zl = r.shape[-1]
    corr = lax.dynamic_slice_in_dim(corr_full, lax.axis_index(axis) * Zl, Zl, axis=3)
    return smooth(z + Ff * corr, r)


# -- the sharded staged solver ------------------------------------------------


class ZShardedSolver:
    """Staged FCG solve with the production Pallas pipeline z-sharded.

    Built by :func:`build_zsharded_solver`.  Not a pytree — holds device
    data (NamedSharding-placed) plus the two compiled shard_map stage
    programs; the Krylov algebra stages are the single-device ``_st_*``
    programs under GSPMD.
    """

    def __init__(self, op_hi, mg_t: MultigridT, mesh: Mesh, axis: str = "z",
                 *, interpret: bool = False):
        if len(mg_t.levels) < 2:
            raise ValueError(
                "z-sharded solve needs a >= 2-level hierarchy (the fine "
                "level shards, levels 1+ replicate); got "
                f"{len(mg_t.levels)} level(s) — enlarge the scene or lower "
                "coarse_dof_limit"
            )
        Z, Y, X = op_hi.grid_shape
        n = mesh.shape[axis]
        Zl = -(-Z // n)
        Zp = n * Zl
        self.mesh, self.axis = mesh, axis
        self.grid_shape = (Z, Y, X)
        self.z_pad = Zp
        self.interpret = interpret
        self.hi_dtype = op_hi.free.dtype
        # kept for the exact-f64 true-residual certification (solve())
        self._op_ke = op_hi.ke
        self._op_free = op_hi.free

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
        self.ones32 = put_v(np.ones_like(free_np))
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
        self.mg_rest = jax.device_put(
            MultigridT(
                levels=mg_t.levels[1:], coarse_inv=mg_t.coarse_inv,
                degree=mg_t.degree, lam_min_frac=mg_t.lam_min_frac,
                lam_max_safety=mg_t.lam_max_safety,
            ),
            rep,
        )
        self.degree = mg_t.degree
        self.lam_min_frac = mg_t.lam_min_frac

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

        def precond_p_body(tables, mg_rest, free, inv_diag, lam,
                           r_pair, r_old_pair, rz, p_pair):
            # V-cycle + Polak-Ribiere beta + p-update in ONE program
            # (mirrors solve.py::_st_precond_p, incl. its pre-loop reuse:
            # with a zero p the beta term vanishes exactly, so p = z)
            z32 = _vcycle_shard(
                tables, mg_rest, free, inv_diag, lam, r_pair[0],
                axis=axis, z_real=Z, z_pad=Zp, degree=self.degree,
                lam_min_frac=self.lam_min_frac, interpret=interpret,
            )
            zp = df64.from_f32(z32)
            rz_new = lax.psum(df64.dot(r_pair, zp), axis)
            rz_old_z = lax.psum(df64.dot(r_old_pair, zp), axis)
            beta = (rz_new - rz_old_z) / jnp.where(
                rz != 0, rz, jnp.asarray(1.0, rz.dtype)
            )
            p_new = df64.axpy(beta, p_pair, zp)
            return p_new, rz_new

        self._precond_p = jax.jit(
            smap(
                precond_p_body,
                in_specs=(f32_spec, mg_spec, vspec, vspec, sd, vp, vp, P(), vp),
                out_specs=(vp, P()),
            )
        )

    # -- data movement --------------------------------------------------------

    def to_sharded_T(self, flat, dtype=None):
        """Host/flat (N, 3) -> padded transposed (3, Y, X, Zp), sharded."""
        Z, Y, X = self.grid_shape
        a = np.asarray(flat, dtype if dtype is not None else np.asarray(flat).dtype)
        g = np.transpose(a.reshape(Z, Y, X, 3), (3, 1, 2, 0))
        g = np.pad(g, [(0, 0)] * 3 + [(0, self.z_pad - Z)])
        return jax.device_put(jnp.asarray(g), self._vshard)

    def pair_of_f64(self, flat64):
        """Host f64 (N, 3) -> sharded (hi, lo) f32 pair, transposed."""
        a = np.asarray(flat64, np.float64)
        hi = a.astype(np.float32)
        lo = (a - hi).astype(np.float32)
        return self.to_sharded_T(hi), self.to_sharded_T(lo)

    def from_T_pair(self, pair):
        """Sharded transposed pair -> host f64 flat (N, 3)."""
        Z, Y, X = self.grid_shape
        g = np.asarray(df64.combine(pair, jnp.float64))[..., :Z]
        return np.transpose(g, (3, 1, 2, 0)).reshape(-1, 3)

    # -- the solve ------------------------------------------------------------

    def solve(self, loads, prescribed=None, *, tol=1e-8, max_iters=300,
              progress=None, refine_true=True, max_refine=3,
              want_reactions=True):
        """Host-staged FCG — the sharded twin of
        ``solve.solve_operator_fpcg_t_staged`` (same recurrence, same
        per-iteration stage sequence, dots all-reduced over the mesh).

        ``refine_true`` (default): after the sharded loop converges,
        certify/refine against the exact f64 operator exactly like the
        single-device path (solve._refine_true) — the dd kernel's
        cancellation-amplified apply floor makes the raw recurrence
        optimistic near equilibrium.  The residual check runs on the
        gathered iterate; correction passes rerun this sharded solve."""
        if refine_true:
            from types import SimpleNamespace

            from ..solve import _DD_RECURRENCE_FLOOR, _refine_true

            ov = SimpleNamespace(
                ke=self._op_ke, free=self._op_free, grid_shape=self.grid_shape
            )
            say = progress if progress is not None else (lambda s: None)
            return _refine_true(
                lambda l, p, tol_hint=None, want_reactions=True: self.solve(
                    l, p, tol=(tol_hint if tol_hint is not None else tol),
                    max_iters=max_iters, progress=progress,
                    refine_true=False, want_reactions=want_reactions,
                ),
                ov, jnp.asarray(loads), None if prescribed is None else jnp.asarray(prescribed),
                tol=tol, max_refine=max_refine, say=say,
                inner_floor=_DD_RECURRENCE_FLOOR,
            )
        from ..solve import (
            Solution,
            _st_mask_pair,
            _st_pair_norm2,
            _st_rhs_inhomog,
            _st_setup_homog,
            _st_split_fixed,
            _st_update_xr,
        )

        say = progress if progress is not None else (lambda s: None)
        loads_pair = self.pair_of_f64(np.asarray(loads, np.float64))
        if prescribed is None:
            b_pair, b2 = _st_setup_homog(self.freeT32, loads_pair[0].astype(jnp.float64)
                                         + loads_pair[1].astype(jnp.float64))
            x_pair = (jnp.zeros_like(b_pair[0]), jnp.zeros_like(b_pair[1]))
            r_pair, rr = b_pair, b2
        else:
            presc_pair = self.pair_of_f64(np.asarray(prescribed, np.float64))
            xp_pair = _st_split_fixed(
                self.freeT32,
                presc_pair[0].astype(jnp.float64) + presc_pair[1].astype(jnp.float64),
            )
            Axp, _ = self._apply_dot(self.ddtabs, self.ones32, xp_pair)
            b_pair, b2 = _st_rhs_inhomog(
                self.freeT32,
                loads_pair[0].astype(jnp.float64) + loads_pair[1].astype(jnp.float64),
                Axp, xp_pair,
            )
            x_pair = xp_pair
            r_pair = _st_mask_pair(self.freeT32, b_pair)
            rr = _st_pair_norm2(r_pair)
        b_norm = float(jnp.sqrt(b2))
        safe_b_norm = b_norm if b_norm > 0 else 1.0

        say("sharded: V-cycle")
        # pre-loop start reuses the in-loop program: zero p annihilates
        # the beta term exactly (x_pair is a throwaway r_old; every
        # argument a distinct buffer — see solve.py::_st_precond_p)
        p_pair, rz = self._precond_p(
            self.fine_tables, self.mg_rest, self.fine_free, self.fine_inv_diag,
            self.fine_lam, r_pair, x_pair, jnp.asarray(1.0, jnp.float64),
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
                self.fine_inv_diag, self.fine_lam, r_new, r_pair, rz, p_pair,
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
        u = self.from_T_pair(x_pair)
        if prescribed is not None:
            pres = np.asarray(prescribed, np.float64).reshape(-1, 3)
            free_n3 = np.asarray(self.freeT32[..., : self.grid_shape[0]])
            free_flat = np.transpose(free_n3, (3, 1, 2, 0)).reshape(-1, 3)
            u = np.where(free_flat > 0, u, pres)
        reactions = None
        if want_reactions:
            say("sharded: reactions")
            react_pair, _ = self._apply_dot(self.ddtabs, self.ones32, x_pair)
            reactions = jnp.asarray(self.from_T_pair(react_pair))
        return Solution(
            displacements=jnp.asarray(u),
            reactions=reactions,
            stats=stats,
        )


def build_zsharded_solver(
    op_hi,
    mg,
    mesh: Mesh,
    axis: str = "z",
    *,
    interpret: bool = False,
) -> ZShardedSolver:
    """Build the z-sharded production solver.

    ``op_hi``: an f64 ``StructuredOperator``; ``mg``: a ``MultigridT``
    (or a flat-layout hierarchy, converted here); ``mesh``: a 1D device
    mesh whose ``axis`` names the z shards.  ``interpret=True`` runs the
    Pallas kernels in interpreter mode (CPU tests)."""
    from ..ops.transposed import transpose_multigrid

    if not isinstance(mg, MultigridT):
        mg = transpose_multigrid(mg, use_pallas=not interpret, interpret=interpret)
    return ZShardedSolver(op_hi, mg, mesh, axis, interpret=interpret)
