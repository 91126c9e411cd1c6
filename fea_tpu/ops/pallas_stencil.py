"""Fused Pallas TPU kernels for the structured voxel stencil apply.

The XLA lowering of :func:`ops.structured.stencil_apply_grid` (64
corner-pair shifted multiply-adds with 8 live full-grid accumulators)
moves ~80x the speed-of-light HBM traffic and is VPU-bound on 576
multiply-adds per output point.  These kernels compute the stencil in
the *interior form*: the 64 corner pairs regroup by their 27 distinct
node offsets d = b - a, with a weight table

    W[d] = sum_a Ke[3a:3a+3, 3(a+d):3(a+d)+3]      (3x3 blocks)

so the bulk per-point work drops to 27 x 9 = 243 multiply-adds — the
grouping is exact in the grid interior because every surrounding element
exists there.  On the boundary shell the interior form over-counts
*phantom elements* outside the domain; the kernels subtract those
exactly IN-KERNEL via inclusion-exclusion over the 6 faces / 12 edges /
8 corners — each a lower-dimensional unmasked stencil evaluated on thin
slices of the already-resident VMEM block and folded into the output
ref (width-1 lane/sublane updates; the y-face pieces are gated by a
block-index predicate).  An earlier variant applied these corrections
in XLA outside the kernel: ~250 tiny ops x 36 apply instances per FCG
iteration cost more than the kernel itself (+~50 ms/iteration measured).

All weight tables derive from Ke alone, so they are built once per
operator/level on the host (:func:`stencil_tables` /
:func:`stencil_tables_dd`) and passed through jit boundaries as one
(125, 3, 3) array per split (rows 0..27 interior, 27..125 the packed
face/edge/corner tables).  When no tables are passed the wrappers
derive them from a *concrete* Ke (convenience for tests/tools; a traced
Ke without tables raises).

Layout: component-major transposed, ``gT (3, Y, X, Z)`` — Z (the long
axis) rides the 128-wide lanes, X the sublanes; z/x shifts are in-VMEM
slices and the y shift picks among a 3-block row window.  The wrappers
:func:`stencil_apply_transposed` (f32) and
:func:`stencil_apply_transposed_dd` (f64-accurate from f32 pairs) take
and return this layout; callers transpose once around whole pipelines,
not per apply.

Equivalence with the XLA path is tested in tests/test_pallas.py
(interpreter mode on CPU) and on-chip by tools/tpu_check.py.
"""
from __future__ import annotations

import dataclasses
import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .structured import _CORNERS

__all__ = [
    "dd_kernel_fits_vmem",
    "dd_z_chunks",
    "stencil_apply_transposed",
    "stencil_apply_transposed_dd",
    "stencil_apply_transposed_dd_chunked",
    "split_ke_dd",
    "stencil_tables",
    "stencil_tables_dd",
    "z_boundary_row_masks",
    "z_slab_correction",
]

_CORNER_IDX = {c: i for i, c in enumerate(_CORNERS)}
# the 27 node offsets d = b - a, in the kernels' loop order
_OFFSETS = tuple(
    (dz, dy, dx)
    for dz in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dx in (-1, 0, 1)
)
# corner-tuple axis t (0=z, 1=y, 2=x) -> array axis in (3, Y, X, Z)
_AX_ARR = {0: 3, 1: 1, 2: 2}

_TY_F32 = 8  # f32 kernel y-slab rows (measured best on the v5e at bench size)
_TY_DD = 2  # dd kernel y-slab rows (EFT body keeps many temporaries live)


def dd_kernel_fits_vmem(Y: int, X: int, Zin: int) -> bool:
    """Whether the double-f32 kernel's VMEM footprint fits the chip.

    Calibrated from two compile-time OOMs on the v5e (128 MB vmem):
    TY=1 at X*Zin = 41,795 used 160.1 MB (= 319 f32 per row-site) and
    TY=2 at X*Zin = 20,995 used 146.5 MB (= 436 f32 per row-site).
    Using the worse per-site figure with TY = 1 (3 window rows) and an
    ~85 MB budget: X * Zin <= 16,000.  Above this the apply runs in
    static z chunks (:func:`stencil_apply_transposed_dd_chunked`);
    z-sharding (parallel/halo.py) shrinks per-shard Zin the same way on
    pods."""
    return X * Zin <= 16_000


def dd_z_chunks(Y: int, X: int, Z: int) -> int:
    """Number of static z slabs needed to run the dd kernel within its
    VMEM fit on a (3, Y, X, Z) grid (1 = single call)."""
    n = 1
    while not dd_kernel_fits_vmem(Y, X, -(-Z // n) + 2) and n < Z:
        n += 1
    return n


def stencil_apply_transposed_dd_chunked(
    gT_hi: jax.Array,
    gT_lo: jax.Array,
    *,
    tables: "StencilTablesDD",
    n_chunks: int,
    interpret: bool = False,
):
    """dd apply on grids ABOVE the single-call VMEM fit: the z axis is
    processed in ``n_chunks`` static slabs, each one ``z_halo`` kernel
    call on a +-1-plane halo-extended slice — the same decomposition the
    multichip path uses across devices (parallel/halo.py), with the
    device-index gating replaced by static per-chunk table variants:

      * chunk 0 keeps the z-min boundary-correction table rows;
      * ALL chunks drop the z-max rows (in z_halo form the kernel cannot
        know whether its last lane is the global one), and the global
        z-max plane's correction is added afterwards as one f64
        ``z_slab_correction`` term at its static plane.

    Exactness vs the single-call kernel is pinned by test
    (tests/test_pallas.py); the per-chunk kernels are shape-identical
    when Z divides evenly, so they share one compiled body.
    """
    C, Y, X, Z = gT_hi.shape
    zmin_rows, zmax_rows = z_boundary_row_masks()

    def gate(w, keep_zmin):
        scale = np.where(zmax_rows, 0.0, 1.0)
        if not keep_zmin:
            scale = np.where(zmin_rows, 0.0, scale)
        return w * jnp.asarray(scale, w.dtype)[:, None, None]

    tabs = {
        True: StencilTablesDD(*(gate(w, True) for w in (tables.w1, tables.w2, tables.whi, tables.wlo))),
        False: StencilTablesDD(*(gate(w, False) for w in (tables.w1, tables.w2, tables.whi, tables.wlo))),
    }
    cz = -(-Z // n_chunks)
    zero_plane = jnp.zeros((C, Y, X, 1), gT_hi.dtype)
    outs_hi, outs_lo = [], []
    for i in range(n_chunks):
        s, e = i * cz, min((i + 1) * cz, Z)
        if s >= e:
            break
        lo_edge = gT_hi[..., s - 1 : s] if s > 0 else zero_plane
        hi_edge = gT_hi[..., e : e + 1] if e < Z else zero_plane
        ehi = jnp.concatenate([lo_edge, gT_hi[..., s:e], hi_edge], axis=-1)
        lo_edge_l = gT_lo[..., s - 1 : s] if s > 0 else zero_plane
        hi_edge_l = gT_lo[..., e : e + 1] if e < Z else zero_plane
        elo = jnp.concatenate([lo_edge_l, gT_lo[..., s:e], hi_edge_l], axis=-1)
        fh, fl = stencil_apply_transposed_dd(
            None, None, None, None, ehi, elo,
            tables=tabs[i == 0], interpret=interpret, z_halo=True,
        )
        outs_hi.append(fh)
        outs_lo.append(fl)
    f_hi = jnp.concatenate(outs_hi, axis=-1)
    f_lo = jnp.concatenate(outs_lo, axis=-1)

    # global z-max plane: one f64 thin-slab correction (O(1/Z) work)
    w64 = tables.whi.astype(jnp.float64) + tables.wlo.astype(jnp.float64)
    slab64 = gT_hi[..., Z - 1].astype(jnp.float64) + gT_lo[..., Z - 1].astype(jnp.float64)
    corr = z_slab_correction(w64, slab64, "max")
    cur = f_hi[..., Z - 1].astype(jnp.float64) + f_lo[..., Z - 1].astype(jnp.float64) + corr
    chi = cur.astype(jnp.float32)
    clo = (cur - chi.astype(jnp.float64)).astype(jnp.float32)
    return f_hi.at[..., Z - 1].set(chi), f_lo.at[..., Z - 1].set(clo)


def _ty_for_shape(ty_max: int, Y: int, X: int, Z: int, temps: int) -> int:
    """Largest y-slab row count whose Mosaic stack fits scoped VMEM.

    The kernels' live set scales ~ temps * (TY + 2) * X * Z f32s; the
    v5e scoped-vmem limit is ~105.8 MB (an 8.1M-DOF fine level with
    TY=8 measured 115.7 MB and OOMed at compile, while the 1M bench
    shape measured well under).  Halve TY until an ~85 MB budget holds
    — at bench size this keeps the measured-best ty_max."""
    ty = min(ty_max, Y)
    while ty > 1 and temps * (ty + 2) * X * Z * 4 > 85e6:
        ty = max(1, ty // 2)
    return ty


# -- boundary piece enumeration (shared by table packer and kernels) ----------


def _piece_specs():
    """The 26 boundary pieces (6 faces, 12 edges, 8 corners), fixed order.

    Each spec: (out_axes, forced, free, sign) where ``out_axes`` maps the
    out corner-axes (0=z, 1=y, 2=x) to their side (0 = min face, 1 = max
    face), ``forced`` maps them to the forced corner component (1 on the
    min face — the phantom element sits below — and 0 on the max face;
    on those axes b_t = a_t, any other b reads outside the zero-extended
    grid), ``free`` lists the remaining corner-axes ordered like the
    (3, Y, X, Z) array's axes, and ``sign`` is the inclusion-exclusion
    sign with which the piece's phantom contribution is REMOVED from the
    interior form (faces -, edges +, corners -).
    """
    specs = []
    for r in (1, 2, 3):
        for S in itertools.combinations((0, 1, 2), r):
            for sides in itertools.product((0, 1), repeat=r):
                out_axes = tuple(zip(S, sides))
                forced = {t: (1 if s == 0 else 0) for t, s in zip(S, sides)}
                free = sorted(
                    (t for t in range(3) if t not in forced), key=_AX_ARR.get
                )
                sign = -1.0 if r % 2 == 1 else 1.0
                specs.append((out_axes, forced, tuple(free), sign))
    return tuple(specs)


_PIECES = _piece_specs()


def _corr_layout():
    """Packed-row layout of the correction tables: for each piece, the
    starting row in the (125, 3, 3) table and its offset tuples (in
    ``free``-axis order).  Rows 0..27 hold the interior table."""
    layout = []
    r0 = 27
    for spec in _PIECES:
        free = spec[2]
        offs = tuple(itertools.product((-1, 0, 1), repeat=len(free)))
        layout.append((spec, r0, offs))
        r0 += len(offs)
    return tuple(layout), r0


_CORR_LAYOUT, _N_TABLE_ROWS = _corr_layout()  # 27 + 54 + 36 + 8 = 125


def z_slab_correction(w: jax.Array, slab: jax.Array, side: str) -> jax.Array:
    """z-boundary correction for ONE z plane, evaluated in XLA.

    ``w``: a (125, 3, 3) weight table (one of the f32 tables, or an f64
    ``whi + wlo`` recombination); ``slab``: the state at the boundary
    plane, (3, Y, X).  Returns the (3, Y, X) correction to ADD to the
    interior-form output at that plane, i.e. the sum of the z-``side``
    (``'min'``/``'max'``) face/edge/corner piece contributions.

    Used by the z-sharded apply (parallel/halo.py): multigrid-compatible
    voxel grids have odd Z (nz even), so the global z-max plane sits at a
    static mid-block column of the last shard where the in-kernel
    correction (which targets the array's last lane) cannot reach; the
    kernel's z-out table rows are zeroed instead and this thin-slab term
    is added outside.  One plane per apply — cheap, unlike the rejected
    all-pieces-in-XLA variant (module docstring).
    """
    want = 1 if side == "max" else 0
    C, Y, X = slab.shape
    sp = jnp.pad(slab, ((0, 0), (1, 1), (1, 1)))
    out = jnp.zeros_like(slab)
    for (out_axes, forced, free, _sign), r0, offs in _CORR_LAYOUT:
        if (0, want) not in out_axes:
            continue
        y_fix = x_fix = None
        for t, s in out_axes:
            if t == 1:
                y_fix = 0 if s == 0 else Y - 1
            elif t == 2:
                x_fix = 0 if s == 0 else X - 1
        for j, off in enumerate(offs):
            d = dict(zip(free, off))
            if y_fix is None:
                ys, ny = 1 + d.get(1, 0), Y
            else:
                ys, ny = 1 + y_fix, 1
            if x_fix is None:
                xs, nx = 1 + d.get(2, 0), X
            else:
                xs, nx = 1 + x_fix, 1
            src = jax.lax.slice(sp, (0, ys, xs), (3, ys + ny, xs + nx))
            term = jnp.einsum("oc,cyx->oyx", w[r0 + j].astype(slab.dtype), src)
            oy = slice(y_fix, y_fix + 1) if y_fix is not None else slice(None)
            ox = slice(x_fix, x_fix + 1) if x_fix is not None else slice(None)
            out = out.at[:, oy, ox].add(term)
    return out


def z_boundary_row_masks() -> tuple["np.ndarray", "np.ndarray"]:
    """Boolean (125,) masks of the table rows belonging to z-min-out and
    z-max-out boundary pieces (faces, edges, corners with the z axis on
    that side).  A z-sharded apply (parallel/halo.py) zeroes these rows
    on devices that do not own the global z boundary — the corrections
    are just table rows, so gating them needs no kernel change."""
    zmin = np.zeros(_N_TABLE_ROWS, bool)
    zmax = np.zeros(_N_TABLE_ROWS, bool)
    for (out_axes, _forced, _free, _sign), r0, offs in _CORR_LAYOUT:
        for t, s in out_axes:
            if t == 0:
                (zmin if s == 0 else zmax)[r0 : r0 + len(offs)] = True
    return zmin, zmax


# -- weight tables (host-side NumPy; small, from Ke alone) --------------------


def _block_np(ke64: np.ndarray, a: tuple, b: tuple) -> np.ndarray:
    ia, ib = _CORNER_IDX[a], _CORNER_IDX[b]
    return ke64[3 * ia : 3 * ia + 3, 3 * ib : 3 * ib + 3]


def _boundary_block_np(ke64: np.ndarray, forced: dict, d_map: dict) -> np.ndarray:
    free_axes = [t for t in range(3) if t not in forced]
    acc = np.zeros((3, 3), np.float64)
    for bits in itertools.product((0, 1), repeat=len(free_axes)):
        a = [0, 0, 0]
        b = [0, 0, 0]
        for t, v in forced.items():
            a[t] = v
            b[t] = v
        ok = True
        for t, av in zip(free_axes, bits):
            bv = av + d_map[t]
            if bv not in (0, 1):
                ok = False
                break
            a[t] = av
            b[t] = bv
        if ok:
            acc += _block_np(ke64, tuple(a), tuple(b))
    return acc


def _tables_np(ke64: np.ndarray) -> np.ndarray:
    """(125, 3, 3) f64 weight table: rows 0..27 the interior form
    (kernel offset-loop order), rows 27..125 the sign-folded boundary
    correction blocks in :data:`_CORR_LAYOUT` order."""
    W = np.zeros((_N_TABLE_ROWS, 3, 3), np.float64)
    for o, (dz, dy, dx) in enumerate(_OFFSETS):
        for a in _CORNERS:
            b = (a[0] + dz, a[1] + dy, a[2] + dx)
            if b in _CORNER_IDX:
                W[o] += _block_np(ke64, a, b)
    for (out_axes, forced, free, sign), r0, offs in _CORR_LAYOUT:
        for j, off in enumerate(offs):
            d_map = dict(zip(free, off))
            W[r0 + j] = sign * _boundary_block_np(ke64, forced, d_map)
    return W


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StencilTables:
    """f32 kernel weights: one (125, 3, 3) interior+correction table."""

    w: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StencilTablesDD:
    """dd kernel weights: EFT-split (125, 3, 3) f32 tables.
    whi + wlo == W64 (to f64 rounding); w1 + w2 == whi exactly with w1
    carrying the top ~12 bits, so w1*s1 kernel products are exact in
    f32 — for the boundary-correction rows exactly as for the interior."""

    w1: jax.Array
    w2: jax.Array
    whi: jax.Array
    wlo: jax.Array


def stencil_tables(ke) -> StencilTables:
    """Build the f32 kernel tables from a CONCRETE (24, 24) Ke."""
    W = _tables_np(np.asarray(ke, np.float64))
    return StencilTables(w=jnp.asarray(W, jnp.float32))


def stencil_tables_dd(ke) -> StencilTablesDD:
    """Build the dd kernel tables from a CONCRETE f64 (24, 24) Ke."""
    W64 = _tables_np(np.asarray(ke, np.float64))
    whi = W64.astype(np.float32)
    wlo = (W64 - whi).astype(np.float32)
    c = np.float32(4097.0) * whi
    w1 = c - (c - whi)
    w2 = whi - w1
    return StencilTablesDD(
        w1=jnp.asarray(w1), w2=jnp.asarray(w2),
        whi=jnp.asarray(whi), wlo=jnp.asarray(wlo),
    )


# -- in-kernel boundary-piece geometry ---------------------------------------


def _piece_geometry(piece, Y, TY, X, Z, i_last, r_last):
    """Static slicing data for one boundary piece inside a y-slab kernel.

    Returns (pred_kind, row_fix, x_fix, z_fix) where ``pred_kind`` is
    None (piece applies to every block), 'first' (only the block holding
    global row 0) or 'last' (the block holding row Y - 1); ``row_fix``
    is the fixed local row for y-out pieces (else None) and x_fix/z_fix
    the fixed sublane/lane node index for x/z-out pieces (else None).
    """
    (out_axes, _forced, _free, _sign), _r0, _offs = piece
    pred_kind = None
    row_fix = x_fix = z_fix = None
    for t, s in out_axes:
        if t == 1:  # y
            pred_kind = "first" if s == 0 else "last"
            row_fix = 0 if s == 0 else r_last
        elif t == 2:  # x
            x_fix = 0 if s == 0 else X - 1
        else:  # z
            z_fix = 0 if s == 0 else Z - 1
    return pred_kind, row_fix, x_fix, z_fix


def _piece_slices(piece, vol_shape, row_fix, x_fix, z_fix):
    """For each offset of the piece, the static (start, size) of the
    vol_p slice to read.  vol_p is (3, TY+2, X+2, Z+2); its row window
    covers local rows -1..TY and x/z carry a 1-wide zero halo."""
    (_out, _forced, free, _sign), r0, offs = piece
    _, TYp2, Xp2, Zp2 = vol_shape
    TY, X, Z = TYp2 - 2, Xp2 - 2, Zp2 - 2
    res = []
    for j, off in enumerate(offs):
        d = dict(zip(free, off))
        if row_fix is None:
            rs, nr = 1 + d.get(1, 0), TY
        else:
            rs, nr = 1 + row_fix, 1
        if x_fix is None:
            xs, nx = 1 + d.get(2, 0), X
        else:
            xs, nx = 1 + x_fix, 1
        if z_fix is None:
            zs, nz = 1 + d.get(0, 0), Z
        else:
            zs, nz = 1 + z_fix, 1
        res.append((r0 + j, (rs, nr), (xs, nx), (zs, nz)))
    return res


def _out_slice(row_fix, x_fix, z_fix, TY, X, Z):
    """(start, size) triple of the out_ref region the piece updates."""
    r = (row_fix, 1) if row_fix is not None else (0, TY)
    x = (x_fix, 1) if x_fix is not None else (0, X)
    z = (z_fix, 1) if z_fix is not None else (0, Z)
    return r, x, z


def _pieces_by_pred(Y, TY, X, Z):
    """Split pieces into (always, first-block-only, last-block-only),
    each as (piece, row_fix, x_fix, z_fix).  Gating the y-out pieces on
    the block index keeps their (1, X, Z)-plane stencils off the other
    blocks — computed everywhere they cost more than the whole interior
    pass (measured ~1.3 ms of the dd kernel's 2.9 ms)."""
    i_last, r_last = (Y - 1) // TY, (Y - 1) % TY
    groups = {None: [], "first": [], "last": []}
    for piece in _CORR_LAYOUT:
        pred_kind, row_fix, x_fix, z_fix = _piece_geometry(
            piece, Y, TY, X, Z, i_last, r_last
        )
        groups[pred_kind].append((piece, row_fix, x_fix, z_fix))
    return groups[None], groups["first"], groups["last"], i_last


# -- f32 kernel ---------------------------------------------------------------


def _kernel27(Y, z_halo, w_ref, gm_ref, g0_ref, gp_ref, out_ref):
    """Interior-form stencil + in-kernel boundary corrections for one
    TY-row y-slab.

    ``z_halo``: the input blocks carry two extra z lanes (columns 0 and
    Z+1 are NEIGHBOR-SHARD halo planes rather than the kernel's zero
    padding) — the only geometry change a z-sharded apply needs, since
    the padded and halo-extended arrays are shape-identical."""
    i = pl.program_id(0)
    n_blk = pl.num_programs(0)
    C, TY, X, Z = out_ref.shape
    # stitch rows [i*TY - 1, (i+1)*TY + 1) from the three loaded blocks;
    # clamped end blocks alias the current one — zero their phantom rows
    gm = gm_ref[:, TY - 1 : TY, :, :] * (i > 0).astype(jnp.float32)
    gp = gp_ref[:, 0:1, :, :] * (i < n_blk - 1).astype(jnp.float32)
    vol = jnp.concatenate([gm, g0_ref[:, :, :, :], gp], axis=1)  # (3, TY+2, X, Z[+2])
    z_pad = (0, 0) if z_halo else (1, 1)
    vol_p = jnp.pad(vol, ((0, 0), (0, 0), (1, 1), z_pad))

    acc = [jnp.zeros((TY, X, Z), jnp.float32) for _ in range(3)]
    for o, (dz, dy, dx) in enumerate(_OFFSETS):
        src = jax.lax.slice(
            vol_p, (0, 1 + dy, 1 + dx, 1 + dz), (3, 1 + dy + TY, 1 + dx + X, 1 + dz + Z)
        )
        for c in range(3):
            acc[c] = acc[c] + (
                src[0] * w_ref[o, c, 0]
                + src[1] * w_ref[o, c, 1]
                + src[2] * w_ref[o, c, 2]
            )
    out_ref[:, :, :, :] = jnp.stack(acc)

    # boundary corrections: thin-slice stencils folded into out_ref.
    # Pieces overlap on shared nodes; sequential read-modify-writes
    # accumulate them exactly (inclusion-exclusion signs are in w_ref).
    def apply_pieces(pieces):
        for piece, row_fix, x_fix, z_fix in pieces:
            corr = [None, None, None]
            for row, (rs, nr), (xs, nx), (zs, nz) in _piece_slices(
                piece, vol_p.shape, row_fix, x_fix, z_fix
            ):
                src = jax.lax.slice(
                    vol_p, (0, rs, xs, zs), (3, rs + nr, xs + nx, zs + nz)
                )
                for c in range(3):
                    term = (
                        src[0] * w_ref[row, c, 0]
                        + src[1] * w_ref[row, c, 1]
                        + src[2] * w_ref[row, c, 2]
                    )
                    corr[c] = term if corr[c] is None else corr[c] + term
            cst = jnp.stack(corr)
            (orr, onr), (ox, onx), (oz, onz) = _out_slice(row_fix, x_fix, z_fix, TY, X, Z)
            cur = out_ref[:, orr : orr + onr, ox : ox + onx, oz : oz + onz]
            out_ref[:, orr : orr + onr, ox : ox + onx, oz : oz + onz] = cur + cst

    always, first, last, i_last = _pieces_by_pred(Y, TY, X, Z)
    apply_pieces(always)

    @pl.when(i == 0)
    def _():
        apply_pieces(first)

    @pl.when(i == i_last)
    def _():
        apply_pieces(last)


def stencil_apply_transposed(
    ke: jax.Array,
    gT: jax.Array,
    *,
    tables: StencilTables | None = None,
    interpret: bool = False,
    z_halo: bool = False,
) -> jax.Array:
    """K @ u in transposed grid layout: gT (3, Y, X, Z) f32 -> (3, Y, X, Z).

    Identical (to f32 rounding) to ``stencil_apply_grid`` on the
    corresponding (Z, Y, X, 3) array.  Pass ``tables``
    (:func:`stencil_tables`, built once per operator) when calling
    inside a jit whose Ke is traced — without it the weights derive
    from Ke here, which requires a concrete Ke.

    ``z_halo``: gT's first and last z lanes are neighbor-shard halo
    planes; the output covers only the Z - 2 owned lanes.  Combined with
    :func:`z_boundary_row_masks`-gated tables this makes the kernel the
    per-shard body of a z-decomposed multichip apply (parallel/halo.py).
    """
    if tables is None:
        if isinstance(ke, jax.core.Tracer):
            raise ValueError(
                "stencil_apply_transposed: Ke is traced — pass precomputed "
                "stencil_tables(ke) built from the concrete Ke outside the jit"
            )
        tables = stencil_tables(ke)
    C, Y, X, Zin = gT.shape
    Z = Zin - 2 if z_halo else Zin
    gT = gT.astype(jnp.float32)
    TY = _ty_for_shape(_TY_F32, Y, X, Zin, temps=70)
    n_blk = -(-Y // TY)
    Y_pad = n_blk * TY
    gp = jnp.pad(gT, ((0, 0), (0, Y_pad - Y), (0, 0), (0, 0))) if Y_pad != Y else gT
    spec_blk = lambda off: pl.BlockSpec(  # noqa: E731
        (3, TY, X, Zin),
        # every component explicitly int32: under x64, Python-int literals
        # trace as i64 (jnp.clip even recurses) and Mosaic rejects i64
        # index-map returns
        lambda i: (
            jnp.int32(0),
            jax.lax.clamp(jnp.int32(0), (i + off).astype(jnp.int32), jnp.int32(n_blk - 1)),
            jnp.int32(0),
            jnp.int32(0),
        ),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_kernel27, Y, z_halo),
        out_shape=jax.ShapeDtypeStruct((3, Y_pad, X, Z), jnp.float32),
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec(
                (_N_TABLE_ROWS, 3, 3),
                lambda i: (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            spec_blk(-1),
            spec_blk(0),
            spec_blk(1),
        ],
        out_specs=pl.BlockSpec(
            (3, TY, X, Z),
            lambda i: (jnp.int32(0), i.astype(jnp.int32), jnp.int32(0), jnp.int32(0)),
            memory_space=pltpu.VMEM,
        ),
        # the unrolled 27-offset body slightly exceeds the default 16M
        # scoped-VMEM accounting at bench size; raise toward physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tables.w, gp, gp, gp)
    return out[:, :Y]


# -- double-f32 ("dd") variant: the f64 apply without emulated f64 ----------
#
# The production solve pays one f64-accurate stencil apply per FCG
# iteration (XLA emulated f64: 17 ms).  This kernel computes the same
# apply from f32 data using error-free transformations on the
# interior-form weights:
#
#   W[d] (f64)  -> whi + wlo (f32 pair), whi -> w1 + w2 (exact 12-bit halves)
#   x   (f64)   -> xhi + xlo (f32 pair), xhi -> s1 + s2 in-kernel (Veltkamp)
#   w*x         =  w1*s1 [EXACT f32 product, TwoSum accumulation]
#                  + w1*s2 + w2*shi + whi*xlo + wlo*shi  [2^-12..2^-24 scale,
#                    plain f32 side accumulator]
#
# Boundary corrections run the same EFT scheme on the thin boundary
# slices and fold into the output pair with a TwoSum, so
# hi + lo ~= A_f64(x) everywhere (~1e-11 rel).


def _veltkamp_split(a: jax.Array):
    """a -> (a1, a2) with a = a1 + a2 exactly, a1 carrying the top ~12
    bits (splitter 2^12 + 1).  Requires IEEE f32 ops (holds in interpret
    mode; validated on-chip by the accompanying test/probe)."""
    c = jnp.float32(4097.0) * a
    a1 = c - (c - a)
    return a1, a - a1


def _two_sum(hi: jax.Array, lo: jax.Array, x: jax.Array):
    """(hi, lo) + x with error-free hi and accumulated lo."""
    s = hi + x
    bp = s - hi
    err = (hi - (s - bp)) + (x - bp)
    return s, lo + err


def _kernel27_dd(Y, z_halo, w1_ref, w2_ref, whi_ref, wlo_ref,
                 hm_ref, h0_ref, hp_ref, lm_ref, l0_ref, lp_ref,
                 out_hi_ref, out_lo_ref):
    """Interior-form dd stencil + in-kernel EFT boundary corrections.
    ``z_halo`` as in :func:`_kernel27`: inputs carry neighbor-shard halo
    lanes instead of zero padding."""
    i = pl.program_id(0)
    n_blk = pl.num_programs(0)
    C, TY, X, Z = out_hi_ref.shape
    edge = ((i > 0).astype(jnp.float32), (i < n_blk - 1).astype(jnp.float32))
    z_pad = (0, 0) if z_halo else (1, 1)

    def stitched(m_ref, c_ref, p_ref):
        gm = m_ref[:, TY - 1 : TY, :, :] * edge[0]
        gp = p_ref[:, 0:1, :, :] * edge[1]
        vol = jnp.concatenate([gm, c_ref[:, :, :, :], gp], axis=1)
        return jnp.pad(vol, ((0, 0), (0, 0), (1, 1), z_pad))

    volp_hi = stitched(hm_ref, h0_ref, hp_ref)
    volp_lo = stitched(lm_ref, l0_ref, lp_ref)
    v1p, v2p = _veltkamp_split(volp_hi)

    def eft_rows(rows_slices):
        """EFT-accumulate the listed (table-row, slice) terms; returns
        (hi, lo, small) triples per output component."""
        ahi = [None, None, None]
        alo = [None, None, None]
        asm = [None, None, None]
        for row, (rs, nr), (xs, nx), (zs, nz) in rows_slices:
            lim = (3, rs + nr, xs + nx, zs + nz)
            start = (0, rs, xs, zs)
            s1 = jax.lax.slice(v1p, start, lim)
            s2 = jax.lax.slice(v2p, start, lim)
            shi = jax.lax.slice(volp_hi, start, lim)
            slo = jax.lax.slice(volp_lo, start, lim)
            for c_out in range(3):
                for c_in in range(3):
                    w1 = w1_ref[row, c_out, c_in]
                    w2 = w2_ref[row, c_out, c_in]
                    whi = whi_ref[row, c_out, c_in]
                    wlo = wlo_ref[row, c_out, c_in]
                    main = w1 * s1[c_in]
                    if ahi[c_out] is None:
                        ahi[c_out], alo[c_out] = main, jnp.zeros_like(main)
                        asm[c_out] = jnp.zeros_like(main)
                    else:
                        # exact main product into the TwoSum chain
                        ahi[c_out], alo[c_out] = _two_sum(ahi[c_out], alo[c_out], main)
                    # 2^-12/2^-24-scale parts: plain f32 accumulation
                    asm[c_out] = asm[c_out] + (
                        w1 * s2[c_in] + w2 * shi[c_in]
                        + whi * slo[c_in] + wlo * shi[c_in]
                    )
        return ahi, alo, asm

    interior = [
        (o, (1 + dy, TY), (1 + dx, X), (1 + dz, Z))
        for o, (dz, dy, dx) in enumerate(_OFFSETS)
    ]
    ahi, alo, asm = eft_rows(interior)
    out_hi_ref[:, :, :, :] = jnp.stack(ahi)
    out_lo_ref[:, :, :, :] = jnp.stack([l + s for l, s in zip(alo, asm)])

    # boundary corrections: same EFT scheme on thin slices, folded into
    # the output pair with a TwoSum (sequential — pieces overlap)
    def apply_pieces(pieces):
        for piece, row_fix, x_fix, z_fix in pieces:
            chi, clo, csm = eft_rows(
                _piece_slices(piece, volp_hi.shape, row_fix, x_fix, z_fix)
            )
            add_hi = jnp.stack(chi)
            add_lo = jnp.stack([l + s for l, s in zip(clo, csm)])
            (orr, onr), (ox, onx), (oz, onz) = _out_slice(row_fix, x_fix, z_fix, TY, X, Z)
            osl = (slice(None), slice(orr, orr + onr), slice(ox, ox + onx), slice(oz, oz + onz))
            cur_hi = out_hi_ref[osl]
            cur_lo = out_lo_ref[osl]
            nhi, nlo = _two_sum(cur_hi, cur_lo + add_lo, add_hi)
            out_hi_ref[osl] = nhi
            out_lo_ref[osl] = nlo

    always, first, last, i_last = _pieces_by_pred(Y, TY, X, Z)
    apply_pieces(always)

    @pl.when(i == 0)
    def _():
        apply_pieces(first)

    @pl.when(i == i_last)
    def _():
        apply_pieces(last)


def split_ke_dd(ke64: "np.ndarray"):
    """Host-side split of the f64 Ke into (k1, k2, khi, klo) f32 arrays:
    khi + klo == ke64 (to f64 rounding), k1 + k2 == khi exactly with k1
    carrying the top ~12 bits.  The dd wrapper derives its weight tables
    from khi + klo when not passed precomputed ones."""
    ke64 = np.asarray(ke64, np.float64)
    khi = ke64.astype(np.float32)
    klo = (ke64 - khi).astype(np.float32)
    c = np.float32(4097.0) * khi
    k1 = c - (c - khi)
    k2 = khi - k1
    return k1, k2, khi, klo


def stencil_apply_transposed_dd(
    k1: jax.Array,
    k2: jax.Array,
    khi: jax.Array,
    klo: jax.Array,
    gT_hi: jax.Array,
    gT_lo: jax.Array,
    *,
    tables: StencilTablesDD | None = None,
    interpret: bool = False,
    z_halo: bool = False,
):
    """~f64-accurate K @ u from f32 pairs, transposed layout.

    Inputs: the (24, 24) f32 Ke splits from :func:`split_ke_dd` (used
    only to derive weight tables when ``tables`` is not given — pass
    :func:`stencil_tables_dd` output when calling inside a jit) and the
    state as an f32 pair (gT_hi = f32(x), gT_lo = f32(x - gT_hi)), both
    (3, Y, X, Z).  Returns (f_hi, f_lo) f32 pair with
    f_hi + f_lo ~= A_f64(x) to ~1e-11 relative, boundary shell included.

    ``z_halo``: as in :func:`stencil_apply_transposed` — first/last z
    lanes are neighbor halos, output covers the Z - 2 owned lanes.
    """
    if tables is None:
        if khi is None or isinstance(khi, jax.core.Tracer):
            raise ValueError(
                "stencil_apply_transposed_dd: pass either CONCRETE Ke splits "
                "or precomputed stencil_tables_dd(ke) built outside the jit"
            )
        tables = stencil_tables_dd(
            np.asarray(khi, np.float64) + np.asarray(klo, np.float64)
        )
    C, Y, X, Zin = gT_hi.shape
    Z = Zin - 2 if z_halo else Zin

    TY = _ty_for_shape(_TY_DD, Y, X, Zin, temps=436)
    n_blk = -(-Y // TY)
    Y_pad = n_blk * TY
    ghi, glo = gT_hi, gT_lo
    if Y_pad != Y:
        pad = ((0, 0), (0, Y_pad - Y), (0, 0), (0, 0))
        ghi = jnp.pad(ghi, pad)
        glo = jnp.pad(glo, pad)
    spec_blk = lambda off: pl.BlockSpec(  # noqa: E731
        (3, TY, X, Zin),
        # every component explicitly int32: under x64, Python-int literals
        # trace as i64 (jnp.clip even recurses) and Mosaic rejects i64
        # index-map returns
        lambda i: (
            jnp.int32(0),
            jax.lax.clamp(jnp.int32(0), (i + off).astype(jnp.int32), jnp.int32(n_blk - 1)),
            jnp.int32(0),
            jnp.int32(0),
        ),
        memory_space=pltpu.VMEM,
    )
    spec_w = pl.BlockSpec(
        (_N_TABLE_ROWS, 3, 3),
        lambda i: (jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        memory_space=pltpu.VMEM,
    )
    out_hi, out_lo = pl.pallas_call(
        functools.partial(_kernel27_dd, Y, z_halo),
        out_shape=(
            jax.ShapeDtypeStruct((3, Y_pad, X, Z), jnp.float32),
            jax.ShapeDtypeStruct((3, Y_pad, X, Z), jnp.float32),
        ),
        grid=(n_blk,),
        in_specs=[spec_w] * 4 + [spec_blk(-1), spec_blk(0), spec_blk(1)] * 2,
        out_specs=(
            pl.BlockSpec(
                (3, TY, X, Z),
                lambda i: (jnp.int32(0), i.astype(jnp.int32), jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, TY, X, Z),
                lambda i: (jnp.int32(0), i.astype(jnp.int32), jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM,
            ),
        ),
        # the unrolled EFT body keeps many temporaries live; raise the
        # scoped-VMEM budget (default 16M) toward the physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tables.w1, tables.w2, tables.whi, tables.wlo, ghi, ghi, ghi, glo, glo, glo)
    return out_hi[:, :Y], out_lo[:, :Y]
