"""Native (C++) host-side kernels.

The TPU compute path of this framework is JAX/XLA/Pallas; the pieces
that must run on the HOST in exact IEEE f64 — above the TPU's
emulated-f64 certification floor (docs/PERF.md "True-residual
honesty") — live here as a small C++ library, built on first use with
the system ``g++`` and loaded through :mod:`ctypes`.  Everything has a
pure-NumPy twin (``fea_tpu.ops.structured.stencil_apply_np``) and every
entry point falls back to it silently when no compiler is available, so
the package never hard-requires a toolchain.

Reference parity note: the reference has no native code at all
(SURVEY.md §0) — its host assembly/apply is the serial Python loop at
/root/reference/fea.py:87-97.  This module exists for the framework's
own certification tier, not for reference parity.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_CORNERS = (
    (0, 0, 0),
    (0, 0, 1),
    (0, 1, 1),
    (0, 1, 0),
    (1, 0, 0),
    (1, 0, 1),
    (1, 1, 1),
    (1, 1, 0),
)  # == fea_tpu.ops.structured._CORNERS (element corner order, (cz, cy, cx))

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False
_WTABLES: dict[bytes, np.ndarray] = {}


def _build_and_load() -> Optional[ctypes.CDLL]:
    """Compile stencil.cpp into a content-addressed .so and dlopen it.

    Build happens at most once per source version; concurrent processes
    are safe (compile to a temp name, atomic rename).  Any failure —
    no g++, sandboxed filesystem, unsupported flags — returns None and
    the callers use the NumPy twin.
    """
    src = Path(__file__).resolve().parent / "stencil.cpp"
    try:
        code = src.read_bytes()
    except OSError:
        return None
    # Tag by source AND host CPU features: -march=native artifacts copied
    # to a lesser machine would SIGILL — the exact cross-machine poisoned-
    # artifact failure utils/cache.py prevents for XLA executables.
    from ..utils.cache import _cpu_flags

    tag = hashlib.sha256(code + _cpu_flags().encode()).hexdigest()[:16]
    build_dir = Path(
        os.environ.get("FEA_TPU_NATIVE_DIR", src.parent / "_build")
    )
    so = build_dir / f"libfeastencil_{tag}.so"
    if not so.exists():
        tmp_name = None
        try:
            build_dir.mkdir(parents=True, exist_ok=True)
            with tempfile.NamedTemporaryFile(
                dir=build_dir, suffix=".so", delete=False
            ) as tmp:
                tmp_name = tmp.name
            cmd = [
                "g++", "-O3", "-march=native", "-funroll-loops",
                "-shared", "-fPIC", str(src), "-o", tmp_name,
            ]
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=120
            )
            if proc.returncode != 0:
                return None
            os.replace(tmp_name, so)
            tmp_name = None
        except Exception:
            return None
        finally:
            if tmp_name is not None:
                try:
                    os.unlink(tmp_name)
                except OSError:
                    pass
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    dp = ctypes.POINTER(ctypes.c_double)
    lib.fea_stencil_apply_f64.argtypes = [dp, dp, dp] + [ctypes.c_int64] * 3
    lib.fea_stencil_apply_f64.restype = None
    lib.fea_stencil_residual_f64.argtypes = [dp] * 6 + [ctypes.c_int64] * 3
    lib.fea_stencil_residual_f64.restype = ctypes.c_double
    lib.fea_varstencil_apply_f64.argtypes = [dp, dp, dp] + [ctypes.c_int64] * 3
    lib.fea_varstencil_apply_f64.restype = None
    lib.fea_varstencil_residual_f64.argtypes = [dp] * 6 + [ctypes.c_int64] * 3
    lib.fea_varstencil_residual_f64.restype = ctypes.c_double
    lib.fea_stencil_residual_slab_f64.argtypes = (
        [dp] * 6 + [ctypes.c_int64] * 6
    )
    lib.fea_stencil_residual_slab_f64.restype = ctypes.c_double
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB_TRIED = True
        if os.environ.get("FEA_TPU_NO_NATIVE"):
            _LIB = None
        else:
            _LIB = _build_and_load()
    return _LIB


def available() -> bool:
    return get_lib() is not None


def region_weight_table(ke: np.ndarray) -> np.ndarray:
    """(27 regions, 27 offsets, 3, 3) f64 node-stencil weights from Ke.

    Entry [(rz,ry,rx), (dz,dy,dx)] = sum over corner pairs (a, b) with
    ``corner_b - corner_a == (dz,dy,dx)`` of ``Ke[3a:3a+3, 3b:3b+3]``,
    restricted to pairs whose supporting element exists in the node's
    boundary region — the same existence rule as
    ``ops.structured.corner_table_np`` (corner offset 0 needs an element
    above the node on that axis, offset 1 one below).
    """
    ke = np.asarray(ke, np.float64)
    key = ke.tobytes()
    cached = _WTABLES.get(key)
    if cached is not None:
        return cached
    W = np.zeros((3, 3, 3, 3, 3, 3, 3, 3), np.float64)
    for rz in range(3):
        for ry in range(3):
            for rx in range(3):
                for a, ca in enumerate(_CORNERS):
                    ok = True
                    for off, r in zip(ca, (rz, ry, rx)):
                        if (off == 0 and r == 2) or (off == 1 and r == 0):
                            ok = False
                            break
                    if not ok:
                        continue
                    for b, cb in enumerate(_CORNERS):
                        dz, dy, dx = (cb[0] - ca[0], cb[1] - ca[1], cb[2] - ca[2])
                        W[rz, ry, rx, dz + 1, dy + 1, dx + 1] += ke[
                            3 * a : 3 * a + 3, 3 * b : 3 * b + 3
                        ]
    W = np.ascontiguousarray(W.reshape(27, 27, 3, 3))
    _WTABLES[key] = W
    return W


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def stencil_apply_host(
    ke: np.ndarray, g: np.ndarray, dims: tuple[int, int, int]
) -> np.ndarray:
    """Exact-f64 ``K @ u`` on the host node grid, C++ fast path.

    Same contract as :func:`fea_tpu.ops.structured.stencil_apply_np`
    (``g`` is the (nz+1, ny+1, nx+1, 3) node grid, ``dims`` the element
    counts); results agree to f64 rounding of the assembled stencil
    weights (pinned by tests/test_native.py).  Falls back to the NumPy
    twin when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        from ..ops.structured import stencil_apply_np

        return stencil_apply_np(ke, g, dims)
    nx, ny, nz = dims
    Z, Y, X = nz + 1, ny + 1, nx + 1
    g = np.ascontiguousarray(g, np.float64)
    assert g.shape == (Z, Y, X, 3), (g.shape, dims)
    W = region_weight_table(ke)
    out = np.empty_like(g)
    lib.fea_stencil_apply_f64(_dp(W), _dp(g), _dp(out), X, Y, Z)
    return out


def stencil_residual_host(
    ke: np.ndarray,
    u: np.ndarray,
    b: np.ndarray,
    free: np.ndarray,
    dims: tuple[int, int, int],
) -> Optional[tuple[np.ndarray, float, np.ndarray]]:
    """Fused masked residual ``r = free * (b - K@u)``, its norm, and the
    raw apply ``K@u`` in one grid pass, each returned flat ``(N, 3)``.
    Returns None when the native library is unavailable (callers compose
    the NumPy twin instead).
    """
    lib = get_lib()
    if lib is None:
        return None
    nx, ny, nz = dims
    Z, Y, X = nz + 1, ny + 1, nx + 1
    u = np.ascontiguousarray(u, np.float64).reshape(Z, Y, X, 3)
    b = np.ascontiguousarray(b, np.float64).reshape(Z, Y, X, 3)
    free = np.ascontiguousarray(free, np.float64).reshape(Z, Y, X, 3)
    W = region_weight_table(ke)
    r = np.empty_like(u)
    au = np.empty_like(u)
    nrm2 = lib.fea_stencil_residual_f64(
        _dp(W), _dp(u), _dp(b), _dp(free), _dp(r), _dp(au), X, Y, Z
    )
    return r.reshape(-1, 3), float(np.sqrt(nrm2)), au.reshape(-1, 3)


def pack_var_weights(w: np.ndarray) -> np.ndarray:
    """Node-major packing of a curvilinear weight field for the native
    variable-weight kernels: (27, Z, Y, X, 3, 3) offset-major ->
    contiguous (Z, Y, X, 27, 3, 3) so each node's 27x9 block row is one
    ~1.9 KB stream.  One O(field) transpose per operator; callers cache
    the result across certification rounds."""
    w = np.asarray(w, np.float64)
    assert w.ndim == 6 and w.shape[0] == 27 and w.shape[4:] == (3, 3), w.shape
    return np.ascontiguousarray(np.moveaxis(w, 0, 3))


def var_stencil_apply_host(Wn: np.ndarray, g: np.ndarray) -> Optional[np.ndarray]:
    """Exact-f64 curvilinear ``K @ u`` on the host, C++ fast path.

    ``Wn`` from :func:`pack_var_weights`; ``g`` the (Z, Y, X, 3) node
    grid.  Returns None when the native library is unavailable (callers
    use ``fea_tpu.ops.curvilinear.curv_apply_np`` on the unpacked field
    instead)."""
    lib = get_lib()
    if lib is None:
        return None
    Z, Y, X = g.shape[:3]
    assert Wn.shape == (Z, Y, X, 27, 3, 3), (Wn.shape, g.shape)
    g = np.ascontiguousarray(g, np.float64)
    out = np.empty_like(g)
    lib.fea_varstencil_apply_f64(_dp(Wn), _dp(g), _dp(out), X, Y, Z)
    return out


def var_stencil_residual_host(
    Wn: np.ndarray,
    u: np.ndarray,
    b: np.ndarray,
    free: np.ndarray,
) -> Optional[tuple[np.ndarray, float, np.ndarray]]:
    """Fused masked residual ``r = free * (b - K@u)``, its norm, and the
    raw apply for the curvilinear family, one grid pass in exact IEEE
    f64; each returned flat (N, 3).  None when no native library."""
    lib = get_lib()
    if lib is None:
        return None
    Z, Y, X = Wn.shape[:3]
    u = np.ascontiguousarray(u, np.float64).reshape(Z, Y, X, 3)
    b = np.ascontiguousarray(b, np.float64).reshape(Z, Y, X, 3)
    free = np.ascontiguousarray(free, np.float64).reshape(Z, Y, X, 3)
    r = np.empty_like(u)
    au = np.empty_like(u)
    nrm2 = lib.fea_varstencil_residual_f64(
        _dp(Wn), _dp(u), _dp(b), _dp(free), _dp(r), _dp(au), X, Y, Z
    )
    return r.reshape(-1, 3), float(np.sqrt(nrm2)), au.reshape(-1, 3)


def stencil_residual_slab_host(
    ke: np.ndarray,
    g_slab: np.ndarray,
    b_slab: np.ndarray,
    free_slab: np.ndarray,
    r_slab: np.ndarray,
    au_slab: np.ndarray,
    dims: tuple[int, int, int],
    z0: int,
    g0: int,
) -> Optional[float]:
    """Rows ``[z0, z0+nz_loc)`` of the masked residual against a
    ``g_slab`` spanning ``[g0, ...)`` (the streaming certification tier:
    callers pull the iterate in overlapping z-chunks and run this per
    chunk while the next chunk's transfer is in flight).  Writes into
    the caller's ``r_slab``/``au_slab`` views; returns the slab's
    squared norm, or None without the native library."""
    lib = get_lib()
    if lib is None:
        return None
    nx, ny, nz = dims
    Z, Y, X = nz + 1, ny + 1, nx + 1
    nz_loc = b_slab.shape[0]
    assert g_slab.shape[1:] == (Y, X, 3) and b_slab.shape[1:] == (Y, X, 3)
    assert r_slab.shape == b_slab.shape and au_slab.shape == b_slab.shape
    W = region_weight_table(ke)
    g_slab = np.ascontiguousarray(g_slab, np.float64)
    b_slab = np.ascontiguousarray(b_slab, np.float64)
    free_slab = np.ascontiguousarray(free_slab, np.float64)
    return float(
        lib.fea_stencil_residual_slab_f64(
            _dp(W), _dp(g_slab), _dp(b_slab), _dp(free_slab),
            _dp(r_slab), _dp(au_slab), X, Y, Z, z0, nz_loc, g0,
        )
    )
