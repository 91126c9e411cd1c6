"""On-chip numerics check: device results vs host f64 oracles.

Round-1 shipped a bench whose TPU solve diverged while the CPU run of the
identical code converged — the class of bug the CPU-pinned test suite
cannot see (VERDICT.md weak #9).  This tool runs the compute-path
building blocks on the *default* backend (TPU under axon; CPU elsewhere)
and checks them against f64 NumPy/host oracles:

  1. structured stencil apply  (ops.structured.stencil_apply_grid)
  2. matrix-free element apply (elements.hex8.apply_elements via operator)
  3. one multigrid V-cycle     (ops.multigrid.MultigridPreconditioner)

Agreement must be <= 1e-5 relative (f32 compute, HIGHEST-precision
contractions).  Runs standalone (``python tools/tpu_check.py``) printing
one JSON line, and is embedded in bench.py so its verdict lands in the
benchmark JSON (VERDICT.md next-round #6).

Shapes are mid-size on purpose: small-shape f32 programs hit a
minutes-long compiler path on this TPU toolchain (see
.claude/skills/verify/SKILL.md).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

TOL = 1e-5


def run_checks(nx: int = 16, ny: int = 16, nz: int = 64) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import fea_tpu as ft
    from fea_tpu.ops.multigrid import build_multigrid
    from fea_tpu.ops.structured import (
        build_structured_operator,
        stencil_apply_np,
        structured_scene,
    )

    assert jax.config.jax_enable_x64, "tpu_check needs x64 for the f64 oracles"
    backend = jax.default_backend()
    lx = ly = 0.1
    lz = 0.4
    mat = ft.Material(E=10_000_000 * ft.units.psi, nu=0.3)
    scene, dims = structured_scene(nx, ny, nz, lx, ly, lz, mat, dtype=jnp.float64)
    rng = np.random.default_rng(20260816)
    x_np = rng.normal(size=(scene.n_nodes, 3))
    checks: dict[str, float] = {}

    def rel_err(got, want):
        scale = float(np.max(np.abs(want)))
        return float(np.max(np.abs(np.asarray(got, np.float64) - want))) / max(scale, 1e-300)

    # 1. stencil apply: device f32 vs NumPy f64 twin
    op64 = build_structured_operator(scene, dims, dtype=jnp.float64)
    ke64 = np.asarray(op64.ke, np.float64)
    Z, Y, X = op64.grid_shape
    want_raw = stencil_apply_np(ke64, x_np.reshape(Z, Y, X, 3), dims).reshape(-1, 3)
    op32 = op64.astype(jnp.float32)
    x32 = jnp.asarray(x_np, jnp.float32)
    got_raw = jax.jit(op32.apply_raw)(x32)
    checks["stencil_apply_rel_err"] = rel_err(got_raw, want_raw)

    # 2. unstructured matrix-free element apply vs the same oracle
    op_mf = ft.build_operator(scene, dtype=jnp.float32, uniform=False)
    got_mf = jax.jit(op_mf.apply_raw)(x32)
    checks["matfree_apply_rel_err"] = rel_err(got_mf, want_raw)

    # 3. one V-cycle: device f32 vs the same V-cycle jitted on host CPU f64
    spacing = (lx / nx, ly / ny, lz / nz)
    mg32 = build_multigrid(op32, spacing, mat, degree=3, dtype=jnp.float32)
    r32 = jnp.asarray(x_np, jnp.float32).reshape(-1, 3) * op32.free
    got_v = jax.jit(lambda r: mg32(r))(r32)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # reference hierarchy from the SAME f32-rounded Ke, executed at
        # f64 on CPU: the check isolates backend/execution precision.
        # (Building from the f64 Ke instead perturbs the coarse dense
        # inverse by kappa(A_c) * eps_f32 ~ 3e-4 — build-input rounding,
        # not an execution defect.)
        op64_ref = op32.astype(jnp.float64)
        mg64 = build_multigrid(op64_ref, spacing, mat, degree=3, dtype=jnp.float64)
        r64 = jnp.asarray(np.asarray(r32, np.float64).reshape(-1, 3))
        want_v = np.asarray(jax.jit(lambda r: mg64(r))(r64))
    checks["vcycle_rel_err"] = rel_err(got_v, want_v)

    # 4. transposed pipeline: fused Pallas f32 stencil kernel and the
    # double-f32 (dd) f64-accurate apply vs the same NumPy f64 oracle.
    # On TPU these run the real Mosaic kernels (the production path of
    # solve_operator_fpcg_t); elsewhere interpret mode still validates
    # the lowered arithmetic.
    from fea_tpu.ops.pallas_stencil import (
        split_ke_dd,
        stencil_apply_transposed,
        stencil_apply_transposed_dd,
    )
    from fea_tpu.ops.transposed import grid_of_t, t_of_grid

    interpret = backend != "tpu"
    xT32 = t_of_grid(x32.reshape(Z, Y, X, 3))
    got_pl = grid_of_t(
        stencil_apply_transposed(op32.ke, xT32, interpret=interpret)
    ).reshape(-1, 3)
    checks["pallas_stencil_rel_err"] = rel_err(got_pl, want_raw)

    ksplits = tuple(jnp.asarray(k) for k in split_ke_dd(ke64))
    x64T = t_of_grid(jnp.asarray(x_np).reshape(Z, Y, X, 3))
    hi32 = x64T.astype(jnp.float32)
    lo32 = (x64T - hi32.astype(jnp.float64)).astype(jnp.float32)
    fh, fl = stencil_apply_transposed_dd(*ksplits, hi32, lo32, interpret=interpret)
    got_dd = grid_of_t(fh.astype(jnp.float64) + fl.astype(jnp.float64)).reshape(-1, 3)
    # EFT arithmetic must land orders below plain f32 (measured 2.3e-11)
    checks["dd_apply_rel_err"] = rel_err(got_dd, want_raw)
    ok = all(v <= TOL for v in checks.values()) and checks["dd_apply_rel_err"] <= 1e-9
    return {"tpu_check_ok": ok, "backend": backend, "tol": TOL, **checks}


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from fea_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    )
    result = run_checks()
    print(json.dumps(result))
    raise SystemExit(0 if result["tpu_check_ok"] else 1)
