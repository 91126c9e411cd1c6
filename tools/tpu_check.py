"""On-chip numerics gate: device results vs host f64 oracles — fast.

Round-1 shipped a bench whose TPU solve diverged while the CPU run of
the identical code converged — the class of bug the CPU-pinned test
suite cannot see.  Round 2 made this a FAST STANDALONE gate (VERDICT.md
round-2 #7): it must produce its verdict in well under 2 minutes cold so
that on-chip numerics evidence lands even when the benchmark does not.

Default checks (every one against an independent host f64 oracle):

  1. structured stencil apply, f32 XLA    (ops.structured.stencil_apply_grid)
  2. fused Pallas f32 stencil kernel      (ops.pallas_stencil, transposed)
  3. double-f32 (dd) Pallas apply         (the production solver's operator)
  4. two-level Chebyshev V-cycle, f32     (vs the same V-cycle at f64 on CPU)
  5. bitwise determinism                  (two identical PCG solves -> same bits)

``--full`` adds the slower round-1 checks (unstructured matrix-free
apply, full-depth V-cycle).  Prints one JSON line; exit 0 iff all pass.

Shapes are mid-size on purpose: small-shape f32 programs hit a
minutes-long compiler path on this TPU toolchain.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

TOL = 1e-5


def run_checks(nx: int = 16, ny: int = 16, nz: int = 64, full: bool = False) -> dict:
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

    t_start = time.perf_counter()
    assert jax.config.jax_enable_x64, "tpu_check needs x64 for the f64 oracles"
    backend = jax.default_backend()
    lx = ly = 0.1
    lz = 0.4
    mat = ft.Material(E=10_000_000 * ft.units.psi, nu=0.3)
    scene, dims = structured_scene(nx, ny, nz, lx, ly, lz, mat, dtype=jnp.float64)
    rng = np.random.default_rng(20260816)
    x_np = rng.normal(size=(scene.n_nodes, 3))
    checks: dict[str, float] = {}
    errors: dict[str, str] = {}

    def guarded(name, fn):
        """Run one check; an infra crash (the axon backend can die
        mid-process — INVALID_ARGUMENT poisoning, observed 2026-08-19)
        records an error for THIS check and lets the JSON land with
        whatever evidence was already gathered."""
        try:
            fn()
        except Exception as exc:  # noqa: BLE001 — verdict must still print
            errors[name] = str(exc)

    def rel_err(got, want):
        scale = float(np.max(np.abs(want)))
        return float(np.max(np.abs(np.asarray(got, np.float64) - want))) / max(scale, 1e-300)

    from types import SimpleNamespace

    s = SimpleNamespace()  # intermediates shared across guarded blocks

    def check_stencil():
        # 1. stencil apply: device f32 vs host f64 twin
        s.op64 = build_structured_operator(scene, dims, dtype=jnp.float64)
        s.ke64 = np.asarray(s.op64.ke, np.float64)
        s.Z, s.Y, s.X = s.op64.grid_shape
        s.want_raw = stencil_apply_np(
            s.ke64, x_np.reshape(s.Z, s.Y, s.X, 3), dims
        ).reshape(-1, 3)
        s.op32 = s.op64.astype(jnp.float32)
        s.x32 = jnp.asarray(x_np, jnp.float32)
        got_raw = jax.jit(s.op32.apply_raw)(s.x32)
        checks["stencil_apply_rel_err"] = rel_err(got_raw, s.want_raw)

    def check_pallas():
        # 2./3. transposed Pallas kernels: fused f32 stencil and the dd
        # (double-f32, ~f64-accurate) apply — the production solver's
        # operator — vs the same host f64 oracle.  On TPU these run the
        # real Mosaic kernels; elsewhere interpret mode validates the
        # arithmetic.
        from fea_tpu.ops.pallas_stencil import (
            split_ke_dd,
            stencil_apply_transposed,
            stencil_apply_transposed_dd,
        )
        from fea_tpu.ops.transposed import grid_of_t, t_of_grid

        interpret = backend != "tpu"
        xT32 = t_of_grid(s.x32.reshape(s.Z, s.Y, s.X, 3))
        got_pl = grid_of_t(
            stencil_apply_transposed(s.op32.ke, xT32, interpret=interpret)
        ).reshape(-1, 3)
        checks["pallas_stencil_rel_err"] = rel_err(got_pl, s.want_raw)

        ksplits = tuple(jnp.asarray(k) for k in split_ke_dd(s.ke64))
        x64T = t_of_grid(jnp.asarray(x_np).reshape(s.Z, s.Y, s.X, 3))
        s.hi32 = x64T.astype(jnp.float32)
        s.lo32 = (x64T - s.hi32.astype(jnp.float64)).astype(jnp.float32)
        fh, fl = stencil_apply_transposed_dd(
            *ksplits, s.hi32, s.lo32, interpret=interpret
        )
        s.got_dd = grid_of_t(
            fh.astype(jnp.float64) + fl.astype(jnp.float64)
        ).reshape(-1, 3)
        # EFT arithmetic must land orders below plain f32 (measured 2.3e-11)
        checks["dd_apply_rel_err"] = rel_err(s.got_dd, s.want_raw)

    def check_chunked():
        # 3b. z-chunked dd apply (the > VMEM-fit production decomposition
        # and the multichip halo path's per-shard form) vs the single-call
        # kernel on the same inputs — the decomposition must be
        # numerically inert.  (On-chip twin of tests/test_pallas.py::
        # test_dd_chunked_apply_matches_single_call, which is `-m slow`.)
        from fea_tpu.ops.pallas_stencil import (
            stencil_apply_transposed_dd_chunked,
            stencil_tables_dd,
        )
        from fea_tpu.ops.transposed import grid_of_t

        ddtabs = stencil_tables_dd(s.ke64)
        ch, cl = stencil_apply_transposed_dd_chunked(
            s.hi32, s.lo32, tables=ddtabs, n_chunks=2,
            interpret=backend != "tpu",
        )
        got_ch = grid_of_t(
            ch.astype(jnp.float64) + cl.astype(jnp.float64)
        ).reshape(-1, 3)
        checks["dd_chunked_vs_single_rel_err"] = rel_err(got_ch, s.got_dd)

    def check_vcycle():
        # 4. V-cycle: device f32 vs the same V-cycle at f64 on host CPU.
        # TWO levels, low degree: enough to exercise smoother + transfer +
        # coarse inverse numerics while keeping compile time in seconds
        # (--full runs the full-depth hierarchy).
        spacing = (lx / nx, ly / ny, lz / nz)
        levels = 10 if full else 2
        degree = 3
        mg32 = build_multigrid(s.op32, spacing, mat, degree=degree,
                               dtype=jnp.float32, max_levels=levels)
        r32 = jnp.asarray(x_np, jnp.float32).reshape(-1, 3) * s.op32.free
        # mg is a pytree ARGUMENT, not a closure: closed-over level arrays
        # would be baked into the HLO as constants and blow past the axon
        # tunnel's /remote_compile request-body limit (observed HTTP 413).
        got_v = jax.jit(lambda mg, r: mg(r))(mg32, r32)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            # reference hierarchy from the SAME f32-rounded Ke, executed
            # at f64 on CPU: the check isolates backend/execution
            # precision.
            op64_ref = s.op32.astype(jnp.float64)
            mg64 = build_multigrid(op64_ref, spacing, mat, degree=degree,
                                   dtype=jnp.float64, max_levels=levels)
            r64 = jnp.asarray(np.asarray(r32, np.float64).reshape(-1, 3))
            want_v = np.asarray(jax.jit(lambda mg, r: mg(r))(mg64, r64))
        checks["vcycle_rel_err"] = rel_err(got_v, want_v)

    def check_determinism():
        # 5. bitwise determinism: the same jitted PCG solve twice on
        # identical inputs must produce identical bits (fixed topology,
        # deterministic reductions — SURVEY.md §5.2's race-detection
        # analog).
        from fea_tpu.solvers.cg import pcg

        nodes = np.asarray(scene.nodes)
        loads = np.zeros_like(nodes)
        tipsel = nodes[:, 2] == lz
        loads[tipsel, 1] = 1.0 / tipsel.sum()
        loads32 = jnp.asarray(loads, jnp.float32)
        diag = s.op32.diag_masked()

        def solve_once(l):
            b = s.op32.rhs(l, jnp.zeros_like(l))
            u, _ = pcg(s.op32.apply, b, precond_diag=diag, tol=1e-6,
                       max_iters=500)
            return u

        solve_jit = jax.jit(solve_once)
        u1 = np.asarray(solve_jit(loads32))
        u2 = np.asarray(solve_jit(jnp.asarray(loads, jnp.float32)))
        checks["determinism_bitwise_ok"] = bool(np.array_equal(u1, u2))

    def check_matfree():
        # round-1 extra: unstructured matrix-free element apply
        op_mf = ft.build_operator(scene, dtype=jnp.float32, uniform=False)
        got_mf = jax.jit(op_mf.apply_raw)(s.x32)
        checks["matfree_apply_rel_err"] = rel_err(got_mf, s.want_raw)

    guarded("stencil_apply", check_stencil)
    guarded("pallas", check_pallas)
    guarded("dd_chunked", check_chunked)
    guarded("vcycle", check_vcycle)
    guarded("determinism", check_determinism)
    if full:
        guarded("matfree", check_matfree)

    ok = (
        not errors
        and all(v <= TOL for k, v in checks.items() if k.endswith("rel_err"))
        and checks.get("dd_apply_rel_err", 1.0) <= 1e-9
        and checks.get("determinism_bitwise_ok", False)
    )
    out = {
        "tpu_check_ok": ok,
        "backend": backend,
        "tol": TOL,
        "wall_s": round(time.perf_counter() - t_start, 1),
        **checks,
    }
    if errors:
        out["errors"] = errors
    return out


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--full", action="store_true", help="add the slow round-1 checks")
    p.add_argument(
        "--probe-timeout-s", type=float, default=120.0,
        help="TPU-tunnel liveness probe (a dead tunnel hangs jax.devices() "
        "forever); on failure the checks run on CPU in interpret mode so "
        "a verdict still lands.  0 skips the probe.",
    )
    args = p.parse_args()

    if not args.cpu and args.probe_timeout_s > 0:
        import subprocess

        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=args.probe_timeout_s,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                check=True,
            )
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            print("tpu_check: TPU tunnel unreachable - running on CPU "
                  "(interpret mode)", file=sys.stderr, flush=True)
            args.cpu = True

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from fea_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    )
    result = run_checks(full=args.full)
    print(json.dumps(result))
    raise SystemExit(0 if result["tpu_check_ok"] else 1)
