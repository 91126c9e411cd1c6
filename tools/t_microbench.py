"""Per-op cost of the transposed-solve building blocks, measured INSIDE
one jit via an iteration-count slope (two fori_loop trip counts, slope =
cost/op) — the tunnel's ~27 ms per-dispatch floor makes standalone
timings useless below that granularity (tools/t_profile.py).

Prints one JSON line of per-op milliseconds at the benchmark size.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=32)
    p.add_argument("--ny", type=int, default=32)
    p.add_argument("--nz", type=int, default=320)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--k", type=int, default=20, help="loop trip count (slope uses k and 2k)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    import fea_tpu as ft
    from fea_tpu.dtypes import precise_dot
    from fea_tpu.ops.pallas_stencil import (
        split_ke_dd,
        stencil_apply_transposed,
        stencil_apply_transposed_dd,
    )
    from fea_tpu.ops.structured import build_structured_operator, structured_scene
    from fea_tpu.ops.transposed import build_multigrid_t, masked_apply_dd_T, t_of_grid
    from fea_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    )
    backend = jax.default_backend()
    use_pallas = backend == "tpu"

    mat = ft.Material(E=10_000_000 * ft.units.psi, nu=0.3)
    scene, dims = structured_scene(args.nx, args.ny, args.nz, 0.1, 0.1, 1.0, mat, dtype=jnp.float64)
    op = build_structured_operator(scene, dims, dtype=jnp.float64)
    free_np = 1.0 - np.asarray(scene.fixed, np.float64)
    mg_t = build_multigrid_t(
        op.astype(jnp.float32), dtype=jnp.float32, use_pallas=use_pallas, free_np=free_np
    )
    ksplits = tuple(jnp.asarray(k) for k in split_ke_dd(np.asarray(op.ke, np.float64)))
    Z, Y, X = op.grid_shape
    freeT64 = jnp.asarray(
        np.ascontiguousarray(np.transpose(free_np.reshape(Z, Y, X, 3), (3, 1, 2, 0)))
    )
    freeT32 = freeT64.astype(jnp.float32)

    rng = np.random.default_rng(0)
    xT64 = jnp.asarray(
        np.ascontiguousarray(np.transpose(rng.normal(size=(Z, Y, X, 3)), (3, 1, 2, 0)))
    )
    xT32 = xT64.astype(jnp.float32)

    def loop_time(body, x0, k):
        """Wall time of fori_loop(k) as one jitted program (compiled, warm)."""
        fn = jax.jit(
            lambda x: jax.lax.fori_loop(0, k, lambda i, v: body(v), x)
        )
        out = jax.block_until_ready(fn(x0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    def slope_ms(body, x0, k=args.k):
        t1 = loop_time(body, x0, k)
        t2 = loop_time(body, x0, 2 * k)
        return (t2 - t1) / k * 1e3

    r: dict = {"backend": backend, "n_dof": 3 * Z * Y * X, "k": args.k}

    # f64 axpy (scalar from the carry so it can't be hoisted)
    r["f64_axpy_ms"] = slope_ms(lambda x: x + x[0, 0, 0, 0] * 1e-9 * xT64, xT64)
    # f32 axpy for contrast
    r["f32_axpy_ms"] = slope_ms(
        lambda x: x + x[0, 0, 0, 0] * jnp.float32(1e-9) * xT32, xT32
    )
    # f64 dot (result feeds the carry)
    r["f64_dot_ms"] = slope_ms(
        lambda x: x * (1.0 + 1e-30 * precise_dot(x, x, jnp.float64)), xT64
    )
    # f64 -> f32 pair split + combine back (round trip keeps dependency)
    def split_combine(x):
        hi = x.astype(jnp.float32)
        lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
        return hi.astype(jnp.float64) + lo.astype(jnp.float64)

    r["split_combine_ms"] = slope_ms(split_combine, xT64)

    # exact-f64 certification apply, both layouts (docs/PERF.md records
    # conflicting historical numbers — 17 ms flat vs 55.7 ms transposed
    # at 1M DOF; _t_true_residual now uses flat, this pins the choice)
    from fea_tpu.ops.structured import stencil_apply_grid
    from fea_tpu.ops.transposed import stencil_apply_grid_T

    ke64 = op.ke.astype(jnp.float64)
    x64_flat = jnp.asarray(rng.normal(size=(Z, Y, X, 3)))
    r["f64_apply_flat_ms"] = slope_ms(
        lambda x: stencil_apply_grid(ke64, x, dims) * (1.0 - 1e-12),
        x64_flat, k=max(4, args.k // 4),
    )
    r["f64_apply_T_ms"] = slope_ms(
        lambda x: stencil_apply_grid_T(ke64, x) * (1.0 - 1e-12),
        xT64, k=max(4, args.k // 4),
    )
    # f64 transpose pair (reported per single transpose; tiny mult defeats
    # the t(t(x)) = identity simplification)
    def double_transpose(x):
        return t_of_grid(t_of_grid(x) * (1.0 + 1e-12))

    r["f64_transpose_ms"] = slope_ms(double_transpose, xT64) / 2.0
    r["f32_transpose_ms"] = (
        slope_ms(
            lambda x: t_of_grid(t_of_grid(x) * jnp.float32(1.0000001)), xT32
        )
        / 2.0
    )

    if use_pallas:  # the Mosaic kernels need real TPU hardware
        # masked dd apply as used by the solver today
        r["dd_masked_apply_ms"] = slope_ms(
            lambda x: masked_apply_dd_T(ksplits, freeT64, x) * (1.0 - 1e-12), xT64
        )

        # raw dd kernel on a fixed pair (state threads through hi only)
        def dd_raw(x):
            hi = x.astype(jnp.float32)
            lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
            fh, fl = stencil_apply_transposed_dd(*ksplits, hi, lo)
            return fh.astype(jnp.float64) + fl.astype(jnp.float64)

        r["dd_raw_apply_ms"] = slope_ms(lambda x: dd_raw(x) * (1.0 - 1e-12), xT64)

    # f32 fused stencil kernel / XLA-T fallback (whatever the level uses)
    fine = mg_t.levels[0]
    r["f32_level_apply_ms"] = slope_ms(
        lambda x: fine.apply(x) * jnp.float32(0.5), xT32
    )
    if use_pallas:
        r["f32_pallas_raw_ms"] = slope_ms(
            lambda x: stencil_apply_transposed(ksplits[2], x) * jnp.float32(0.5), xT32
        )

    # one V-cycle
    r["vcycle_ms"] = slope_ms(lambda x: mg_t(x) * jnp.float32(0.5), xT32, k=max(4, args.k // 4))

    r = {k2: (round(v, 3) if isinstance(v, float) else v) for k2, v in r.items()}
    print(json.dumps(r))


if __name__ == "__main__":
    main()
