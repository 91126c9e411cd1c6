"""On-chip stage profile of the transposed-layout solve at bench size.

Times each pipeline component as its own jitted program (N warm reps,
best time) so the end-to-end bench number can be attributed:
layout transposes, dd masked apply, f32 V-cycle, the f64 vector algebra
of one FCG iteration, and the whole fpcg solve.  Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def timeit(fn, *args, reps=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=32)
    p.add_argument("--ny", type=int, default=32)
    p.add_argument("--nz", type=int, default=320)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--reps", type=int, default=10)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    import fea_tpu as ft
    from fea_tpu.ops.pallas_stencil import split_ke_dd
    from fea_tpu.ops.structured import build_structured_operator, structured_scene
    from fea_tpu.ops.transposed import (
        build_multigrid_t,
        grid_of_t,
        masked_apply_dd_T,
        t_of_grid,
    )
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

    rng = np.random.default_rng(0)
    x64 = jnp.asarray(rng.normal(size=(Z, Y, X, 3)))
    xT64 = jax.block_until_ready(jnp.transpose(x64, (3, 1, 2, 0)))
    xT32 = jax.block_until_ready(xT64.astype(jnp.float32))
    freeT = jax.block_until_ready(
        jnp.asarray(np.transpose(free_np.reshape(Z, Y, X, 3), (3, 1, 2, 0)))
    )

    r: dict[str, float] = {"backend": backend, "n_dof": 3 * Z * Y * X}

    # layout transposes
    r["transpose_f64_ms"] = timeit(jax.jit(t_of_grid), x64, reps=args.reps)
    r["transpose_f32_ms"] = timeit(jax.jit(lambda g: t_of_grid(g)), x64.astype(jnp.float32), reps=args.reps)

    # applies
    r["dd_masked_apply_ms"] = timeit(
        jax.jit(lambda x: masked_apply_dd_T(ksplits, freeT, x)), xT64, reps=args.reps
    )
    fine = mg_t.levels[0]
    r["f32_level_apply_ms"] = timeit(jax.jit(fine.apply), xT32, reps=args.reps)

    # one V-cycle
    r["vcycle_ms"] = timeit(jax.jit(lambda v: mg_t(v)), xT32, reps=args.reps)

    # f64 vector algebra of one FCG iteration (3 axpys + 3 dots + casts)
    @jax.jit
    def fcg_vec_ops(x, p, rr, z):
        from fea_tpu.dtypes import precise_dot

        pAp = precise_dot(p, rr, jnp.float64)
        alpha = 0.5 / pAp
        x2 = x + alpha * p
        r2 = rr - alpha * p
        rz = precise_dot(r2, z, jnp.float64)
        rz2 = precise_dot(r2, r2, jnp.float64)
        beta = rz / rz2
        p2 = z + beta * p
        return x2, r2, p2, rz

    r["fcg_vector_algebra_ms"] = timeit(fcg_vec_ops, xT64, xT64, xT64, xT64, reps=args.reps)

    # f64 <-> f32 casts and split
    @jax.jit
    def split(x):
        hi = x.astype(jnp.float32)
        lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
        return hi, lo

    r["split_to_pair_ms"] = timeit(split, xT64, reps=args.reps)

    # whole solve (same as bench)
    from fea_tpu.solve import solve_operator_fpcg_t

    loads = scene.loads
    zero = scene.prescribed_or_zero(jnp.float64)

    def full():
        sol = solve_operator_fpcg_t(op, loads, zero, mg_t, tol=1e-8, max_iters=300)
        jax.block_until_ready(sol.displacements)
        return sol

    sol = full()
    r["fpcg_iterations"] = int(sol.stats.iterations)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sol = full()
        best = min(best, time.perf_counter() - t0)
    r["fpcg_solve_ms"] = best * 1e3
    r["fpcg_per_iter_ms"] = best * 1e3 / max(r["fpcg_iterations"], 1)

    r = {k: (round(v, 3) if isinstance(v, float) else v) for k, v in r.items()}
    print(json.dumps(r))


if __name__ == "__main__":
    main()
