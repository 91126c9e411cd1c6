"""On-chip SpMV shoot-out: XLA einsum/dot paths vs the Pallas
element-on-lanes kernels vs the structured stencil, on the default
backend (TPU under axon).

VERDICT.md next-round #5: "run stored/uniform kernels on the chip vs the
XLA einsum path, keep the winner as default for the unstructured path."
This prints one JSON line with ms-per-apply for each operator mode; the
measured winner is recorded in fea_tpu/operator.py's build_operator
docstring and README.

The compute replaced: the reference's per-element ``Ke @ u`` inside its
dense assembly loop (/root/reference/fea.py:89-97).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def time_apply(op, x, n=20):
    """ms per op.apply_raw(x).  The operator is passed as a jit ARGUMENT:
    jitting the bound method instead would close over the operator and
    embed its arrays (755 MB of stored Ke at bench size) as HLO constants
    — the remote-compile helper rejects such programs with HTTP 413."""
    import jax

    f = jax.jit(lambda o, v: o.apply_raw(v))
    jax.block_until_ready(f(op, x))  # compile
    y = x
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(op, y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / n * 1e3


def main() -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--nx", type=int, default=32)
    p.add_argument("--ny", type=int, default=32)
    p.add_argument("--nz", type=int, default=320)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from fea_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache(
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    )
    import jax.numpy as jnp
    import numpy as np

    import fea_tpu as ft
    from fea_tpu.ops.structured import build_structured_operator, structured_scene

    mat = ft.Material(E=10_000_000 * ft.units.psi, nu=0.3)
    scene, dims = structured_scene(args.nx, args.ny, args.nz, 0.1, 0.1, 1.0, mat, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(scene.n_nodes, 3)), jnp.float32)

    results = {
        "backend": jax.default_backend(),
        "n_dof": scene.n_dof,
        "n_elements": scene.n_elements,
    }

    import sys as _sys

    op_st = build_structured_operator(scene, dims, dtype=jnp.float32)
    results["structured_stencil_ms"] = round(time_apply(op_st, x), 3)
    print("structured done", file=_sys.stderr)

    for label, kwargs in [
        ("uniform_xla", dict(uniform=True)),
        ("uniform_pallas", dict(uniform=True, use_pallas=True)),
        ("matfree_xla", dict(uniform=False)),
    ]:
        op = ft.build_operator(scene, dtype=jnp.float32, **kwargs)
        results[f"{label}_ms"] = round(time_apply(op, x), 3)
        print(label, results[f"{label}_ms"], "ms", file=_sys.stderr)

    # Stored-Ke modes run at a smaller scene: an (E, 24, 24) f32 batch at
    # full bench size OOMs the chip once XLA pads the trailing dims to
    # lane tiles (measured: 30 GB vs 15.75 GB HBM).  Stored mode exists
    # for beams/bars/small irregular meshes, not 327k-element voxel boxes.
    scene_s, _dims_s = structured_scene(
        args.nx // 2, args.ny // 2, args.nz // 2, 0.1, 0.1, 1.0, mat, dtype=jnp.float32
    )
    x_s = jnp.asarray(rng.normal(size=(scene_s.n_nodes, 3)), jnp.float32)
    results["stored_n_elements"] = scene_s.n_elements
    import dataclasses

    for label, kwargs in [
        ("stored_xla", dict(uniform=False)),
        ("stored_pallas", dict(uniform=False, use_pallas=True)),
    ]:
        op = ft.build_operator(scene_s, dtype=jnp.float32, **kwargs)
        op = dataclasses.replace(
            op, kind="stored", ke=op.element_matrices(), geom=None, material=None
        )
        results[f"{label}_ms"] = round(time_apply(op, x_s), 3)
        print(label, results[f"{label}_ms"], "ms", file=_sys.stderr)

    # bandwidth floor for the stencil (one read + one write of (N,3) f32)
    ms = results["structured_stencil_ms"]
    results["stencil_hbm_gbps_min"] = round(2 * scene.n_dof * 4 / (ms * 1e-3) / 1e9, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
