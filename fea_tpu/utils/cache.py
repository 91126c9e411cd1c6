"""Persistent-compilation-cache hygiene.

Round-1 lesson (VERDICT.md weak #8): a repo-local ``.jax_cache/`` shared
across machines served AOT executables compiled for a *different* CPU
("could lead to execution errors such as SIGILL" warnings in the bench
tail) and a different libtpu build (FAILED_PRECONDITION crash in the
multichip dryrun).  XLA's own cache key does not fully capture the
execution environment on this toolchain, so we add our own: cache
artifacts live in a subdirectory keyed by a fingerprint of the jax
version, backend platform + platform version (which for TPU includes the
libtpu build), and the host CPU's feature flags.  Same machine ->
same directory (cache reuse preserved); any environment change ->
fresh directory (no poisoned artifacts).
"""
from __future__ import annotations

import hashlib
import os

__all__ = ["setup_compilation_cache"]


def _cpu_flags() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return " ".join(sorted(line.split(":", 1)[1].split()))
    except OSError:
        pass
    import platform

    return platform.processor() or platform.machine()


def setup_compilation_cache(base_dir: str, min_compile_secs: float = 0.2) -> str:
    """Point jax's persistent compile cache at a fingerprint-keyed subdir
    of ``base_dir``.  Initializes the default backend (the fingerprint
    needs it), so call this after any jax_platforms / x64 config updates.
    Returns the directory used."""
    import jax
    from jax.extend import backend as jex_backend

    backend = jex_backend.get_backend()
    fingerprint = "|".join(
        [
            jax.__version__,
            backend.platform,
            str(getattr(backend, "platform_version", "")),
            _cpu_flags(),
        ]
    )
    key = hashlib.sha256(fingerprint.encode()).hexdigest()[:16]
    path = os.path.join(base_dir, key)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # NOTE: XLA:CPU still logs "machine feature +prefer-no-scatter not
    # supported" when reloading ITS OWN artifacts — those two are XLA
    # compile *preferences* stamped into the feature list, not real CPU
    # flags, so the complaint fires even for same-machine entries (it
    # recompiles and proceeds).  With the fingerprint key above the
    # artifacts are same-machine by construction; the warning is noise.
    return path
