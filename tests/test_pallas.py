"""Pallas element-apply kernels (interpret mode on CPU) vs XLA einsum."""
import jax.numpy as jnp
import numpy as np

from fea_tpu.ops.pallas_apply import batched_matvec_stored, batched_matvec_uniform


def test_stored_kernel_matches_einsum(rng):
    E, k = 700, 24  # deliberately not a multiple of the tile size
    ke = jnp.asarray(rng.normal(size=(E, k, k)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(E, k)), jnp.float32)
    got = np.asarray(batched_matvec_stored(ke, u, interpret=True))
    want = np.asarray(jnp.einsum("eab,eb->ea", ke, u))
    assert np.allclose(got, want, rtol=1e-5, atol=1e-5)


def test_uniform_kernel_matches_matmul(rng):
    E, k = 1030, 24
    ke = jnp.asarray(rng.normal(size=(k, k)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(E, k)), jnp.float32)
    got = np.asarray(batched_matvec_uniform(ke, u, interpret=True))
    want = np.asarray(u @ ke.T)
    assert np.allclose(got, want, rtol=1e-5, atol=1e-5)
