"""Pallas flash-attention kernel vs the XLA reference path (interpret mode on
CPU; the same kernel compiles for real on TPU — see bench_kernels.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistentid_tpu.ops import reference_attention
from consistentid_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize(
    "b,h,sq,sk,d",
    [
        (1, 2, 128, 128, 64),     # aligned
        (2, 4, 300, 77, 40),      # cross-attn shape (padding in all dims)
        (1, 2, 1024, 1024, 40),   # self-attn shape, multiple k blocks
    ],
)
def test_flash_matches_reference(b, h, sq, sk, d):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (b, h, sq, d), jnp.float32)
    k = jax.random.normal(k2, (b, h, sk, d), jnp.float32)
    v = jax.random.normal(k3, (b, h, sk, d), jnp.float32)
    want = reference_attention(q, k, v)
    got = flash_attention(q, k, v, interpret=jax.default_backend() != "tpu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_flash_key_padding_is_masked():
    """Keys added for tile alignment must not leak probability mass."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(k1, (1, 1, 128, 64), jnp.float32)
    k = jax.random.normal(k2, (1, 1, 130, 64), jnp.float32)  # pads to 256
    v = jax.random.normal(k3, (1, 1, 130, 64), jnp.float32) + 100.0
    want = reference_attention(q, k, v)
    got = flash_attention(q, k, v, block_k=128,
                          interpret=jax.default_backend() != "tpu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=1e-4)
