"""Fused BN+act Pallas kernel vs plain-JAX reference, incl. the psum SyncBN
variant on the 8-device CPU mesh (interpret mode)."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from consistentid_tpu.ops.fused_bn_act import (apply_bn_act, batch_moments,
                                               fused_bn_act,
                                               sync_batch_norm_act)
from consistentid_tpu.parallel import make_mesh

INTERP = jax.default_backend() != "tpu"


def _ref_bn_act(x, scale, bias, eps=1e-5, slope=0.01):
    mean = x.mean(axis=(0, 1, 2))
    var = x.var(axis=(0, 1, 2))
    y = (x - mean) / np.sqrt(var + eps) * scale + bias
    return np.where(y >= 0, y, y * slope), mean, var


def test_fused_bn_act_matches_reference():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 7, 24).astype(np.float32)  # odd sizes force padding
    scale = rng.rand(24).astype(np.float32) + 0.5
    bias = rng.randn(24).astype(np.float32)
    want, want_mean, want_var = _ref_bn_act(x, scale, bias)
    y, mean, var = fused_bn_act(jnp.asarray(x), jnp.asarray(scale),
                                jnp.asarray(bias), interpret=INTERP)
    np.testing.assert_allclose(np.asarray(mean), want_mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), want_var, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)


@pytest.mark.parametrize("act", ["relu", "silu", "identity"])
def test_activations(act):
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 16).astype(np.float32)
    scale = np.ones(16, np.float32)
    bias = np.zeros(16, np.float32)
    y, mean, var = fused_bn_act(jnp.asarray(x), jnp.asarray(scale),
                                jnp.asarray(bias), activation=act,
                                interpret=INTERP)
    norm = (x - x.mean((0, 1, 2))) / np.sqrt(x.var((0, 1, 2)) + 1e-5)
    ref = {"relu": np.maximum(norm, 0),
           "silu": norm / (1 + np.exp(-norm)),
           "identity": norm}[act]
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)


def test_sync_batch_norm_matches_global_moments():
    """SyncBN over the 8-device mesh == BN over the concatenated batch."""
    mesh = make_mesh()
    n = mesh.devices.size
    rng = np.random.RandomState(2)
    x = rng.randn(n * 2, 4, 4, 8).astype(np.float32)
    scale = rng.rand(8).astype(np.float32) + 0.5
    bias = rng.randn(8).astype(np.float32)
    want, want_mean, want_var = _ref_bn_act(x, scale, bias)

    fn = jax.shard_map(
        functools.partial(sync_batch_norm_act, axis_name="data",
                          interpret=INTERP),
        mesh=mesh,
        in_specs=(P("data"), P(), P()),
        out_specs=(P("data"), P(), P()),
        check_vma=False)  # pallas_call outputs carry no vma annotation
    y, mean, var = fn(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(mean), want_mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), want_var, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)
