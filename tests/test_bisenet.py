"""BiSeNet parity vs the reference torch implementation (model-zoo download
patched out; random BN stats) + SyncBN training-mode behavior."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistentid_tpu.io import convert
from consistentid_tpu.models.bisenet import (BiSeNet,
                                             resize_bilinear_align_corners)
from tests.reference_import import REFERENCE_ROOT, reference_available

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present")


def _load_reference_bisenet():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "torchvision" not in sys.modules:  # imported but unused by model.py
        import types
        sys.modules["torchvision"] = types.ModuleType("torchvision")
    import models.BiSeNet.resnet as ref_resnet
    # Resnet18.init_weight downloads torchvision weights; zero-egress env
    ref_resnet.modelzoo.load_url = lambda url: {}
    import models.BiSeNet.model as ref_model
    return ref_model


def test_resize_align_corners_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 7, 9, 3).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), (20, 30), mode="bilinear",
        align_corners=True).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (20, 30)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bisenet_parity():
    ref_model = _load_reference_bisenet()
    torch.manual_seed(0)
    ref = ref_model.BiSeNet(n_classes=19)
    # randomize BN stats so the test is non-trivial
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 1.5)
            torch.nn.init.normal_(m.weight, 1.0, 0.2)
            torch.nn.init.normal_(m.bias, 0.0, 0.2)
    ref.eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        w_out, w16, w32 = (t.numpy().transpose(0, 2, 3, 1) for t in ref(x))

    params, stats = convert.bisenet_from_torch(
        convert.torch_state_dict_to_numpy(ref.state_dict()))
    model = BiSeNet(n_classes=19)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    g_out, g16, g32 = model.apply(
        {"params": params, "batch_stats": stats}, xj)
    np.testing.assert_allclose(np.asarray(g_out), w_out, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g16), w16, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g32), w32, atol=2e-3)


def test_bisenet_train_mode_updates_stats():
    model = BiSeNet(n_classes=19, train=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(1), x)
    out, mutated = model.apply(variables, x, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
