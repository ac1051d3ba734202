"""BiSeNet trainer: OHEM loss parity vs the reference, schedule shape, and a
shard_map SyncBN training step on the 8-device mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from consistentid_tpu.parallel import make_mesh
from consistentid_tpu.training.bisenet_train import (
    create_bisenet_train_state, make_bisenet_optimizer,
    make_bisenet_train_step, ohem_cross_entropy, warmup_poly_schedule)
from tests.reference_import import reference_available


def test_ohem_parity_with_reference():
    if not reference_available():
        pytest.skip("reference absent")
    import sys
    import torch
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # reference OhemCELoss calls .cuda(); replicate its math on CPU here
    rng = np.random.RandomState(0)
    b, h, w, c = 2, 16, 16, 19
    logits = rng.randn(b, h, w, c).astype(np.float32)
    labels = rng.randint(0, c, (b, h, w)).astype(np.int64)
    labels[0, :4] = 255  # ignore region
    n_min = b * h * w // 16

    tl = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    tlab = torch.from_numpy(labels)
    ce = torch.nn.functional.cross_entropy(
        tl, tlab, ignore_index=255, reduction="none").view(-1)
    ce_sorted, _ = torch.sort(ce, descending=True)
    thresh = -torch.log(torch.tensor(0.7))
    if ce_sorted[n_min] > thresh:
        want = ce_sorted[ce_sorted > thresh].mean().item()
    else:
        want = ce_sorted[:n_min].mean().item()

    got = float(ohem_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                   0.7, n_min))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_warmup_poly_schedule():
    sched = warmup_poly_schedule(lr0=1e-2, warmup_steps=10,
                                 warmup_start_lr=1e-5, max_iter=100,
                                 power=0.9)
    assert abs(float(sched(0)) - 1e-5) < 1e-9
    assert abs(float(sched(10)) - 1e-2) < 1e-6
    assert float(sched(50)) < 1e-2
    assert float(sched(99)) < float(sched(50))


def test_bisenet_train_step_mesh():
    mesh = make_mesh()
    n = mesh.devices.size
    optimizer = make_bisenet_optimizer(max_iter=100)
    state, _ = create_bisenet_train_state(jax.random.PRNGKey(0), crop=64)
    step = make_bisenet_train_step(optimizer, mesh=mesh)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randn(n, 64, 64, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 19, (n, 64, 64)).astype(np.int32))
    state2, metrics = step(state, images, labels)
    assert np.isfinite(float(metrics["loss"]))
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # batch stats updated too (SyncBN path)
    s0 = jax.tree_util.tree_leaves(state.batch_stats)[0]
    s1 = jax.tree_util.tree_leaves(state2.batch_stats)[0]
    assert not np.allclose(np.asarray(s0), np.asarray(s1))
