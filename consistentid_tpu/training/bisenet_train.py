"""BiSeNet face-parsing training on TPU (shard_map DP, SyncBN).

TPU-native rebuild of the reference's standalone parser trainer
(models/BiSeNet/train.py: NCCL DDP + DistributedSampler :47-80, OHEM CE at 3
scales :82-86,128-131; loss.py OhemCELoss; optimizer.py exponential-warmup +
poly SGD). Hyperparameters mirror the reference: batch 16/device, crop 448,
OHEM thresh 0.7 / n_min = B*H*W/16, SGD momentum 0.9, wd 5e-4 on conv/linear
kernels only, 10x LR on the FFM + output heads, lr 1e-2, 80k iters, power
0.9, 1k warmup from 1e-5.

The distributed surface is one shard_map step: pmean gradients over the
`data` axis; BatchNorm uses flax's axis_name sync (the InPlaceABNSync
equivalent — see also ops/fused_bn_act.sync_batch_norm_act).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.bisenet import BiSeNet

IGNORE_LABEL = 255


def ohem_cross_entropy(logits: jax.Array, labels: jax.Array,
                       thresh: float = 0.7,
                       n_min: Optional[int] = None) -> jax.Array:
    """Online hard-example mining CE (reference loss.py OhemCELoss):
    take pixels with loss > -log(thresh); if fewer than n_min, take the
    top-n_min. Static-shape form: top_k(n_min) + thresholded tail mean."""
    b, h, w, c = logits.shape
    n_pix = b * h * w
    if n_min is None:
        n_min = n_pix // 16
    flat_logits = logits.reshape(n_pix, c).astype(jnp.float32)
    flat_labels = labels.reshape(n_pix)
    valid = flat_labels != IGNORE_LABEL
    safe_labels = jnp.where(valid, flat_labels, 0)
    ce = -jax.nn.log_softmax(flat_logits)[jnp.arange(n_pix), safe_labels]
    ce = jnp.where(valid, ce, 0.0)

    thresh_val = -jnp.log(jnp.float32(thresh))
    sorted_ce = jax.lax.top_k(ce, n_pix)[0]
    # reference: if the n_min-th largest loss still exceeds the threshold,
    # average every loss above it; otherwise average the top n_min
    above = sorted_ce > thresh_val
    use_thresh = sorted_ce[n_min] > thresh_val
    thresh_mean = jnp.sum(jnp.where(above, sorted_ce, 0.0)) / jnp.maximum(
        jnp.sum(above), 1)
    topk_mean = jnp.mean(sorted_ce[:n_min])
    return jnp.where(use_thresh, thresh_mean, topk_mean)


def warmup_poly_schedule(lr0: float = 1e-2, warmup_steps: int = 1000,
                         warmup_start_lr: float = 1e-5,
                         max_iter: int = 80000, power: float = 0.9):
    """Exponential warmup then polynomial decay (reference optimizer.py)."""
    factor = (lr0 / warmup_start_lr) ** (1.0 / warmup_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start_lr * factor ** step
        poly = lr0 * (1.0 - (step - warmup_steps) /
                      (max_iter - warmup_steps)) ** power
        return jnp.where(step <= warmup_steps, warm, jnp.maximum(poly, 0.0))

    return schedule


def _param_group(path: Tuple[str, ...]) -> str:
    """wd on conv/dense kernels; none on biases/norm params; 10x lr for the
    fusion module + output heads (reference model.py get_params :262-272)."""
    lr_mul = path[0] in ("ffm", "conv_out", "conv_out16", "conv_out32")
    wd = path[-1] == "kernel"
    return f"{'mul' if lr_mul else 'base'}_{'wd' if wd else 'nowd'}"


def make_bisenet_optimizer(lr0: float = 1e-2, momentum: float = 0.9,
                           weight_decay: float = 5e-4, lr_mul: float = 10.0,
                           **sched_kw) -> optax.GradientTransformation:
    def sgd(scale: float, wd: float):
        return optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(warmup_poly_schedule(lr0=lr0 * scale, **sched_kw),
                      momentum=momentum),
        )

    transforms = {
        "base_wd": sgd(1.0, weight_decay),
        "base_nowd": sgd(1.0, 0.0),
        "mul_wd": sgd(lr_mul, weight_decay),
        "mul_nowd": sgd(lr_mul, 0.0),
    }

    def label_fn(params):
        flat = traverse_util.flatten_dict(params)
        return traverse_util.unflatten_dict(
            {k: _param_group(k) for k in flat})

    return optax.multi_transform(transforms, label_fn)


class BiSeNetTrainState(NamedTuple):
    params: Dict
    batch_stats: Dict
    opt_state: Any
    step: jax.Array


def create_bisenet_train_state(rng: jax.Array, crop: int = 448,
                               n_classes: int = 19,
                               optimizer=None) -> Tuple[BiSeNetTrainState,
                                                        optax.GradientTransformation]:
    model = BiSeNet(n_classes=n_classes, train=True)
    variables = model.init(rng, jnp.zeros((1, crop, crop, 3)))
    optimizer = optimizer or make_bisenet_optimizer()
    return BiSeNetTrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
        step=jnp.zeros((), jnp.int32)), optimizer


def make_bisenet_train_step(optimizer, mesh: Optional[Mesh] = None,
                            n_classes: int = 19, data_axis: str = "data",
                            ohem_thresh: float = 0.7):
    axis_name = data_axis if mesh is not None else None
    model = BiSeNet(n_classes=n_classes, train=True, axis_name=axis_name)

    def step_fn(state: BiSeNetTrainState, images, labels):
        def loss_fn(params):
            (out, out16, out32), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, mutable=["batch_stats"])
            loss = (ohem_cross_entropy(out, labels, ohem_thresh)
                    + ohem_cross_entropy(out16, labels, ohem_thresh)
                    + ohem_cross_entropy(out32, labels, ohem_thresh))
            return loss, mutated["batch_stats"]

        (loss, batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if mesh is not None:
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return BiSeNetTrainState(params, batch_stats, opt_state,
                                 state.step + 1), {"loss": loss}

    if mesh is None:
        return jax.jit(step_fn)
    spec = BiSeNetTrainState(P(), P(), P(), P())
    return jax.jit(shard_map(
        step_fn, mesh=mesh,
        in_specs=(spec, P(data_axis), P(data_axis)),
        out_specs=(spec, P()),
        check_vma=False))


class FaceMaskDataset:
    """CelebAMask-HQ-style (image dir + gray label dir) training data with
    the reference's augmentations (face_dataset.py/transform.py): random
    horizontal flip, random scale {0.75,1,1.25,1.5,1.75,2}, random crop."""

    SCALES = (0.75, 1.0, 1.25, 1.5, 1.75, 2.0)

    def __init__(self, image_root: str, label_root: str, crop: int = 448,
                 seed: int = 0):
        import os
        self.image_root = image_root
        self.label_root = label_root
        self.crop = crop
        self.names = sorted(
            os.path.splitext(f)[0] for f in os.listdir(image_root))
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.names)

    def __getitem__(self, i: int):
        import os

        from PIL import Image

        from ..utils.image import IMAGENET_MEAN, IMAGENET_STD

        name = self.names[i]
        img = Image.open(os.path.join(
            self.image_root, name + ".jpg")).convert("RGB")
        lab = Image.open(os.path.join(self.label_root, name + ".png"))
        img = img.resize((512, 512), Image.BILINEAR)
        lab = lab.resize((512, 512), Image.NEAREST)
        if self.rng.rand() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
            lab = lab.transpose(Image.FLIP_LEFT_RIGHT)
        scale = self.SCALES[self.rng.randint(len(self.SCALES))]
        w = h = int(512 * scale)
        img = img.resize((w, h), Image.BILINEAR)
        lab = lab.resize((w, h), Image.NEAREST)
        if w < self.crop:   # pad up
            pad = self.crop - w
            img = Image.fromarray(np.pad(
                np.asarray(img), ((0, pad), (0, pad), (0, 0))))
            lab = Image.fromarray(np.pad(
                np.asarray(lab), ((0, pad), (0, pad)),
                constant_values=IGNORE_LABEL))
            w = h = self.crop
        x0 = self.rng.randint(w - self.crop + 1)
        y0 = self.rng.randint(h - self.crop + 1)
        img = np.asarray(img, np.float32)[y0:y0 + self.crop,
                                          x0:x0 + self.crop] / 255.0
        lab = np.asarray(lab)[y0:y0 + self.crop, x0:x0 + self.crop]
        img = (img - IMAGENET_MEAN) / IMAGENET_STD
        return img.astype(np.float32), lab.astype(np.int32)

    def batches(self, batch_size: int, epochs: int = 1):
        order = list(range(len(self)))
        for _ in range(epochs):
            self.rng.shuffle(order)
            for s in range(0, len(order) - batch_size + 1, batch_size):
                items = [self[j] for j in order[s:s + batch_size]]
                yield (np.stack([x for x, _ in items]),
                       np.stack([y for _, y in items]))
