"""Tensor-parallel parameter sharding for the UNet (GSPMD-style).

The reference has no tensor parallelism (SURVEY.md §2.9: TP/PP absent); this
is the beyond-parity scaling path for SDXL-class serving across a v5e slice:
annotate the transformer projections' kernels over the mesh's `model` axis
and let XLA's SPMD partitioner insert the collectives —
  - attention to_q/to_k/to_v and FF in-projections: shard the OUTPUT feature
    dim (head-parallel attention, column-parallel MLP);
  - attention to_out and FF out-projections: shard the INPUT feature dim
    (row-parallel; XLA reduces the partial sums with an all-reduce over ICI);
  - convolutions, norms, embeddings stay replicated (they are a small
    fraction of SDXL's parameters — the 10-deep level-2 transformer stack
    dominates).

Use: shardings = unet_param_shardings(params, mesh);
     params = jax.device_put(params, shardings); jit as usual.
"""
from __future__ import annotations

from typing import Dict

import jax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# kernels sharded on the output feature dim (column parallel)
_COL_PARALLEL = ("to_q", "to_k", "to_v", "to_k_ip", "to_v_ip", "proj")
# kernels sharded on the input feature dim (row parallel)
_ROW_PARALLEL = ("to_out", "out")


def _spec_for(path, leaf) -> P:
    if path[-1] != "kernel" or leaf.ndim != 2:
        return P()
    name = path[-2]
    parent = path[-3] if len(path) >= 3 else ""
    in_transformer = any("attn" in part or part == "ff"
                         for part in path)
    if not in_transformer:
        return P()
    if name in _COL_PARALLEL and (parent.startswith("attn")
                                  or parent == "ff"):
        return P(None, MODEL_AXIS)
    if name in _ROW_PARALLEL and (parent.startswith("attn")
                                  or parent == "ff"):
        return P(MODEL_AXIS, None)
    return P()


def unet_param_shardings(unet_params: Dict, mesh: Mesh) -> Dict:
    """NamedSharding tree for a UNet param tree (others replicated)."""
    flat = traverse_util.flatten_dict(unet_params)
    out = {k: NamedSharding(mesh, _spec_for(k, v)) for k, v in flat.items()}
    return traverse_util.unflatten_dict(out)


def bundle_param_shardings(params: Dict, mesh: Mesh) -> Dict:
    """Shardings for a full pipeline bundle: TP on the UNet, everything else
    replicated."""
    out = {}
    for key, sub in params.items():
        if key == "unet":
            out[key] = unet_param_shardings(sub, mesh)
        else:
            out[key] = jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P()), sub)
    return out


def apply_tensor_parallel(params: Dict, mesh: Mesh) -> Dict:
    """device_put the bundle with TP shardings."""
    return jax.device_put(params, bundle_param_shardings(params, mesh))


# ------------------------------------------------------------ LLaVA / Llama

# Llama decoder TP (Megatron-style): q/k/v + MLP in-projections and the
# lm_head column-parallel (output dim sharded -> head-parallel attention,
# vocab-parallel logits), o_proj/down_proj row-parallel (input dim sharded;
# XLA all-reduces the partial sums over ICI). The KV cache inherits the
# head sharding through propagation from the sharded k/v projections.
_LLAMA_COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
              "lm_head")
_LLAMA_ROW = ("o_proj", "down_proj")


def _llama_spec_for(path, leaf) -> P:
    name = path[-2] if len(path) >= 2 else ""
    kind = path[-1]
    if kind in ("kernel", "kernel_q") and leaf.ndim == 2:
        if name in _LLAMA_COL:
            return P(None, MODEL_AXIS)
        if name in _LLAMA_ROW:
            return P(MODEL_AXIS, None)
    if kind == "kernel_scale" and name in _LLAMA_COL:
        # per-out-channel int8 scales follow the column shard
        return P(MODEL_AXIS)
    return P()


def llama_param_shardings(llama_params: Dict, mesh: Mesh) -> Dict:
    """NamedSharding tree for a Llama param tree (float or int8 layout);
    embeddings and norms replicated."""
    flat = traverse_util.flatten_dict(llama_params)
    out = {k: NamedSharding(mesh, _llama_spec_for(k, v))
           for k, v in flat.items()}
    return traverse_util.unflatten_dict(out)


def apply_llava_tensor_parallel(params: Dict, mesh: Mesh) -> Dict:
    """device_put LLaVA captioner params ({"mm", "llama"}) with TP on the
    Llama decoder; the vision tower + projector (prefill-only cost) stay
    replicated. The beyond-parity scaling path for 7B captioning past one
    chip's HBM bandwidth (ROUND_NOTES r4: decode is weight-read-bound, so
    N-way TP reads 1/N of the weights per chip per token)."""
    shard = {
        "mm": jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), params["mm"]),
        "llama": llama_param_shardings(params["llama"], mesh),
    }
    return jax.device_put(params, shard)
