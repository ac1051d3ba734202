"""Checkpoint file loading: safetensors (preferred) and torch pickles.

Covers the reference's two load paths (safetensors key-prefix split and
torch.load .bin, pipline_StableDiffusion_ConsistentID.py:125-136) plus HF
sharded-checkpoint index files.
"""
from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


def read_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file
    return load_file(path)


def read_torch_bin(path: str) -> Dict[str, np.ndarray]:
    """torch.load a pickle checkpoint -> numpy dict (possibly nested one
    level, like ConsistentID-v1.bin's three sections)."""
    import torch

    from .convert import torch_state_dict_to_numpy

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if any(isinstance(v, dict) for v in sd.values()):
        return {k: torch_state_dict_to_numpy(v) if isinstance(v, dict) else v
                for k, v in sd.items()}
    return torch_state_dict_to_numpy(sd)


def read_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load one file or an HF sharded checkpoint directory/index."""
    if os.path.isdir(path):
        index = None
        for name in os.listdir(path):
            if name.endswith(".safetensors.index.json"):
                index = os.path.join(path, name)
        if index:
            return read_checkpoint(index)
        merged: Dict[str, np.ndarray] = {}
        for name in sorted(os.listdir(path)):
            if name.endswith(".safetensors"):
                merged.update(read_safetensors(os.path.join(path, name)))
        if merged:
            return merged
        raise FileNotFoundError(f"no checkpoint files in {path}")
    if path.endswith(".index.json"):
        with open(path) as f:
            index = json.load(f)
        root = os.path.dirname(path)
        merged = {}
        for shard in sorted(set(index["weight_map"].values())):
            merged.update(read_safetensors(os.path.join(root, shard)))
        return merged
    if path.endswith(".safetensors"):
        return read_safetensors(path)
    if path.endswith(".onnx"):
        # insightface packs (SCRFD / ArcFace) ship as ONNX graphs
        from .onnx_reader import read_onnx_initializers
        return read_onnx_initializers(path)
    return read_torch_bin(path)
