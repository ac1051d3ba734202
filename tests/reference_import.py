"""Import the *reference* torch modules (read-only, /root/reference) for
golden-parity testing. The reference code is never copied into this repo; it
is imported at test time only, and tests that need it skip cleanly when the
reference checkout is absent.

reference attention.py imports diffusers, which is not installed; we register
a minimal stand-in (LoRALinearLayer per the diffusers definition it relies on,
and is_xformers_available -> False) before importing.
"""
import importlib
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def _install_diffusers_stub():
    if "diffusers" in sys.modules:
        return
    import torch
    import torch.nn as nn

    class LoRALinearLayer(nn.Module):
        # matches diffusers.models.lora.LoRALinearLayer semantics
        def __init__(self, in_features, out_features, rank=4,
                     network_alpha=None, device=None, dtype=None):
            super().__init__()
            self.down = nn.Linear(in_features, rank, bias=False,
                                  device=device, dtype=dtype)
            self.up = nn.Linear(rank, out_features, bias=False,
                                device=device, dtype=dtype)
            self.network_alpha = network_alpha
            self.rank = rank
            nn.init.normal_(self.down.weight, std=1 / rank)
            nn.init.zeros_(self.up.weight)

        def forward(self, hidden_states):
            orig_dtype = hidden_states.dtype
            dtype = self.down.weight.dtype
            down = self.down(hidden_states.to(dtype))
            up = self.up(down)
            if self.network_alpha is not None:
                up = up * (self.network_alpha / self.rank)
            return up.to(orig_dtype)

    diffusers = types.ModuleType("diffusers")
    models = types.ModuleType("diffusers.models")
    lora = types.ModuleType("diffusers.models.lora")
    lora.LoRALinearLayer = LoRALinearLayer
    utils = types.ModuleType("diffusers.utils")
    import_utils = types.ModuleType("diffusers.utils.import_utils")
    import_utils.is_xformers_available = lambda: False
    models.lora = lora
    utils.import_utils = import_utils
    diffusers.models = models
    diffusers.utils = utils
    sys.modules.update({
        "diffusers": diffusers,
        "diffusers.models": models,
        "diffusers.models.lora": lora,
        "diffusers.utils": utils,
        "diffusers.utils.import_utils": import_utils,
    })


def import_reference(module_name: str):
    """Import e.g. 'functions' or 'attention' from the reference checkout."""
    _install_diffusers_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return importlib.import_module(module_name)
