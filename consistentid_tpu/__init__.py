"""ConsistentID-TPU: a TPU-native (JAX/XLA/Pallas) framework for fine-grained
identity-preserving portrait generation, with the capabilities of
JackAILab/ConsistentID (reference layout documented in SURVEY.md).

Top-level namespaces:
  core          config dataclasses, dtype policy, PRNG discipline
  ops           Pallas kernels + XLA compute ops (attention, norms)
  models        SD UNet / VAE / CLIP text+vision / BiSeNet / ArcFace in flax
  adapter       ConsistentID adapter (ProjPlus, FacialEncoder, IP attention)
  conditioning  host-side caption markers, tokenization masks, region masks
  sampling      schedulers + lax.scan denoise loop
  pipelines     t2i / inpaint / controlnet / sdxl pipelines
  training      losses, shard_map data-parallel train step, dataset
  parallel      mesh + sharding helpers
  io            checkpointing (orbax) + torch/reference weight converters
"""

__version__ = "0.1.0"
