"""SHA256 of the StableHLO for the default (exact bf16) generate graph.

Evidence tool for trace-invariance claims: the opt-in accelerators
(DeepCache cache_interval, int8 W8A8 quant) must leave the default
compiled graph byte-identical. Run this at two commits (worktree for the
old one) and compare digests — identical digests prove the default path's
HLO is unchanged, so any wall-clock delta is box/tunnel state, not code.

Usage:  JAX_PLATFORMS=cpu python scripts/hlo_digest.py
"""
import hashlib
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

import jax  # noqa: E402

# the env var alone is not enough in sessions that preset/preimport the
# axon plugin (see .claude/skills/verify "Gotchas")
jax.config.update("jax_platforms", "cpu")


def main():
    from consistentid_tpu.conditioning import SimpleTokenizer
    from consistentid_tpu.pipelines import ConsistentIDPipeline
    from consistentid_tpu.testing import tiny_bundle

    from consistentid_tpu.core import PipelineConfig

    bundle = tiny_bundle()
    params = bundle.init_params(jax.random.PRNGKey(0))
    pipe = ConsistentIDPipeline(
        bundle, params, SimpleTokenizer(),
        pipeline_config=PipelineConfig(height=32, width=32,
                                       num_inference_steps=4,
                                       start_merge_step=1))
    face = Image.fromarray(
        np.full((64, 64, 3), 128, np.uint8))
    labels = np.zeros((64, 64), np.uint8)
    labels[16:48, 16:48] = 1
    labels[20:28, 20:30] = 4
    labels[34:42, 26:40] = 10
    pipe.generate("a person", face, num_inference_steps=4, seed=0,
                  parsing_labels=labels,
                  faceid_embeds=np.zeros((1, 16), np.float32))
    lowered = pipe._core_jit.lower(*pipe._last_core_args)
    text = lowered.as_text()
    # strip mlir location metadata (line numbers shift between commits)
    lines = [ln for ln in text.splitlines() if not ln.strip().startswith("#loc")]
    import re
    body = "\n".join(re.sub(r"loc\(.*?\)", "", ln) for ln in lines)
    digest = hashlib.sha256(body.encode()).hexdigest()
    print(f"stablehlo_sha256={digest} lines={len(lines)}")


if __name__ == "__main__":
    main()
