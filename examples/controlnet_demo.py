"""ConsistentID ControlNet-inpainting example
(mirrors reference demo/controlnet_demo.py:50-99).

Inpaints the masked region under a ControlNet spatial condition (e.g. a
pose/edge map) while preserving the reference identity. Runs end-to-end
with NO downloads at tiny config (synthesized checkpoints + a
random-initialized ControlNet — its zero-init output convs make it an
exact no-op until trained/loaded, see tests/test_inpaint.py). With a real
ControlNet checkpoint, convert via io.convert.controlnet_from_diffusers
and pass --controlnet.

    python examples/controlnet_demo.py                  # tiny, synthesized
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prompt",
                   default="photo of a person, cinematic lighting")
    p.add_argument("--negative-prompt", default="blurry, deformed")
    p.add_argument("--controlnet-scale", type=float, default=0.8)
    p.add_argument("--guess-mode", action="store_true",
                   help="condition the text branch only (reference "
                        "StableDIffusionControlNetInpaint :389-392)")
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--out", default="controlnet_out.png")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from consistentid_tpu.apps.validate import synthesize
    from consistentid_tpu.conditioning import SimpleTokenizer
    from consistentid_tpu.core import PipelineConfig
    from consistentid_tpu.models.controlnet import ControlNet
    from consistentid_tpu.pipelines import (
        ConsistentIDControlNetInpaintPipeline, ConsistentIDInpaintPipeline)
    from consistentid_tpu.pipelines.loading import load_sd15_consistentid
    from consistentid_tpu.testing import tiny_bundle

    outdir = tempfile.mkdtemp(prefix="consistentid_synth_")
    print(f"synthesizing tiny reference-layout checkpoints -> {outdir}")
    paths = synthesize(outdir)

    bundle = tiny_bundle()
    steps = args.steps
    cfg = PipelineConfig(height=64, width=64, num_inference_steps=steps,
                         start_merge_step=max(1, steps * 3 // 5))
    # the loader assembles everything except params['controlnet']
    # (pipelines/loading.py rejects the controlnet class for that reason);
    # load the base stack as plain inpaint, then rewrap with the ControlNet
    base = load_sd15_consistentid(
        paths["base"], consistentid_path=paths["consistentid"],
        image_encoder_path=paths["image_encoder"], bundle=bundle,
        tokenizer=SimpleTokenizer(),
        pipeline_cls=ConsistentIDInpaintPipeline, pipeline_config=cfg)

    sf = bundle.vae_scale_factor
    cn = ControlNet(bundle.unet_config, cond_embed_channels=(16, 32))
    ctx_len = (bundle.text_config.max_position_embeddings
               + bundle.adapter_config.num_id_tokens)
    params = dict(base.params)
    params["controlnet"] = cn.init(
        jax.random.PRNGKey(1),
        jnp.zeros((2, 64 // sf, 64 // sf,
                   bundle.vae_config.latent_channels)),
        jnp.zeros((2,)),
        jnp.zeros((2, ctx_len, bundle.unet_config.cross_attention_dim)),
        jnp.zeros((2, 64, 64, 3)))["params"]
    pipe = ConsistentIDControlNetInpaintPipeline(
        bundle, params, SimpleTokenizer(), pipeline_config=cfg,
        controlnet=cn, controlnet_scale=args.controlnet_scale,
        guess_mode=args.guess_mode)

    rng = np.random.RandomState(0)
    face = Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8))
    init = Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8))
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 255
    control = Image.fromarray(
        (np.indices((64, 64)).sum(0) % 16 * 16).astype(np.uint8))
    labels = np.zeros((64, 64), np.uint8)
    labels[10:50, 10:54] = 1
    labels[16:22, 14:26] = 4
    labels[26:32, 28:36] = 10

    img = pipe.generate(
        args.prompt, face, init, Image.fromarray(mask), strength=1.0,
        negative_prompt=args.negative_prompt, seed=2024,
        control_image=control.convert("RGB"), parsing_labels=labels,
        faceid_embeds=np.zeros(
            (1, bundle.adapter_config.id_embeddings_dim), np.float32))
    Image.fromarray(img[0]).save(args.out)
    print(f"wrote {args.out}  shape={img.shape}  std={img.std():.1f}")


if __name__ == "__main__":
    main()
