"""Benchmark: SD1.5 ConsistentID 512px 50-step generation throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the rebuild north-star is <2 s/image (30 images/min/chip) for the
SD1.5 512px 50-step portrait on v5e (BASELINE.md). vs_baseline is
value / 30 (>1 = beating the target). Random weights — throughput depends
only on architecture + shapes, not weight values.
"""
import argparse
import os
import json
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--batch", type=int, default=None,
                   help="batch size. Default resolves per mode: 4 for "
                        "serving throughput (1 for single-image latency), "
                        "2 for --train (the reference's per-GPU batch, "
                        "train_bash.sh:8). An explicit value is always "
                        "honored as-is.")
    p.add_argument("--tokenizer-dir", default=None,
                   help="diffusers tokenizer/ dump (vocab.json+merges.txt) "
                        "to bench with real CLIP BPE ids; default uses a "
                        "synthetic byte-level BPE vocab so the production "
                        "CLIPBPETokenizer path is benched either way")
    p.add_argument("--tiny", action="store_true",
                   help="tiny config smoke mode (CI)")
    p.add_argument("--sdxl", action="store_true",
                   help="SDXL 1024px per-step time (BASELINE's second "
                        "tracked config)")
    p.add_argument("--train", action="store_true",
                   help="full-size SD1.5 adapter training step time/MFU "
                        "(512px, the reference's per-GPU batch 2)")
    p.add_argument("--input", action="store_true",
                   help="training INPUT pipeline throughput: synthetic "
                        "512px JPEG+parsing corpus -> FGIDDataset.batches "
                        "(markers, 5 region crops, segmaps) in ex/s, with "
                        "the headroom vs the measured batch-8 train step "
                        "(13.97 ex/s on one v5e). Host-only — no TPU")
    p.add_argument("--workers", type=int, default=None,
                   help="--input: dataset thread-pool size (default: "
                        "host cores); 0 = single-thread")
    p.add_argument("--caption", action="store_true",
                   help="FGID LLaVA captioner throughput on the chip: "
                        "random bf16 weights at the REAL llava-v1.5-7b "
                        "shape (ViT-L/14-336 tower + Llama-2-7b) generated "
                        "on-device, batched prefill + fixed-length greedy "
                        "decode per FGID prompt. Reports captions/min (two "
                        "prompts per image, data/FGID_caption.py:21-24) "
                        "and decode tok/s. --tiny runs the smoke config; "
                        "--new-tokens sets the decode length")
    p.add_argument("--new-tokens", type=int, default=128,
                   help="--caption decode length per prompt (the reference "
                        "caps at 512, data/FGID_caption.py:57; typical FGID "
                        "captions are ~100-150 tokens). Decode cost scales "
                        "linearly — tok/s is also reported")
    p.add_argument("--kv-quant", action="store_true",
                   help="--caption: int8 KV cache (QuantLayerKV) — halves "
                        "the batch-linear KV read of greedy decode, the "
                        "term that made batch 8 regress vs batch 4 at full "
                        "7B depth")
    p.add_argument("--caption-layers", type=int, default=None,
                   help="--caption: override the Llama decoder depth while "
                        "keeping every per-layer shape at 7B. Full 7B bf16 "
                        "(14.1 GB) is batch-1-bound on a 16 GB v5e (batch 2 "
                        "OOMs on XLA layout-copy temps); half depth (16) "
                        "fits batch 4, and since decode cost is per-layer "
                        "weight-read-bound, its batch scaling measures the "
                        "7B amortization directly")
    p.add_argument("--fgid-mask", action="store_true",
                   help="FGID mask-production throughput (batched BiSeNet "
                        "parse incl. JPEG decode + PNG outputs) vs the "
                        "reference's 1.85 img/s on one RTX 3090 "
                        "(data/FGID_mask.py:146)")
    p.add_argument("--n-images", type=int, default=128,
                   help="--fgid-mask synthetic corpus size")
    p.add_argument("--remat", choices=["full", "dots", "none"],
                   default="none",
                   help="--train UNet rematerialization. v5e 512px, 8 "
                        "steps/dispatch, donated state (r3 A/B): batch 2 "
                        "none=0.188 s/step; batch 4 none=0.356 (remat "
                        "pathological at batch 4: 0.79-0.82 for BOTH "
                        "policies — XLA scheduling artifact, reproduced "
                        "3x); batch 8 none=0.573 (13.97 ex/s, MFU 0.33) "
                        "vs full=0.604. With donation no-remat fits HBM "
                        "through batch 8; remat remains the escape hatch "
                        "for larger configs")
    p.add_argument("--quant", choices=["none", "int8", "int8_static"],
                   default="none",
                   help="int8: W8A8 UNet serving path (ops/quant.py) for "
                        "the SD1.5/SDXL pipeline benches. achieved_tflops/"
                        "mfu stay bf16-equivalent (same counted FLOPs, "
                        "faster wall clock), so mfu>bf16-roofline is "
                        "expected when int8 pays off. Measured r4: +2.6% "
                        "on SD1.5 512px, -35% on SDXL 1024px (the dynamic "
                        "activation-quant prologue is bandwidth-bound and "
                        "scales with activation bytes). int8_static "
                        "removes that prologue via calibrated per-tensor "
                        "activation scales (pipeline.calibrate_int8, run "
                        "on the bench inputs before timing); also applies "
                        "to --caption (Llama decoder weight-read halving)")
    p.add_argument("--act-scales", default=None,
                   help="--quant int8_static: load calibrated activation "
                        "scales from this .npz (io.quant_scales) instead "
                        "of calibrating on the bench input")
    p.add_argument("--cache-interval", type=int, default=1,
                   help="DeepCache-style deep-feature reuse cadence for the "
                        "pipeline benches (1 = off). N>1 runs the full UNet "
                        "every N-th denoise step and only the shallow "
                        "level-0 blocks in between (small quality trade)")
    p.add_argument("--encoded", action="store_true",
                   help="--train: step on PRECOMPUTED frozen-encoder "
                        "outputs (training/precompute.py) — the per-step "
                        "VAE/ViT-H/CLIP-text forwards (~28%% of the 512px "
                        "batch-8 device step, round-5 profile) happen once "
                        "per corpus instead")
    p.add_argument("--mu-dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="--train: AdamW first-moment storage dtype — "
                        "bfloat16 halves one of the two per-param "
                        "optimizer-moment HBM streams (A/B lever for the "
                        "r3 roofline's moment-bandwidth item)")
    p.add_argument("--fused-gn", action="store_true",
                   help="--train: serve the UNet GroupNorms with the "
                        "restructured fused GN+SiLU (ops/group_norm.py) — "
                        "A/B lever for the bandwidth-bound norm share of "
                        "the training step")
    p.add_argument("--steps-per-call", type=int, default=8,
                   help="--train optimizer steps per dispatch "
                        "(make_multi_train_step lax.scan). The 512px "
                        "batch-2 step is ~0.19 s device compute but each "
                        "dispatch costs ~0.2 s through the remote tunnel; "
                        "scanning N steps amortizes it. 1 = the reference's "
                        "one-dispatch-per-step shape")
    args = p.parse_args()

    if args.train:
        if args.batch is None:
            args.batch = 2  # reference per-GPU batch (train_bash.sh:8,
            #                 train_SDXL.sh:14 — both train at 2/GPU)
        return bench_train(args)
    if args.sdxl:
        return bench_sdxl(args)
    if args.caption:
        return bench_caption(args)
    if args.input:
        return bench_input(args)
    if args.fgid_mask:
        return bench_fgid_mask(args)
    if args.batch is None:
        args.batch = 4  # serving default

    import jax
    import jax.numpy as jnp
    import numpy as np

    from consistentid_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from consistentid_tpu.core import (AdapterConfig, PipelineConfig,
                                       sd15_unet_config)
    from consistentid_tpu.pipelines import ConsistentIDPipeline, SD15Bundle

    if args.tiny:
        import dataclasses

        from consistentid_tpu.testing import tiny_bundle
        # int8_static starts from the exact bundle; calibrate_int8 below
        # swaps in the static-quant twin once scales exist
        bundle = dataclasses.replace(
            tiny_bundle(),
            quant=args.quant if args.quant != "int8_static" else "none")
        id_dim = 16
        # smoke mode runs tiny shapes end-to-end: at the default 512px the
        # tiny VAE's small scale factor yields 65k-token self-attention,
        # which no longer fits the flash kernel's full-K/V-in-VMEM layout.
        # Only applied when BOTH dims are left at their defaults; an
        # explicit --height/--width is honored (and may OOM — the flash
        # kernel raises an actionable VMEM-budget error).
        if args.height == p.get_default("height") and \
                args.width == p.get_default("width"):
            args.height = args.width = 64
            args.tiny_downsized = True
    else:
        bundle = SD15Bundle(
            unet_config=sd15_unet_config(lora_rank=128, ip_num_tokens=4),
            adapter_config=AdapterConfig(),
            dtype=jnp.bfloat16,
            quant=args.quant if args.quant != "int8_static" else "none",
        )
        id_dim = 512

    rng = jax.random.PRNGKey(0)
    params = bundle.fast_random_params(rng)
    # bench the production tokenizer path (pipelines/loading.py default):
    # a real vocab when given, else a synthetic universal byte-level vocab
    # through the same CLIPBPETokenizer code
    if args.tokenizer_dir:
        from consistentid_tpu.conditioning import CLIPBPETokenizer
        tok = CLIPBPETokenizer.from_pretrained(args.tokenizer_dir)
    else:
        from consistentid_tpu.testing import synthetic_clip_tokenizer
        tok = synthetic_clip_tokenizer()
    pipe = ConsistentIDPipeline(
        bundle, params, tok,
        pipeline_config=PipelineConfig(
            height=args.height, width=args.width,
            num_inference_steps=args.steps, start_merge_step=30))

    # synthetic face inputs (perception frontend benched separately)
    from PIL import Image
    face = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (512, 512, 3), np.uint8))
    labels = np.zeros((512, 512), np.uint8)
    labels[100:400, 100:400] = 1
    labels[150:200, 150:250] = 4
    labels[150:200, 270:370] = 5
    labels[250:300, 230:290] = 10
    labels[330:370, 200:320] = 12
    faceid = np.random.RandomState(1).randn(1, id_dim).astype(np.float32)

    kw = dict(parsing_labels=labels, faceid_embeds=faceid,
              num_images_per_prompt=args.batch,
              cache_interval=args.cache_interval)
    if args.quant == "int8_static":
        if args.act_scales:
            from consistentid_tpu.io.quant_scales import load_act_scales
            pipe = pipe.with_quant(
                "int8_static", act_scales=load_act_scales(args.act_scales))
        else:
            pipe = pipe.calibrate_int8(
                "portrait photo of a man with a strong face, "
                "blue eyes, a sharp nose and a wide mouth",
                face, parsing_labels=labels, faceid_embeds=faceid)
    # warmup / compile
    img = pipe.generate("portrait photo of a man with a strong face, "
                        "blue eyes, a sharp nose and a wide mouth",
                        face, seed=0, **kw)
    assert np.isfinite(img.astype(np.float32)).all()

    # steady-state serving throughput: submit request i+1 before collecting
    # request i (generate_async double-buffering). Every iteration still
    # pays full host prepare + upload + execute + fetch; they just overlap
    # the way a pipelined server overlaps them.
    prompt = ("portrait photo of a man with a strong face, "
              "blue eyes, a sharp nose and a wide mouth")
    t0 = time.perf_counter()
    pending = None
    for i in range(args.iters):
        nxt = pipe.generate_async(prompt, face, seed=i + 1, **kw)
        if pending is not None:
            pending()
        pending = nxt
    out = pending()
    dt = (time.perf_counter() - t0) / args.iters
    assert np.isfinite(out.astype(np.float32)).all()

    images_per_min = 60.0 * args.batch / dt
    tag = f" {args.quant}" if args.quant != "none" else ""
    if args.cache_interval > 1:
        tag += f" cache{args.cache_interval}"
    rec = {
        "metric": f"SD1.5 {args.height}px {args.steps}-step ConsistentID "
                  f"images/min/chip (batch {args.batch}){tag}",
        "value": round(images_per_min, 3),
        "unit": "images/min",
        "vs_baseline": round(images_per_min / 30.0, 3),
    }
    if args.quant != "none":
        rec["quant"] = args.quant
    if getattr(args, "tiny_downsized", False):
        rec["note"] = "tiny smoke mode downsized to 64px (default dims)"
    # MFU: XLA cost analysis counts the lax.scan body once, so the denoise
    # loop is step_flops * steps on top of the core graph's encode/decode;
    # dt is end-to-end (incl. host prepare/postprocess) so this is the
    # honest whole-pipeline figure, slightly below device-only MFU.
    from consistentid_tpu.utils.profiling import device_peak_tflops, mfu
    ca = pipe.last_cost_analysis() or {}
    step = pipe.step_flops() or 0.0
    flops = float(ca.get("flops", 0.0)) + step * (args.steps - 1)
    if args.cache_interval > 1:
        rec["cache_interval"] = args.cache_interval
        flops = 0.0  # cost analysis counts both cond branches; not comparable
    if flops:
        rec["achieved_tflops"] = round(flops / dt / 1e12, 2)
        m = mfu(flops, dt)
        if m is not None:
            rec["mfu"] = round(m, 4)
            rec["peak_tflops"] = device_peak_tflops()
    rec["device"] = jax.devices()[0].device_kind
    print(json.dumps(rec))


def bench_train(args):
    """Full-size SD1.5 ConsistentID adapter training step on one chip.

    Mirrors the reference's training config (train_bash.sh:2-11: 512px,
    bf16, per-GPU batch 2, 3-term loss with 5 localization layers); here a
    single-chip jitted step (the sharded variant is exercised by
    dryrun_multichip). vs_baseline compares against the reference's ~1 it/s
    scale heuristic — no published number, so the tracked value is s/step
    with MFU attached.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from consistentid_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from consistentid_tpu.core import (AdapterConfig, SchedulerConfig,
                                       TrainConfig, sd15_unet_config)
    from consistentid_tpu.pipelines import SD15Bundle
    from consistentid_tpu.sampling import NoiseSchedule
    from consistentid_tpu.training import (create_train_state,
                                           make_train_step, synthetic_batch,
                                           warm_start_ip_projections)

    batch_size = args.batch  # resolved in main(): explicit value or 2
    loss_kw = {}
    if args.sdxl:
        # SDXL adapter training (reference train_SDXL.sh:8-14: bf16,
        # batch 2/GPU, 1024px, localization_layers=3)
        from consistentid_tpu.core.config import (VAEConfig,
                                                  sdxl_unet_config)
        from consistentid_tpu.pipelines import (SDXLBundle,
                                                sdxl_adapter_config)
        from consistentid_tpu.training import sdxl_consistentid_loss
        height = args.height if args.height != 512 else 1024
        bundle = SDXLBundle(
            unet_config=sdxl_unet_config(lora_rank=128, ip_num_tokens=4),
            adapter_config=sdxl_adapter_config(),
            vae_config=VAEConfig(scaling_factor=0.13025, force_upcast=True),
            dtype=jnp.bfloat16, remat=args.remat != "none",
            remat_policy="dots" if args.remat == "dots" else "full",
            fused_gn=args.fused_gn)
        loss_kw["loss_fn_impl"] = sdxl_consistentid_loss
        config = TrainConfig(mu_dtype=args.mu_dtype, localization_layers=3,
                             remat_unet=args.remat != "none")
    else:
        height = args.height
        bundle = SD15Bundle(
            unet_config=sd15_unet_config(lora_rank=128, ip_num_tokens=4),
            adapter_config=AdapterConfig(),
            dtype=jnp.bfloat16, remat=args.remat != "none",
            remat_policy="dots" if args.remat == "dots" else "full",
            fused_gn=args.fused_gn)
        config = TrainConfig(mu_dtype=args.mu_dtype)
    if args.encoded:
        assert not args.sdxl, "--encoded bench is SD1.5-only for now"
        from consistentid_tpu.training import (consistentid_loss_encoded,
                                               synthetic_encoded_batch)
        loss_kw["loss_fn_impl"] = consistentid_loss_encoded
    params = bundle.fast_random_params(jax.random.PRNGKey(0))
    params["unet"] = warm_start_ip_projections(params["unet"])

    schedule = NoiseSchedule.create(SchedulerConfig())
    state = create_train_state(params, config)
    step = make_train_step(bundle, schedule, config, mesh=None,
                           donate=True, **loss_kw)
    if args.encoded:
        batch = {k: np.asarray(v) for k, v in synthetic_encoded_batch(
            bundle, batch_size=batch_size, latent_hw=height // 8,
            mask_hw=height).items()}
    else:
        batch = {k: np.asarray(v) for k, v in synthetic_batch(
            batch_size=batch_size, size=height, clip_size=224,
            id_dim=512).items()}
    if args.sdxl:
        batch["clean_ids2"] = batch["clean_ids"].copy()
        # original_size + crop + target_size micro-conditioning
        batch["time_ids"] = np.tile(
            np.array([[height, height, 0, 0, height, height]], np.float32),
            (batch_size, 1))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    rng = jax.random.PRNGKey(1)
    spc = max(1, args.steps_per_call)
    if spc > 1:
        from consistentid_tpu.training import make_multi_train_step

        multi = make_multi_train_step(bundle, schedule, config, n_steps=spc,
                                      mesh=None, donate=True, **loss_kw)
        stacked = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (spc, *x.shape)), batch)

        def run(state, key):
            state, metrics = multi(state, stacked, key)
            return state, {"loss": metrics["loss"][-1]}
    else:
        def run(state, key):
            return step(state, batch, key)

    state, metrics = run(state, rng)  # compile
    # fetch, don't just block: through the remote tunnel block_until_ready
    # is not a reliable execution barrier (see ROUND_NOTES), and the rng
    # fold per iter keeps every execution unique (no tunnel memoization)
    assert np.isfinite(float(metrics["loss"])), metrics

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, metrics = run(state, jax.random.fold_in(rng, i))
    final_loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / (args.iters * spc)
    assert np.isfinite(final_loss)

    rec = {
        "metric": f"{'SDXL' if args.sdxl else 'SD1.5'} {height}px adapter "
                  f"train step "
                  f"(batch {batch_size}/chip, remat={args.remat}, "
                  f"{spc} steps/dispatch"
                  + (", fused-gn" if args.fused_gn else "")
                  + (", mu-bf16" if args.mu_dtype == "bfloat16" else "")
                  + (", encoded" if args.encoded else "")
                  + ")",
        "value": round(dt, 4),
        "unit": "s/step",
        "vs_baseline": round(0.5 / max(dt, 1e-9), 3),  # 0.5 s/step heuristic
        "examples_per_sec": round(batch_size / dt, 3),
    }
    from consistentid_tpu.utils.profiling import device_peak_tflops, mfu
    try:
        # `step` is the jitted callable; lower/compile hit its executable
        # cache. Note: remat recompute counts as flops here, so this is
        # hardware utilization of the actual executable, slightly above
        # textbook MFU.
        ca = step.lower(state, batch, rng).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
    except Exception:
        flops = 0.0
    if flops:
        rec["achieved_tflops"] = round(flops / dt / 1e12, 2)
        m = mfu(flops, dt)
        if m is not None:
            rec["mfu"] = round(m, 4)
            rec["peak_tflops"] = device_peak_tflops()
    rec["device"] = jax.devices()[0].device_kind
    print(json.dumps(rec))


def bench_caption(args):
    """FGID caption-stage throughput (VERDICT r3 weak #6): the in-repo
    LLaVA-1.5 captioner (models/llava.py) at the REAL 7B shape on one chip.

    Random bf16 weights are generated ON-DEVICE (no 14 GB tunnel upload;
    throughput depends on shapes, not values), eos is disabled so every row
    decodes exactly --new-tokens, and two decode lengths are timed so
    prefill and per-token decode cost separate cleanly. captions/min counts
    the full FGID protocol — two prompts per image
    (data/FGID_caption.py:21-24) — at the reference's llava_v1 prompt
    lengths (576 image tokens + ~48 text tokens).
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from consistentid_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from consistentid_tpu.core.config import (CLIPVisionConfig, LlamaConfig,
                                              LlavaConfig)
    from consistentid_tpu.models.llava import (make_caption_fn,
                                               random_llava_params)

    if args.tiny:
        cfg = LlavaConfig(
            vision=CLIPVisionConfig(image_size=28, patch_size=14,
                                    hidden_size=24, intermediate_size=48,
                                    num_layers=2, num_heads=2,
                                    hidden_act="quick_gelu"),
            text=LlamaConfig(vocab_size=64, hidden_size=32,
                             intermediate_size=64, num_layers=2,
                             num_heads=4, num_kv_heads=2,
                             max_position_embeddings=2048),
            image_token_id=63)
    else:
        cfg = LlavaConfig()  # llava-v1.5-7b shapes
    if args.caption_layers is not None:
        # same per-layer shapes, shallower stack: decode is weight-read-
        # bound per layer, so batch scaling here measures 7B amortization
        cfg = dataclasses.replace(
            cfg, text=dataclasses.replace(cfg.text,
                                          num_layers=args.caption_layers))
    # batch default 1: 7B bf16 params ≈ 14.1 GB; the KV cache costs
    # 0.39 GB/row at this max_len, so batch is HBM-bound on a 16 GB v5e
    # (batch 2 at full depth OOMs on XLA layout-copy temps — measured).
    # --quant int8 halves param HBM to ~7.1 GB, which is what makes
    # batch > 1 fit at full 7B depth.
    batch = args.batch if args.batch is not None else 1
    # decode activations are one token/row — the dynamic per-token quant is
    # already negligible there, so int8_static maps to the same path
    quant = args.quant in ("int8", "int8_static")

    # params straight on device: eval_shape the init, then fill each leaf
    # by dtype — values don't affect timing, dtype/shape do. int8 kernels
    # get random int8, fp32 quant scales get small positives.
    shapes = jax.eval_shape(
        lambda k: random_llava_params(k, cfg, dtype=jnp.bfloat16,
                                      quant=quant),
        jax.random.PRNGKey(0))
    # flax init leaves all float params fp32 (no param_dtype override in
    # models/llama.py), so dtype alone can't tell kernel_scale leaves from
    # ordinary weights — distinguish by path and store everything that
    # isn't an int8 kernel or a quant scale as bf16, matching what the
    # weight-read-bound decode actually streams in a bf16 serving config.
    path_leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    is_scale = [path and getattr(path[-1], "key", None) == "kernel_scale"
                for path, _ in path_leaves]
    leaves = [s for _, s in path_leaves]

    @jax.jit
    def make_params(key):
        ks = jax.random.split(key, len(leaves))

        def fill(k, s, scale_leaf):
            if s.dtype == jnp.int8:
                return jax.random.randint(k, s.shape, -127, 128,
                                          dtype=jnp.int8)
            if scale_leaf:  # per-channel quant scales stay fp32
                return jnp.abs(jax.random.normal(k, s.shape,
                                                 jnp.float32)) * 1e-3 + 1e-4
            return jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02

        return jax.tree_util.tree_unflatten(
            treedef,
            [fill(k, s, sc) for k, s, sc in zip(ks, leaves, is_scale)])

    params = jax.block_until_ready(make_params(jax.random.PRNGKey(1)))
    n_params = sum(int(np.prod(s.shape)) for s in leaves)

    # llava_v1 FGID prompt lengths: system+\"USER: \" ≈ 41 ids,
    # \"\\n{query} ASSISTANT:\" ≈ 36/31 ids for the two prompts (measured
    # with the HF Llama tokenizer); eos=-1 never fires -> full-length rows
    rs = np.random.RandomState(0)
    vocab = cfg.text.vocab_size
    pre = rs.randint(3, vocab, 41).astype(np.int32)
    post = rs.randint(3, vocab, 36).astype(np.int32)
    size = cfg.vision.image_size

    def pixels(seed):
        r = np.random.RandomState(seed)
        return r.rand(batch, size, size, 3).astype(np.float32) * 2 - 1

    short_n = min(16, args.new_tokens)
    times = {}
    for n_new in (short_n, args.new_tokens):
        fn = make_caption_fn(cfg, max_new_tokens=n_new, eos_token_id=-1,
                             pad_token_id=0, dtype=jnp.bfloat16, quant=quant,
                             kv_quant=args.kv_quant)
        np.asarray(fn(params, pixels(0), pre, post))  # compile + warm
        t0 = time.perf_counter()
        for i in range(args.iters):
            # varied pixels per iter (tunnel memoization guard); the
            # np.asarray fetch is the completion barrier
            np.asarray(fn(params, pixels(1 + i), pre, post))
        times[n_new] = (time.perf_counter() - t0) / args.iters

    t_long = times[args.new_tokens]
    if args.new_tokens > short_n:
        tok_time = (t_long - times[short_n]) / (args.new_tokens - short_n)
        decode_tok_s = batch / tok_time if tok_time > 0 else float("nan")
        prefill_s = max(times[short_n] - short_n * tok_time, 0.0)
    else:
        decode_tok_s = batch * args.new_tokens / t_long
        prefill_s = float("nan")
    captions_min = batch * 60.0 / (2.0 * t_long)

    rec = {
        "metric": f"FGID LLaVA captioner captions/min/chip (batch {batch}, "
                  f"{args.new_tokens} new tokens x 2 prompts"
                  + (", tiny" if args.tiny else
                     f", 7B-layer shapes x{cfg.text.num_layers} layers"
                     if args.caption_layers is not None else ", 7B shapes")
                  + (", int8 decoder" if quant else "")
                  + (", int8 kv" if args.kv_quant else "")
                  + ")",
        "value": round(captions_min, 3),
        "unit": "captions/min",
        "vs_baseline": None,
        "decode_tok_s": round(decode_tok_s, 2),
        "prefill_s": round(prefill_s, 4),
        "t_per_prompt_s": round(t_long, 4),
        "n_params": n_params,
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(rec))


def bench_input(args):
    """Training input pipeline end-to-end on the host: a synthetic corpus
    of 512px JPEGs + parsing PNGs + faceid .bins -> FGIDDataset.batches
    (marker-processed captions, trigger indices, 5 region CLIP crops,
    segmaps, bg mask — the full reference MyDataset surface, utils.py:12-
    181). Reports ex/s and the margin over the measured train step so
    input-boundness is caught before a real run (VERDICT r3 weak #7)."""
    import shutil
    import tempfile

    import numpy as np
    from PIL import Image

    from consistentid_tpu.conditioning import SimpleTokenizer
    from consistentid_tpu.training.dataset import FGIDDataset

    batch = args.batch if args.batch is not None else 8
    workers = args.workers if args.workers is not None else (
        os.cpu_count() or 1)
    n = args.n_images
    tmp = tempfile.mkdtemp(prefix="fgid_input_")
    try:
        img_dir = os.path.join(tmp, "imgs")
        os.makedirs(img_dir)
        rs = np.random.RandomState(0)
        manifest = []
        for i in range(n):
            Image.fromarray(rs.randint(0, 255, (512, 512, 3), np.uint8)
                            ).save(os.path.join(img_dir, f"{i}.jpg"),
                                   quality=92)
            par = np.zeros((512, 512), np.uint8)
            par[100:400, 100:400] = 1     # face
            par[150:200, 150:250] = 4     # eye
            par[250:300, 200:320] = 10    # nose
            par[320:360, 220:300] = 12    # lips
            par[120:180, 90:120] = 7      # ear
            Image.fromarray(par).save(os.path.join(img_dir, f"{i}_m.png"))
            rs.randn(512).astype(np.float32).tofile(
                os.path.join(img_dir, f"{i}.bin"))
            manifest.append({
                "image_path": f"imgs/{i}.jpg",
                "parsing_mask_path": f"imgs/{i}_m.png",
                "faceid_path": f"imgs/{i}.bin",
                "vqa_llva": "a photo of a person with a kind face",
                "vqa_llva_more_face_detail":
                    "This person has a face, a nose, two eyes, two ears "
                    "and a mouth.",
            })
        mpath = os.path.join(tmp, "manifest.json")
        with open(mpath, "w") as f:
            json.dump(manifest, f)

        ds = FGIDDataset(mpath, SimpleTokenizer(), size=512, clip_size=224,
                         image_root=tmp)
        _ = ds[0]  # warm imports/caches

        # GIL-release guardrail (VERDICT r4 next #8): a monitor thread
        # wakes every 1 ms; while a sample loads, its max inter-wakeup gap
        # bounds the longest GIL-held section inside the load. Decode /
        # resize / numpy all release the GIL (gaps stay ~ms); a regression
        # to a GIL-holding stage shows up as a gap the length of that
        # stage. Works on a 1-core host (unlike wall-clock thread-scaling
        # ratios, which degrade to 2x there for BOTH cases).
        import threading
        stall = {"max_gap": 0.0}
        stop = threading.Event()

        def monitor():
            last = time.perf_counter()
            while not stop.is_set():
                time.sleep(0.001)
                now = time.perf_counter()
                stall["max_gap"] = max(stall["max_gap"], now - last)
                last = now

        mon = threading.Thread(target=monitor, daemon=True)
        mon.start()
        time.sleep(0.05)  # settle; baseline gaps are scheduler noise
        for i in range(4):
            _ = ds[i % n]
        stop.set()
        mon.join()
        gil_max_stall_ms = stall["max_gap"] * 1e3

        t0 = time.perf_counter()
        seen = 0
        for b in ds.batches(batch, shuffle=False, epochs=1,
                            workers=workers):
            seen += b["images"].shape[0]
        dt = time.perf_counter() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    ex_s = seen / dt
    train_ex_s = 13.97  # measured batch-8 v5e step (ROUND_NOTES r3)
    # threshold: decode+resize of one 512px JPEG holds the GIL only for
    # its Python glue (~ms); 150 ms means some stage turned GIL-bound
    gil_ok = gil_max_stall_ms < 150.0
    ex_s_per_core = ex_s / max(1, min(workers, os.cpu_count() or 1))
    rec = {
        "metric": f"FGID training input pipeline (512px + 5 region crops, "
                  f"batch {batch}, workers {workers})",
        "value": round(ex_s, 3),
        "unit": "examples/s",
        "vs_baseline": round(ex_s / train_ex_s, 3),
        "n_examples": seen,
        "host_cores": os.cpu_count(),
        "train_step_ex_s": train_ex_s,
        "ex_s_per_core": round(ex_s_per_core, 3),
        "cores_to_parity": int(np.ceil(train_ex_s / max(ex_s_per_core,
                                                        1e-9))),
        "gil_max_stall_ms": round(gil_max_stall_ms, 1),
        "gil_ok": gil_ok,
    }
    print(json.dumps(rec))
    if not gil_ok:
        raise SystemExit(
            f"input pipeline GIL guardrail: max stall "
            f"{gil_max_stall_ms:.0f} ms >= 150 ms — a load stage stopped "
            "releasing the GIL; thread workers will no longer scale")


def bench_fgid_mask(args):
    """FGID mask-production stage end-to-end: JPEG corpus -> batched
    BiSeNet parse on TPU -> resize/mask/color PNGs + JSON stubs, exactly
    the apps/fgid.py mask pipeline. Reference throughput: 100k images /
    15 h = 1.85 img/s on one RTX 3090 (data/FGID_mask.py:146). Random
    weights — parse throughput is weight-independent."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch
    from PIL import Image

    from consistentid_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from consistentid_tpu.apps.fgid import run_mask
    from consistentid_tpu.io import export_backbones as exp
    from consistentid_tpu.models.bisenet import BiSeNet

    batch = args.batch if args.batch is not None else 16
    tmp = tempfile.mkdtemp(prefix="fgid_bench_")
    try:
        img_dir = os.path.join(tmp, "imgs")
        os.makedirs(img_dir)
        rng = np.random.RandomState(0)
        for i in range(args.n_images):
            arr = rng.randint(0, 255, (512, 512, 3), np.uint8)
            Image.fromarray(arr).save(os.path.join(img_dir, f"im{i:05d}.jpg"),
                                      quality=92)

        bn = BiSeNet(n_classes=19, train=True)
        v = bn.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        ckpt = os.path.join(tmp, "face_parsing.pth")
        sd = exp.bisenet_to_torch(v["params"], v["batch_stats"])
        torch.save({k: torch.from_numpy(np.ascontiguousarray(
            np.asarray(x, np.float32))) for k, x in sd.items()}, ckpt)

        out_dir = os.path.join(tmp, "out")
        run_mask(img_dir, out_dir, ckpt, batch_size=batch)  # compile+warm
        shutil.rmtree(out_dir)
        t0 = time.perf_counter()
        run_mask(img_dir, out_dir, ckpt, batch_size=batch)
        dt = time.perf_counter() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    img_per_s = args.n_images / dt
    rec = {
        "metric": f"FGID mask production (BiSeNet parse + outputs, "
                  f"batch {batch})",
        "value": round(img_per_s, 3),
        "unit": "images/s",
        "vs_baseline": round(img_per_s / 1.85, 3),
        "n_images": args.n_images,
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(rec))


def bench_sdxl(args):
    """SDXL 1024px whole-pipeline throughput (images/min/chip) with the same
    double-buffered methodology as the SD1.5 bench (generate_async pipelines
    fetch i against device work i+1), plus the CFG denoise step time
    (two-step-count subtraction isolates the in-scan UNet pair)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from consistentid_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from consistentid_tpu.core import PipelineConfig
    from consistentid_tpu.pipelines import SDXLBundle, sdxl_adapter_config
    from consistentid_tpu.pipelines.consistentid_sdxl import \
        ConsistentIDXLPipeline
    from consistentid_tpu.core.config import sdxl_unet_config
    from consistentid_tpu.core.config import VAEConfig
    from consistentid_tpu.testing import synthetic_clip_tokenizer
    from PIL import Image

    if args.batch is None:
        args.batch = 1  # 1024px SDXL: single-image latency is the config
    bundle = SDXLBundle(
        unet_config=sdxl_unet_config(lora_rank=128, ip_num_tokens=4),
        adapter_config=sdxl_adapter_config(),
        vae_config=VAEConfig(scaling_factor=0.13025, force_upcast=True),
        dtype=jnp.bfloat16,
        quant=args.quant if args.quant != "int8_static" else "none",
    )
    params = bundle.fast_random_params(jax.random.PRNGKey(0))
    steps_a, steps_b = 10, 30
    pipe = ConsistentIDXLPipeline(
        bundle, params, synthetic_clip_tokenizer(),
        tokenizer_2=synthetic_clip_tokenizer(pad_token="!"),
        pipeline_config=PipelineConfig(height=1024, width=1024,
                                       num_inference_steps=args.steps,
                                       guidance_scale=7.5,
                                       start_merge_step=30,
                                       cache_interval=args.cache_interval))
    face = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (512, 512, 3), np.uint8))
    labels = np.zeros((512, 512), np.uint8)
    labels[100:400, 100:400] = 1
    labels[250:300, 230:290] = 10
    kw = dict(parsing_labels=labels,
              faceid_embeds=np.zeros((1, 512), np.float32),
              num_images_per_prompt=args.batch)
    prompt = "portrait photo of a man with a strong face"
    if args.quant == "int8_static":
        if args.act_scales:
            from consistentid_tpu.io.quant_scales import load_act_scales
            pipe = pipe.with_quant(
                "int8_static", act_scales=load_act_scales(args.act_scales))
        else:
            pipe = pipe.calibrate_int8(
                prompt, face, parsing_labels=labels,
                faceid_embeds=np.zeros((1, 512), np.float32))

    # -- whole-pipeline throughput, double-buffered at args.steps --
    out = pipe.generate(prompt, face, seed=0, **kw)  # compile
    assert np.isfinite(out.astype(np.float32)).all()
    t0 = time.perf_counter()
    pending = None
    for i in range(args.iters):
        nxt = pipe.generate_async(prompt, face, seed=i + 1, **kw)
        if pending is not None:
            pending()
        pending = nxt
    final = pending()
    dt = (time.perf_counter() - t0) / args.iters
    assert np.isfinite(final.astype(np.float32)).all()
    images_per_min = 60.0 * args.batch / dt
    # snapshot cost analysis NOW: _last_core_args still points at the
    # args.steps graph the throughput loop measured
    ca = pipe.last_cost_analysis() or {}
    step_flops = pipe.step_flops() or 0.0

    # -- isolated denoise step time (two step counts, varied seeds) --
    def run(n, seed):
        t0 = time.perf_counter()
        pipe.generate(prompt, face, seed=seed, num_inference_steps=n, **kw)
        return time.perf_counter() - t0

    run(steps_a, 0)  # compile both step counts
    run(steps_b, 0)
    ta = min(run(steps_a, i + 1) for i in range(args.iters))
    tb = min(run(steps_b, i + 1) for i in range(args.iters))
    step_time = (tb - ta) / (steps_b - steps_a)

    # no published reference number; north-star heuristic: 2 img/min at
    # 1024px 50 steps on one v5e chip (mirrors BASELINE's SDXL row)
    tag = f" {args.quant}" if args.quant != "none" else ""
    if args.cache_interval > 1:
        tag += f" cache{args.cache_interval}"
    rec = {
        "metric": f"SDXL 1024px {args.steps}-step ConsistentID "
                  f"images/min/chip (batch {args.batch}){tag}",
        "value": round(images_per_min, 3),
        "unit": "images/min",
        "vs_baseline": round(images_per_min / 2.0, 3),
        "step_time_s": round(step_time, 4),
    }
    if args.quant != "none":
        rec["quant"] = args.quant
    if args.cache_interval > 1:
        rec["cache_interval"] = args.cache_interval
    # whole-pipeline MFU like the SD1.5 record: scan body counted once by
    # XLA cost analysis, denoise loop = step_flops * (steps - 1) on top
    from consistentid_tpu.utils.profiling import device_peak_tflops, mfu
    flops = float(ca.get("flops", 0.0)) + step_flops * (args.steps - 1)
    if args.cache_interval > 1:
        flops = step_flops = 0.0  # per-step FLOPs vary under DeepCache
    if flops:
        rec["achieved_tflops"] = round(flops / dt / 1e12, 2)
        m = mfu(flops, dt)
        if m is not None:
            rec["mfu"] = round(m, 4)
            rec["peak_tflops"] = device_peak_tflops()
    if step_flops > 0:
        sm = mfu(step_flops, step_time)
        if sm is not None:
            rec["step_mfu"] = round(sm, 4)
    rec["device"] = jax.devices()[0].device_kind
    print(json.dumps(rec))


if __name__ == "__main__":
    sys.exit(main())
