"""CLI: ConsistentID adapter training (reference train.py + train_bash.sh).

    python -m consistentid_tpu.apps.train \
        --base /path/sd15 --image-encoder /path/vit-h.safetensors \
        --manifest JSON_all.json --data-root /data/fgid \
        --output-dir runs/consistentid

One shard_map data-parallel step over all local devices replaces the
accelerate --multi_gpu launcher; resume is automatic from the latest orbax
checkpoint in --output-dir.
"""
from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", default=None,
                   help="diffusers SD1.5 dir (required unless --tiny)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random-weight bundle (tests/smoke): skips "
                        "--base weight loading and shrinks every tower")
    p.add_argument("--image-encoder", default=None)
    p.add_argument("--manifest", required=True,
                   help="FGID JSON_all.json — or, with --encoded, the "
                        "encoded_manifest.json written by apps.precompute")
    p.add_argument("--encoded", action="store_true",
                   help="train from precomputed frozen-encoder outputs "
                        "(apps.precompute): skips the per-step VAE/ViT-H/"
                        "CLIP-text forwards — measured ~28%% of the 512px "
                        "batch-8 device step — with bitwise-identical "
                        "losses")
    p.add_argument("--data-root", default="")
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--output-dir", default="runs/consistentid")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--batch-per-device", type=int, default=2)
    p.add_argument("--grad-accum-steps", type=int, default=1)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=1e-2)
    p.add_argument("--facial-weight", type=float, default=0.01)
    p.add_argument("--mask-loss-prob", type=float, default=0.5)
    p.add_argument("--localization-layers", type=int, default=5)
    p.add_argument("--lora-rank", type=int, default=128)
    p.add_argument("--num-tokens", type=int, default=4)
    p.add_argument("--max-steps", type=int, default=100000)
    p.add_argument("--save-steps", type=int, default=1000)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mu-dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="AdamW first-moment storage dtype (bfloat16 halves "
                        "that optimizer-moment HBM stream; second moments "
                        "stay fp32)")
    p.add_argument("--profile-dir", default=None)
    p.add_argument("--remat", choices=["full", "dots", "none"],
                   default="none",
                   help="UNet rematerialization under autodiff. v5e A/B at "
                        "the reference 512px/batch-2 config, dispatch "
                        "latency amortized: none 0.189 s/step, full 0.206 "
                        "— default off (fits HBM); turn on for configs "
                        "that OOM at ~8%% step-time cost")
    p.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16",
                   help="compute dtype (params stay fp32 masters; bf16 "
                        "matches the reference's mixed_precision=bf16)")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="optimizer steps per device dispatch "
                        "(make_multi_train_step lax.scan over stacked "
                        "batches). >1 amortizes host dispatch latency — "
                        "essential on remote/tunneled TPUs where each "
                        "dispatch costs ~0.2 s (see ROUND_NOTES)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np

    from ..core.cache import enable_compilation_cache
    from ..core.config import (AdapterConfig, SchedulerConfig, TrainConfig,
                               sd15_unet_config)

    enable_compilation_cache()
    from ..io.checkpoint import CheckpointManager
    from ..io.convert_backbones import (clip_text_from_hf,
                                        clip_vision_from_hf,
                                        unet_from_diffusers,
                                        vae_from_diffusers)
    from ..io.safetensors_reader import read_checkpoint
    from ..parallel import initialize_multihost, make_mesh, shard_batch
    from ..pipelines import SD15Bundle
    from ..sampling import NoiseSchedule
    from ..training import (FGIDDataset, create_train_state, make_train_step,
                            warm_start_ip_projections)
    from ..utils.profiling import MetricsLogger, StepTimer

    initialize_multihost()
    mesh = make_mesh()
    n_devices = mesh.devices.size

    config = TrainConfig(
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        batch_per_device=args.batch_per_device,
        grad_accum_steps=args.grad_accum_steps,
        facial_weight=args.facial_weight,
        mask_loss_prob=args.mask_loss_prob,
        localization_layers=args.localization_layers,
        resolution=args.resolution, max_steps=args.max_steps,
        save_steps=args.save_steps, seed=args.seed,
        remat_unet=args.remat != "none",
        remat_policy="dots" if args.remat == "dots" else "full",
        mu_dtype=args.mu_dtype)

    if args.tiny:
        import dataclasses as _dc

        from ..testing import tiny_bundle
        bundle = _dc.replace(
            tiny_bundle(),
            dtype=jax.numpy.bfloat16 if args.dtype == "bf16"
            else jax.numpy.float32,
            remat=config.remat_unet, remat_policy=config.remat_policy)
        params = bundle.init_params(jax.random.PRNGKey(config.seed))
        params["unet"] = warm_start_ip_projections(params["unet"])
    else:
        assert args.base, "--base is required unless --tiny"
        bundle = SD15Bundle(
            unet_config=sd15_unet_config(lora_rank=args.lora_rank,
                                         ip_num_tokens=args.num_tokens),
            adapter_config=AdapterConfig(lora_rank=args.lora_rank,
                                         num_id_tokens=args.num_tokens),
            dtype=jax.numpy.bfloat16 if args.dtype == "bf16"
            else jax.numpy.float32,
            remat=config.remat_unet, remat_policy=config.remat_policy)
        params = bundle.init_params(jax.random.PRNGKey(config.seed))
        import os
        params["unet"].update(unet_from_diffusers(
            read_checkpoint(os.path.join(args.base, "unet")),
            bundle.unet_config))
        params["unet"] = warm_start_ip_projections(params["unet"])
        params["vae"] = vae_from_diffusers(
            read_checkpoint(os.path.join(args.base, "vae")),
            bundle.vae_config)
        params["text_encoder"] = clip_text_from_hf(
            read_checkpoint(os.path.join(args.base, "text_encoder")),
            bundle.text_config)
        if args.image_encoder:
            params["image_encoder"] = clip_vision_from_hf(
                read_checkpoint(args.image_encoder), bundle.vision_config)

    if args.tokenizer:
        from transformers import CLIPTokenizer
        tokenizer = CLIPTokenizer.from_pretrained(args.tokenizer)
        tokenizer.add_tokens(["<|image|>", "<|facial|>"])
    else:
        from ..conditioning import SimpleTokenizer
        tokenizer = SimpleTokenizer()

    schedule = NoiseSchedule.create(SchedulerConfig())
    state = create_train_state(params, config)
    ckpt = CheckpointManager(args.output_dir)
    state = ckpt.restore(state)
    spc = max(1, args.steps_per_call)
    loss_kw = {}
    if args.encoded:
        from ..training import consistentid_loss_encoded
        loss_kw["loss_fn_impl"] = consistentid_loss_encoded
    if spc > 1:
        from ..training import make_multi_train_step
        step_fn = make_multi_train_step(bundle, schedule, config, spc,
                                        mesh=mesh, donate=True, **loss_kw)
    else:
        step_fn = make_train_step(bundle, schedule, config, mesh=mesh,
                                  donate=True, **loss_kw)

    if args.encoded:
        from ..training import EncodedFGIDDataset
        dataset = EncodedFGIDDataset(args.manifest, seed=config.seed)
    else:
        dataset = FGIDDataset(
            args.manifest, tokenizer, size=args.resolution,
            image_root=args.data_root, seed=config.seed,
            clip_size=bundle.vision_config.image_size,
            id_dim=bundle.adapter_config.id_embeddings_dim)
    logger = MetricsLogger(args.output_dir)
    timer = StepTimer()
    rng = jax.random.PRNGKey(config.seed)
    global_batch = (n_devices * config.batch_per_device
                    * config.grad_accum_steps)

    step = int(state.step)
    profiling = profile_done = False
    pending = []  # host batches awaiting one multi-step dispatch
    for batch in dataset.batches(global_batch, epochs=args.epochs):
        if step >= config.max_steps:
            break
        if args.profile_dir and step >= 2 and not profiling \
                and not profile_done:
            # skip compile steps, then capture a ~8-step device trace
            jax.profiler.start_trace(args.profile_dir)
            profiling = True
        if profiling and step >= 10:
            jax.profiler.stop_trace()
            profiling, profile_done = False, True
        if config.grad_accum_steps > 1:
            # (accum, n_devices * batch_per_device, ...): the per-example
            # dim (1) is sharded over the mesh, the accum dim is scanned
            batch = {k: v.reshape(config.grad_accum_steps, -1, *v.shape[1:])
                     for k, v in batch.items()}
        if spc > 1:
            # stack spc loader batches into one scan dispatch; the leading
            # steps dim is replicated, the per-example dim stays sharded
            pending.append(batch)
            if len(pending) < spc:
                continue
            batch = {k: np.stack([b[k] for b in pending])
                     for k in pending[0]}
            pending = []
            batch = shard_batch(
                mesh, batch,
                batch_dim=2 if config.grad_accum_steps > 1 else 1)
        else:
            batch = shard_batch(
                mesh, batch,
                batch_dim=1 if config.grad_accum_steps > 1 else 0)
        timer.data_loaded()
        state, metrics = step_fn(state, batch,
                                 jax.random.fold_in(rng, step))
        # fetch (not just block): the only reliable execution barrier
        # through remote-TPU tunnels — see ROUND_NOTES
        last_loss = float(jax.tree_util.tree_leaves(metrics["loss"])[0]
                          .reshape(-1)[-1])
        timer.step_done()
        prev = step
        step = int(state.step)
        if step % 10 < step - prev or step % 10 == 0:
            scalar = {k: float(np.asarray(v).reshape(-1)[-1])
                      for k, v in metrics.items()}
            logger.log(step, {**scalar, **timer.summary()})
        if step // config.save_steps > prev // config.save_steps:
            ckpt.save(state)

    # flush batches still pending a multi-step dispatch (dataset/epoch end
    # or the max_steps break left fewer than steps-per-call): run them
    # through a single-step fallback so trailing data always trains
    if pending and step < config.max_steps:
        single_step = make_train_step(bundle, schedule, config, mesh=mesh,
                                      donate=True, **loss_kw)
        for b in pending:
            if step >= config.max_steps:
                break
            b = shard_batch(mesh, b,
                            batch_dim=1 if config.grad_accum_steps > 1
                            else 0)
            state, metrics = single_step(state, b,
                                         jax.random.fold_in(rng, step))
            last_loss = float(
                jax.tree_util.tree_leaves(metrics["loss"])[0]
                .reshape(-1)[-1])
            step = int(state.step)
        logger.log(step, {"loss": last_loss, "flushed_pending": len(pending)})
    ckpt.save(state)
    logger.close()


if __name__ == "__main__":
    main()
