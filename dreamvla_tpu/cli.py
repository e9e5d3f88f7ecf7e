"""Command-line entry points.

Replaces reference `train.py` + `utils/arguments_utils.py` + the torchrun
launch scripts: one process per host (TPU pods auto-bootstrap via
jax.distributed), flag names kept compatible with the reference where they
still apply, plus `--preset` for the canonical script configs.

  python -m dreamvla_tpu.cli train --preset calvin_finetune \
      --calvin_dataset /data/task_ABC_D --save_checkpoint_path ckpts/

  python -m dreamvla_tpu.cli eval_calvin --preset calvin_finetune \
      --resume_from_checkpoint ckpts/ --calvin_dataset ... --calvin_conf_path ...
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax


def _add_model_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--preset", default=None,
                   help="calvin_pretrain|calvin_finetune|libero_finetune|tiny_test")
    p.add_argument("--sequence_length", type=int, default=None)
    p.add_argument("--action_pred_steps", type=int, default=None)
    p.add_argument("--future_steps", type=int, default=None)
    p.add_argument("--window_size", type=int, default=None)
    p.add_argument("--num_resampler_query", type=int, default=None)
    p.add_argument("--num_obs_token_per_image", type=int, default=None)
    p.add_argument("--transformer_layers", type=int, default=None)
    p.add_argument("--hidden_dim", type=int, default=None)
    p.add_argument("--transformer_heads", type=int, default=None)
    p.add_argument("--phase", default=None)
    p.add_argument("--pred_num", type=int, default=None)
    for flag in ("obs_pred", "depth_pred", "dino_feat_pred", "sam_feat_pred",
                 "trajectory_pred", "atten_only_obs", "attn_robot_proprio_state",
                 "atten_goal_state", "use_dit_head", "use_fm", "share_query",
                 "no_pred_gripper_traj", "no_unshuffle", "gripper_width",
                 "use_dpt_head"):
        p.add_argument(f"--{flag}", action="store_true", default=None)
    p.add_argument("--atten_goal", type=int, default=None)
    p.add_argument("--mask_l_obs_ratio", type=float, default=None)
    p.add_argument("--dit_type", default=None)
    p.add_argument("--track_label_patch_size", type=int, default=None)
    for flag in ("use_dinosiglip", "use_gpt2_pretrained", "remat"):
        p.add_argument(f"--{flag}", action="store_true", default=None)
    p.add_argument("--dropout", type=float, default=None)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--compute_dtype", default=None,
                   help="bfloat16|float32 trunk compute dtype")
    p.add_argument("--scan_unroll", type=int, default=None,
                   help="lax.scan unroll factor for the layer-stacked "
                        "fused serving kernels (bit-equal; trades compile "
                        "size for a k-layer DMA/compute overlap window)")
    # reference flags stored by the model ctor but never read in forward
    # (dreamvla_model.py:151, :418) — accepted for script compatibility
    for flag in ("use_depth_query", "use_trajectory_query"):
        p.add_argument(f"--{flag}", action="store_true",
                       help="accepted for reference-script compatibility "
                            "(dead flag in the reference forward)")


def _add_train_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--lr_scheduler", default=None)
    p.add_argument("--warmup_epochs", type=int, default=None)
    p.add_argument("--num_epochs", type=int, default=None)
    p.add_argument("--weight_decay", type=float, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--gradient_accumulation_steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--rgb_pad", type=int, default=None)
    p.add_argument("--gripper_pad", type=int, default=None)
    for flag in ("loss_action", "loss_image", "loss_depth", "loss_dino_feat",
                 "loss_sam_feat", "loss_trajectory", "flow_as_mask",
                 "traj_cons"):
        p.add_argument(f"--{flag}", action="store_true", default=None)
    p.add_argument("--loss_arm_action_ratio", type=float, default=None)
    p.add_argument("--loss_gripper_action_ratio", type=float, default=None)
    for flag in ("loss_image_ratio", "loss_depth_ratio", "loss_traj_ratio",
                 "loss_dino_ratio", "loss_sam_ratio", "grad_clip_norm"):
        p.add_argument(f"--{flag}", type=float, default=None)
    p.add_argument("--save_every_iter", type=int, default=0,
                   help="mid-epoch preemption-safe checkpoint cadence "
                        "(reference exposes but never acts on it)")
    p.add_argument("--log_every", type=int, default=20,
                   help="metric-logging cadence in steps (reference logs "
                        "per-step to tqdm, train_utils.py:725-726)")
    p.add_argument("--start_save_checkpoint", type=int, default=-1,
                   help="first epoch to save checkpoints at (reference "
                        "arguments_utils.py)")
    p.add_argument("--precision", default=None,
                   help="reference precision policy string; 'fp32' maps to "
                        "float32 compute, anything bf16-ish to bfloat16")
    p.add_argument("--bf16_module", default=None,
                   help="accepted for reference-script compatibility; the "
                        "TPU dtype policy is per-module bf16 already")
    # droid/oxe action-normalisation knobs (reference arguments_utils.py)
    p.add_argument("--max_rel_pos", type=float, default=None)
    p.add_argument("--max_rel_orn", type=float, default=None)
    p.add_argument("--magic_scaling_factor_pos", type=float, default=None)
    p.add_argument("--magic_scaling_factor_orn", type=float, default=None)
    for flag in ("attn_implementation", "primary_mode"):
        p.add_argument(f"--{flag}", default=None,
                       help="accepted for reference-script compatibility "
                            "(attention/backbone impl is TPU-native here)")
    for flag in ("data_in_ceph", "offline", "save_checkpoints_to_wandb",
                 "visualize", "residual", "use_aug_data", "dif_ws"):
        p.add_argument(f"--{flag}", action="store_true",
                       help="accepted for reference-script compatibility")
    p.add_argument("--small_size", type=int, default=0,
                   help="accepted for reference-script compatibility")
    p.add_argument("--load_libero_file", default="h5",
                   help="accepted for reference-script compatibility")
    p.add_argument("--patch_size", type=int, default=None)
    p.add_argument("--wandb_entity", default=None)
    p.add_argument("--min_window_size", type=int, default=None)
    p.add_argument("--max_window_size", type=int, default=None)
    p.add_argument("--multi_step_action", type=int, default=1)
    p.add_argument("--pad_length", type=int, default=-1)
    p.add_argument("--future_act_len", type=int, default=-1)
    p.add_argument("--real_eval_max_steps", type=int, default=600)
    p.add_argument("--calvin_input_image_size", type=int, default=None)
    p.add_argument("--image_primary_size", type=int, default=None)
    p.add_argument("--image_wrist_size", type=int, default=None)


def _add_io_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--calvin_dataset", default="")
    p.add_argument("--libero_path", default="")
    p.add_argument("--libero_suite", default="libero_90_converted")
    p.add_argument("--finetune_type", default="calvin",
                   help="calvin|droid|libero_pretrain|libero_finetune|"
                        "oxe|real (reference train.py:98-109)")
    p.add_argument("--root_dir", default="",
                   help="droid/oxe/real per-step dataset root (reference "
                        "arguments_utils.py:167)")
    p.add_argument("--dataset_info", default="droid_success",
                   help="data_info index name for droid (reference "
                        "arguments_utils.py:191)")
    p.add_argument("--real_dataset_names", default=None,
                   help="real-robot dataset name (reference "
                        "arguments_utils.py:279)")
    # pretrain->finetune surgery (reference arguments_utils.py:239-244,
    # used by scripts/CALVIN_ABC_D/DreamVLA/finetune.sh:58-59)
    for flag in ("reset_action_token", "reset_obs_token", "reset_mask_token",
                 "reset_image_decoder", "reset_action_decoder",
                 "reset_resampler"):
        p.add_argument(f"--{flag}", action="store_true")
    p.add_argument("--save_checkpoint_path", default="checkpoints/run")
    p.add_argument("--run_name", default="dreamvla_tpu")
    p.add_argument("--resume_from_checkpoint", default=None,
                   help="checkpoint dir / torch .pt(h) to resume from, or "
                        "'auto': restore the latest checkpoint under "
                        "<save_checkpoint_path>/<run_name> if one exists "
                        "(start fresh otherwise) — makes restart-on-"
                        "preemption loops safe (exceeds reference "
                        "train.py:251-258, which needs an explicit path)")
    p.add_argument("--checkpoint_epoch", type=int, default=None,
                   help="evaluate a specific saved epoch instead of the "
                        "latest (reference eval scripts sweep 26..39)")
    p.add_argument("--finetune_from_pretrained_ckpt", default=None)
    p.add_argument("--vit_checkpoint_path", default=None)
    p.add_argument("--clip_checkpoint_path", default=None)
    p.add_argument("--gpt2_checkpoint_path", default=None,
                   help="HF gpt2-medium state dict for --use_gpt2_pretrained"
                        " trunk initialisation (reference dreamvla_model.py"
                        ":539-542)")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--packed_cache_dir", default=None,
                   help="packed frame-record cache built by `pack_calvin` "
                        "(data/packed_cache.py): train reads windows as "
                        "sequential mmap slices and ships uint8 images for "
                        "on-device decode — removes the per-frame npz "
                        "decode bottleneck (calvin finetune_type only)")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of steady-state train"
                        " steps (epoch 0, steps 10-15) into this directory")
    # scaling regimes beyond data parallelism (TPU-native extensions; the
    # reference is DDP-only). Mutually exclusive; remaining devices form
    # the dp axis (e.g. 8 devices with --fsdp 4 -> 2x4 dp x fsdp mesh).
    p.add_argument("--fsdp", type=int, default=0,
                   help="shard large param matrices N-way over an 'fsdp' "
                        "mesh axis (parallel/fsdp.py)")
    p.add_argument("--pp_stages", type=int, default=0,
                   help="GPipe pipeline-parallel trunk over N stages "
                        "(parallel/pp.py; trunk layers must divide evenly)")
    p.add_argument("--pp_microbatches", type=int, default=4,
                   help="microbatches circulating the pipeline ring "
                        "(local batch must divide evenly)")
    p.add_argument("--sp", type=int, default=0,
                   help="sequence-parallel trunk: token axis sharded N-way "
                        "with exact ring attention (parallel/sp.py)")
    p.add_argument("--report_to_wandb", action="store_true")
    p.add_argument("--wandb_project", default="dreamvla_tpu")
    p.add_argument("--save_checkpoint", action="store_true")
    p.add_argument("--save_checkpoint_seq", type=int, default=1)
    p.add_argument("--delete_previous_checkpoint", action="store_true")
    for flag in ("except_lang", "load_track_labels", "load_dino_features",
                 "load_sam_features", "merge_data", "text_aug", "partial_data",
                 "eval_libero_ensembling", "diverse_inst", "validation",
                 "reset"):
        p.add_argument(f"--{flag}", action="store_true")
    p.add_argument("--track_label_path", default=None)
    p.add_argument("--dino_features_path", default=None)
    p.add_argument("--sam_features_path", default=None)
    p.add_argument("--calvin_conf_path", default=None)
    p.add_argument("--libero_img_size", type=int, default=128)
    p.add_argument("--libero_eval_max_steps", type=int, default=600)
    p.add_argument("--ensembling_temp", type=float, default=0.01)
    p.add_argument("--parallel_envs", type=int, default=1,
                   help="batched rollouts per host (one batched policy step "
                        "drives K simulators; big chunks/s/chip win)")
    p.add_argument("--no_fused_trunk_train", dest="fused_trunk_train",
                   action="store_const", const=False, default=None,
                   help="disable the differentiable fused trunk kernels on "
                        "training applies (ops.gpt2_fused_train); training "
                        "then runs the unfused flash-attention path")
    p.add_argument("--no_fused_decoder_train", dest="fused_decoder_train",
                   action="store_const", const=False, default=None,
                   help="disable the differentiable fused ViT-block kernels "
                        "in the dream decoders (ops.vit_fused_train)")
    p.add_argument("--int8_trunk_inference", action="store_const", const=True,
                   default=None,
                   help="quantize trunk weights to int8 (W8A8 fused kernel; "
                        "2x MXU peak, ~0.8%% action drift measured by "
                        "tools/fused_action_parity.py --int8)")
    p.add_argument("--int8_dit_inference", action="store_const", const=True,
                   default=None,
                   help="quantize DiT action-head weights to int8 (halves "
                        "the DDIM loop's weight reads; biggest at bs-1)")
    p.add_argument("--int8_encoder_inference", action="store_const",
                   const=True, default=None,
                   help="quantize the frozen MAE encoder's block weights "
                        "to int8 (int8 fused encoder kernel)")


def _configs_from_args(args):
    from dreamvla_tpu.config import PRESETS, DreamVLAConfig, TrainConfig

    if args.preset:
        mcfg, tcfg = PRESETS[args.preset]()
    else:
        mcfg, tcfg = DreamVLAConfig(), TrainConfig()
    if (getattr(args, "precision", None)
            and getattr(args, "compute_dtype", None) is None):
        # reference precision strings like 'bf16_and_fp32' (train.py:122-163)
        args.compute_dtype = ("float32" if "fp32" == args.precision
                              else "bfloat16")
    m_overrides = {f.name: getattr(args, f.name)
                   for f in dataclasses.fields(DreamVLAConfig)
                   if getattr(args, f.name, None) is not None}
    t_overrides = {f.name: getattr(args, f.name)
                   for f in dataclasses.fields(TrainConfig)
                   if getattr(args, f.name, None) is not None}
    return (dataclasses.replace(mcfg, **m_overrides),
            dataclasses.replace(tcfg, **t_overrides))


def _load_pretrained_encoders(mcfg, params, args):
    from dreamvla_tpu.utils import torch_import as ti

    if args.vit_checkpoint_path:
        sd = ti.load_torch_state_dict(args.vit_checkpoint_path)
        tree, missing, _ = ti.import_mae_vit(sd, depth=mcfg.vision_depth)
        params["vision_encoder"] = ti.merge_params(
            params["vision_encoder"], tree)
        print(f"loaded MAE encoder ({len(missing)} missing keys)")
    if args.clip_checkpoint_path and mcfg.include_text_encoder:
        sd = ti.load_torch_state_dict(args.clip_checkpoint_path)
        tree, missing, _ = ti.import_clip_text(sd, layers=mcfg.clip_layers)
        params["text_encoder"] = ti.merge_params(params["text_encoder"], tree)
        print(f"loaded CLIP text tower ({len(missing)} missing keys)")
    if getattr(args, "gpt2_checkpoint_path", None):
        sd = ti.load_torch_state_dict(args.gpt2_checkpoint_path)
        tree, missing, _ = ti.import_gpt2_trunk(sd, mcfg.transformer_layers)
        params["transformer_backbone"] = ti.merge_params(
            params["transformer_backbone"], tree)
        print(f"loaded GPT-2 trunk weights ({len(missing)} missing keys)")
    return params


def _replicate_state(state, mesh):
    """Pin the TrainState to a replicated sharding on `mesh`.

    Freshly-initialised arrays are uncommitted and jit auto-replicates
    them, but orbax-RESTORED arrays are committed to one device — without
    this, resuming under the shard_map'ed dp/sp step fails with
    'incompatible devices' (caught by the auto-resume kill/restart test)."""
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def cmd_train(args) -> None:
    from dreamvla_tpu.data.calvin import get_calvin_dataset
    from dreamvla_tpu.data.libero import get_libero_dataset
    from dreamvla_tpu.models.dreamvla import DreamVLA
    from dreamvla_tpu.parallel.mesh import init_multihost, make_mesh
    from dreamvla_tpu.parallel.train_step import (build_train_step,
                                                  create_train_state)
    from dreamvla_tpu.train.checkpoints import (finetune_surgery,
                                                restore_checkpoint,
                                                save_checkpoint)
    from dreamvla_tpu.train.loop import train_one_epoch
    from dreamvla_tpu.utils.logging import MetricLogger
    from dreamvla_tpu.utils import torch_import as ti

    if sum(v > 1 for v in (args.fsdp, args.pp_stages, args.sp)) > 1:
        raise SystemExit("pick at most one of --fsdp / --pp_stages / --sp")
    init_multihost()
    mcfg, tcfg = _configs_from_args(args)
    model = DreamVLA(mcfg)
    rank, world = jax.process_index(), jax.process_count()

    common = dict(batch_size=tcfg.batch_size, window_size=tcfg.window_size,
                  act_step=mcfg.action_pred_steps, pred_num=mcfg.pred_num,
                  rank=rank, world_size=world, seed=tcfg.seed,
                  num_workers=args.workers, gripper_width=mcfg.gripper_width)
    enrich = None
    if args.text_aug:
        import json
        from pathlib import Path

        asset = Path(__file__).resolve().parents[1] / "assets" / "enrich_lang_annotations.json"
        if asset.exists() and asset.stat().st_size > 2:
            with open(asset) as f:
                enrich = json.load(f)
    if args.finetune_type == "calvin":
        calvin_kwargs = dict(
            key="except_lang" if args.except_lang else "lang",
            image_size=mcfg.image_size,  # loader must match the model
            pretrain=(mcfg.phase == "pretrain"),
            partial_data=args.partial_data, enrich_lang=enrich,
            text_aug=args.text_aug, **common)
        if args.packed_cache_dir:
            from dreamvla_tpu.data.packed_cache import get_packed_calvin_dataset

            data = get_packed_calvin_dataset(
                args.calvin_dataset, args.packed_cache_dir, **calvin_kwargs)
        else:
            data = get_calvin_dataset(
                args.calvin_dataset,
                load_track_labels=args.load_track_labels,
                track_label_path=args.track_label_path,
                load_dino_features=args.load_dino_features,
                dino_features_path=args.dino_features_path,
                load_sam_features=args.load_sam_features,
                sam_features_path=args.sam_features_path,
                merge_data=args.merge_data, **calvin_kwargs)
    elif args.finetune_type.startswith("libero"):
        data = get_libero_dataset(
            args.libero_path, args.libero_suite,
            load_track_labels=args.load_track_labels,
            load_dino_features=args.load_dino_features,
            load_sam_features=args.load_sam_features, **common)
    elif args.finetune_type == "droid":
        from dreamvla_tpu.data.droid_oxe import get_droid_dataset

        scaling = {k: v for k, v in (
            ("max_rel_pos", args.max_rel_pos),
            ("max_rel_orn", args.max_rel_orn),
            ("magic_scaling_factor_pos", args.magic_scaling_factor_pos),
            ("magic_scaling_factor_orn", args.magic_scaling_factor_orn),
        ) if v is not None}
        data = get_droid_dataset(args.root_dir, ["droid_success"],
                                 args.dataset_info, **scaling, **common)
    elif args.finetune_type == "oxe":
        from dreamvla_tpu.data.droid_oxe import OXE_DATASET_NAMES, get_oxe_dataset

        data = get_oxe_dataset(args.root_dir, OXE_DATASET_NAMES, **common)
    elif args.finetune_type == "real":
        from dreamvla_tpu.data.droid_oxe import get_real_dataset

        data = get_real_dataset(args.root_dir, [args.real_dataset_names],
                                args.real_dataset_names, **common)
    else:
        raise ValueError(f"unsupported finetune_type {args.finetune_type}")

    steps_per_epoch = data.dataloader.num_batches
    total_steps = steps_per_epoch * tcfg.num_epochs
    sample = next(iter(data.dataloader))
    state, tx, schedule = create_train_state(
        model, tcfg, sample, jax.random.PRNGKey(tcfg.seed), total_steps,
        steps_per_epoch)

    params = dict(state.params)
    params = _load_pretrained_encoders(mcfg, params, args)
    if args.finetune_from_pretrained_ckpt:
        sd = ti.load_torch_state_dict(args.finetune_from_pretrained_ckpt)
        tree, _, _ = ti.import_dreamvla(sd, mcfg)
        params = finetune_surgery(
            tree, params, mcfg.sequence_length,
            reset_action_token=args.reset_action_token,
            reset_obs_token=args.reset_obs_token,
            reset_mask_token=args.reset_mask_token,
            reset_image_decoder=args.reset_image_decoder,
            reset_action_decoder=args.reset_action_decoder,
            reset_resampler=args.reset_resampler,
            share_query=mcfg.share_query)
    state = state.replace(params=params)

    n_local = len(jax.devices())
    if args.pp_stages > 1:
        # restack BEFORE restore so resuming a pp run restores straight
        # into the stage-stacked tree (cross-regime resume: use
        # parallel.pp.unstack_trunk_stages offline)
        from dreamvla_tpu.parallel.pp import stack_trunk_stages
        from dreamvla_tpu.parallel.train_step import TrainState
        from dreamvla_tpu.train.optimizer import build_optimizer

        params_pp = stack_trunk_stages(state.params, args.pp_stages)
        tx = build_optimizer(params_pp, schedule, tcfg.weight_decay,
                             tcfg.grad_clip_norm)
        state = TrainState(step=state.step, params=params_pp,
                           opt_state=tx.init(params_pp))

    resume_epoch = 0
    if args.resume_from_checkpoint == "auto":
        # elastic/preemption-safe: resume this run's latest checkpoint when
        # present (mid-epoch ones included via --save_every_iter), start
        # fresh when not — restore_checkpoint handles the empty-dir case
        auto_dir = f"{args.save_checkpoint_path}/{args.run_name}"
        if os.path.isdir(auto_dir):
            state, resume_epoch = restore_checkpoint(auto_dir, state)
    elif args.resume_from_checkpoint:
        state, resume_epoch = restore_checkpoint(args.resume_from_checkpoint,
                                                 state)

    if args.fsdp > 1:
        from dreamvla_tpu.parallel.fsdp import (build_fsdp_train_step,
                                                make_fsdp_mesh, shard_state)

        mesh = make_fsdp_mesh(max(n_local // args.fsdp, 1), args.fsdp)
        state = shard_state(state, mesh)
        step_fn = build_fsdp_train_step(model, tcfg, tx, mesh)(state)
    elif args.pp_stages > 1:
        from dreamvla_tpu.parallel.pp import (build_pp_train_step,
                                              make_pp_mesh,
                                              pp_state_shardings)

        mesh = make_pp_mesh(max(n_local // args.pp_stages, 1),
                            args.pp_stages)
        state = jax.tree.map(jax.device_put, state,
                             pp_state_shardings(state, mesh))
        step_fn = build_pp_train_step(model, tcfg, tx, mesh,
                                      args.pp_microbatches)(state)
    elif args.sp > 1:
        from dreamvla_tpu.parallel.sp import (build_sp_train_step,
                                              make_sp_mesh)

        mesh = make_sp_mesh(max(n_local // args.sp, 1), args.sp)
        state = _replicate_state(state, mesh)
        step_fn = build_sp_train_step(model, tcfg, tx, mesh)
    else:
        mesh = make_mesh(("dp",))
        state = _replicate_state(state, mesh)
        step_fn = build_train_step(model, tcfg, tx, mesh=mesh)
    logger = MetricLogger(args.report_to_wandb, args.wandb_project,
                          args.run_name) if rank == 0 else None
    val_data = None
    if args.validation and args.finetune_type == "calvin":
        val_data = get_calvin_dataset(args.calvin_dataset, validation=True,
                                      image_size=mcfg.image_size, **common)
    rng = jax.random.PRNGKey(tcfg.seed + rank)
    from dreamvla_tpu.train.loop import install_preemption_handler, preempted

    install_preemption_handler()
    for epoch in range(resume_epoch, tcfg.num_epochs):
        state, _ = train_one_epoch(model, tcfg, state, step_fn, data, epoch,
                                   rng, mesh=mesh, logger=logger,
                                   log_every=args.log_every,
                                   profile_dir=args.profile_dir,
                                   save_every_iter=args.save_every_iter,
                                   ckpt_dir=f"{args.save_checkpoint_path}/"
                                            f"{args.run_name}",
                                   is_saver=rank == 0)
        if preempted():
            # the loop already wrote a mid-epoch checkpoint; stop cleanly
            # (restart with --resume_from_checkpoint auto re-enters here)
            print(f"preempted during epoch {epoch}; checkpoint saved, "
                  "exiting", flush=True)
            return
        if val_data is not None and rank == 0:
            from dreamvla_tpu.eval.offline import evaluate_open_loop

            metrics = evaluate_open_loop(model, state.params, val_data,
                                         num_batches=10)
            if logger is not None:
                logger.log({f"val/{k}": v for k, v in metrics.items()},
                           step=int(jax.device_get(state.step)))
        if (rank == 0 and args.save_checkpoint
                and epoch % args.save_checkpoint_seq == 0
                and epoch >= args.start_save_checkpoint):
            save_checkpoint(f"{args.save_checkpoint_path}/{args.run_name}",
                            epoch, state,
                            delete_previous=args.delete_previous_checkpoint)


def _restore_policy(args):
    from dreamvla_tpu.models.dreamvla import DreamVLA
    from dreamvla_tpu.utils import torch_import as ti
    from dreamvla_tpu.utils.testing import make_synthetic_batch
    from dreamvla_tpu.parallel.train_step import prepare_model_inputs

    mcfg, tcfg = _configs_from_args(args)
    model = DreamVLA(mcfg)
    batch = make_synthetic_batch(mcfg, tcfg, batch=1)
    inputs = prepare_model_inputs(mcfg, batch)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "diffusion": jax.random.PRNGKey(1)},
                           mode="test", train=False, **inputs)
    params = dict(variables["params"])
    params = _load_pretrained_encoders(mcfg, params, args)
    if args.resume_from_checkpoint:
        if args.resume_from_checkpoint.endswith((".pth", ".pt")):
            sd = ti.load_torch_state_dict(args.resume_from_checkpoint)
            tree, missing, unexpected = ti.import_dreamvla(sd, mcfg)
            params = ti.merge_params(params, tree)
            print(f"imported torch checkpoint: {len(missing)} missing, "
                  f"{len(unexpected)} unexpected")
        else:
            from dreamvla_tpu.train.checkpoints import restore_checkpoint
            from dreamvla_tpu.parallel.train_step import TrainState
            import jax.numpy as jnp

            state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                               opt_state=None)
            state, _ = restore_checkpoint(
                args.resume_from_checkpoint, state,
                epoch=getattr(args, "checkpoint_epoch", None))
            params = state.params
    if mcfg.int8_trunk_inference:
        from dreamvla_tpu.ops.gpt2_fused import quantize_trunk_params

        params = quantize_trunk_params(params)
        print("trunk dense weights quantized to int8 "
              "(cfg.int8_trunk_inference)")
    if mcfg.int8_dit_inference and mcfg.use_dit_head:
        from dreamvla_tpu.models.dit import quantize_dit_params

        params["action_model"] = quantize_dit_params(params["action_model"])
        print("DiT action-head weights quantized to int8 "
              "(cfg.int8_dit_inference)")
    if mcfg.int8_encoder_inference and not mcfg.use_dinosiglip:
        from dreamvla_tpu.ops.vit_fused import quantize_encoder_params

        params = quantize_encoder_params(params)
        print("MAE encoder block weights quantized to int8 "
              "(cfg.int8_encoder_inference)")
    from dreamvla_tpu.ops.attention import is_tpu_backend
    from dreamvla_tpu.ops.gpt2_fused import (stack_trunk_params,
                                             supports_fused_trunk)

    k = mcfg.sequence_length
    if (is_tpu_backend() and mcfg.fused_trunk_inference
            and mcfg.trunk_token_reorder and mcfg.total_query_tokens > 0
            and supports_fused_trunk(
                k * mcfg.tokens_per_step, mcfg.hidden_dim,
                mcfg.transformer_heads, k * mcfg.num_a,
                k * (mcfg.num_a + mcfg.total_query_tokens))):
        # serving layout: one scanned fused trunk kernel instead of L
        # unrolled instances — bit-equal (tests/test_gpt2_fused.py),
        # ~L-fold smaller executable and compile time
        params = stack_trunk_params(params)
        print("trunk params layer-stacked for serving "
              "(scanned fused kernel)")
    from dreamvla_tpu.ops.vit_fused import (stack_encoder_params,
                                            supports_fused)

    if (is_tpu_backend() and not mcfg.use_dinosiglip
            and supports_fused(1, 1 + (mcfg.image_size // mcfg.patch_size) ** 2,
                               mcfg.vision_embed_dim, mcfg.vision_heads)):
        params = stack_encoder_params(params)
        print("encoder params layer-stacked for serving "
              "(scanned fused kernel)")
    return model, params, mcfg


def cmd_eval_calvin(args) -> None:
    from dreamvla_tpu.eval.calvin import evaluate_policy
    from dreamvla_tpu.eval.policy import BatchedPolicyWrapper, PolicyWrapper

    model, params, mcfg = _restore_policy(args)
    policy = PolicyWrapper(model, params, env="calvin")
    batched = None
    if args.parallel_envs > 1:
        batched = BatchedPolicyWrapper(model, params,
                                       batch=args.parallel_envs, env="calvin")
    evaluate_policy(policy, args.calvin_dataset, args.calvin_conf_path,
                    diverse_inst=args.diverse_inst, reset=args.reset,
                    parallel_envs=args.parallel_envs, batched_policy=batched)


def cmd_eval_libero(args) -> None:
    from dreamvla_tpu.eval.libero import evaluate_policy
    from dreamvla_tpu.eval.policy import BatchedPolicyWrapper, PolicyWrapper

    model, params, mcfg = _restore_policy(args)
    policy = PolicyWrapper(model, params, env="libero",
                           use_ensembling=args.eval_libero_ensembling,
                           ensembling_temp=args.ensembling_temp,
                           eval_max_steps=args.libero_eval_max_steps,
                           gripper_width=mcfg.gripper_width)
    batched = None
    if args.parallel_envs > 1:
        batched = BatchedPolicyWrapper(
            model, params, batch=args.parallel_envs, env="libero",
            use_ensembling=args.eval_libero_ensembling,
            ensembling_temp=args.ensembling_temp,
            eval_max_steps=args.libero_eval_max_steps,
            gripper_width=mcfg.gripper_width)
    evaluate_policy(policy, args.finetune_type, args.libero_path,
                    img_size=args.libero_img_size,
                    max_steps=args.libero_eval_max_steps,
                    parallel_envs=args.parallel_envs,
                    batched_policy=batched)


# --------------------------------------------------------------- offline
# pipeline subcommands — one per reference doc step
# (docs/CALVIN_ABC-D_RUN.md:19-46, docs/LIBERO_RUN.md:19-33)
def _add_extract_flags(p: argparse.ArgumentParser, tracks: bool = False
                       ) -> None:
    p.add_argument("--data_root", required=True,
                   help="CALVIN root (containing <split>/) or a converted "
                        "per-step tree (--layout tree)")
    p.add_argument("--save_path", required=True)
    p.add_argument("--split", default="training")
    p.add_argument("--image_key", default="rgb_static")
    p.add_argument("--layout", default="calvin", choices=("calvin", "tree"),
                   help="calvin: episode_XXXXXXX.npz files; tree: "
                        "episodes/<id>/steps/<0000>/ jpgs (LIBERO/DROID)")
    p.add_argument("--checkpoint", default=None,
                   help="released torch weights (sam_vit_b / dinov2_vitb14 "
                        "/ scaled_offline.pth); random weights if omitted")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--except_lang", action="store_true")
    p.add_argument("--override_exist_files", action="store_true")
    p.add_argument("--process_index", type=int, default=None,
                   help="work-striping rank (defaults to jax.process_index)")
    p.add_argument("--process_count", type=int, default=None)
    if tracks:
        p.add_argument("--frame_gap", type=int, default=5)
        p.add_argument("--patch_size", type=int, default=8)
        p.add_argument("--tracker", default="cotracker3",
                       choices=("cotracker3", "lk"))


def _striping(args):
    if args.process_index is not None:
        return args.process_index, args.process_count or 1
    return jax.process_index(), jax.process_count()


def cmd_extract_features(args, kind: str) -> None:
    from dreamvla_tpu.extract.pipeline import (DinoFeatureExtractor,
                                               SamFeatureExtractor)

    extractor = (SamFeatureExtractor(args.checkpoint) if kind == "sam"
                 else DinoFeatureExtractor(args.checkpoint))
    pi, pc = _striping(args)
    if args.layout == "calvin":
        from dreamvla_tpu.extract.calvin_walk import extract_calvin_features

        n = extract_calvin_features(
            args.data_root, extractor, args.save_path,
            image_key=args.image_key, split=args.split,
            batch_size=args.batch_size, except_lang=args.except_lang,
            skip_existing=not args.override_exist_files,
            process_index=pi, process_count=pc)
    else:
        from dreamvla_tpu.extract.libero_tree import extract_feature_tree

        key = ("image_primary" if args.image_key == "rgb_static"
               else args.image_key)
        n = extract_feature_tree(
            args.data_root, extractor, feature_name=args.save_path,
            image_key=key, batch_size=args.batch_size,
            skip_existing=not args.override_exist_files,
            process_index=pi, process_count=pc)
    print(f"{kind}: wrote {n} frames")


def _make_track_fn(args, grid: int):
    if args.tracker == "cotracker3":
        from dreamvla_tpu.extract.cotracker3 import CoTracker3GridTracker

        return CoTracker3GridTracker(args.checkpoint,
                                     frame_gap=args.frame_gap)
    from dreamvla_tpu.extract.flow_tracker import lk_grid_track_fn

    return lambda f, g: lk_grid_track_fn(f, g, args.frame_gap)


def cmd_extract_tracks(args) -> None:
    grid = 224 // args.patch_size
    track_fn = _make_track_fn(args, grid)
    pi, pc = _striping(args)
    if args.layout == "calvin":
        from dreamvla_tpu.extract.calvin_walk import extract_calvin_tracks

        n = extract_calvin_tracks(
            args.data_root, track_fn, args.save_path,
            image_key=args.image_key, split=args.split, grid=grid,
            frame_gap=args.frame_gap, except_lang=args.except_lang,
            skip_existing=not args.override_exist_files,
            process_index=pi, process_count=pc)
    else:
        raise SystemExit("tree-layout track extraction: use convert_libero "
                         "then extract with --layout calvin on the episode "
                         "tree (cotrack_extractor_libero.py parity is via "
                         "extract/libero_tree.py)")
    print(f"tracks: wrote {n} frames")


def cmd_merge_features(args) -> None:
    from dreamvla_tpu.extract.pipeline import merge_features_into_episodes

    feature_dirs, key_map = {}, {}
    pairs = (("dino_static", args.dino_path, "rgb_static"),
             ("dino_gripper", args.dino_path, "rgb_gripper"),
             ("sam_static", args.sam_path, "rgb_static"),
             ("sam_gripper", args.sam_path, "rgb_gripper"),
             ("traj_static", args.track_path, "rgb_static"),
             ("traj_gripper", args.track_path, "rgb_gripper"))
    import os

    for npz_key, base, img_key in pairs:
        if base:
            src = os.path.join(base, img_key, args.split)
            feature_dirs[npz_key] = src
            key_map[npz_key] = npz_key
    n = merge_features_into_episodes(
        os.path.join(args.data_root, args.split), feature_dirs,
        os.path.join(args.out_dir, args.split), key_map)
    print(f"merged {n} episodes")


def cmd_rebuild_tracks(args) -> None:
    from dreamvla_tpu.extract.libero_tree import (find_bad_track_files,
                                                  rebuild_track_files)

    bad = (open(args.bad_list).read().split() if args.bad_list
           else find_bad_track_files(args.track_root))
    print(f"found {len(bad)} bad track files")
    if not bad:
        return
    grid = 224 // args.patch_size
    if args.data_root:
        # real repair (reference rebuild_bad_npz.py:107-154): drop the
        # corrupt files and re-track their episodes from source frames
        import os

        from dreamvla_tpu.extract.calvin_walk import extract_calvin_tracks

        for p in bad:
            os.remove(p)
        track_fn = _make_track_fn(args, grid)
        n = extract_calvin_tracks(
            args.data_root, track_fn, args.track_root,
            image_key=args.image_key, split=args.split, grid=grid,
            frame_gap=args.frame_gap, skip_existing=True)
    else:  # no source frames available: zero-fill placeholders
        from dreamvla_tpu.extract.pipeline import CoTrackerExtractor

        tracker = CoTrackerExtractor(grid=grid, frame_gap=args.frame_gap,
                                     track_fn=None)
        n = rebuild_track_files(bad, tracker, grid=grid)
    print(f"rebuilt {n} files")


def cmd_pack_calvin(args) -> None:
    import os

    from dreamvla_tpu.data.packed_cache import build_packed_cache

    index = build_packed_cache(
        os.path.join(args.data_root, args.split), args.out_dir,
        image_size=args.image_size, frames_per_shard=args.frames_per_shard,
        dino_features_path=args.dino_path, sam_features_path=args.sam_path,
        track_label_path=args.track_path, limit_frames=args.limit_frames)
    print(f"packed {index['num_frames']} frames "
          f"({index['record_bytes']} B/record) into "
          f"{len(index['shards'])} shards under {args.out_dir}")


def cmd_convert_libero(args) -> None:
    from dreamvla_tpu.data.convert_libero import convert_suite

    pi, pc = _striping(args)
    name = convert_suite(args.src_dir, args.tgt_dir, args.suite_name,
                         process_index=pi, process_count=pc)
    print(f"converted suite -> {name}")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("dreamvla_tpu")
    sub = parser.add_subparsers(dest="command", required=True)
    for name in ("train", "eval_calvin", "eval_libero"):
        p = sub.add_parser(name)
        _add_model_flags(p)
        _add_train_flags(p)
        _add_io_flags(p)
    for name in ("extract_sam", "extract_dino"):
        _add_extract_flags(sub.add_parser(name))
    _add_extract_flags(sub.add_parser("extract_tracks"), tracks=True)

    p = sub.add_parser("merge_features",
                       help="repack sidecar features/tracks into episode "
                            "npz files (reference merge_sam_dino.py / "
                            "merge_track.py)")
    p.add_argument("--data_root", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--split", default="training")
    p.add_argument("--dino_path", default=None)
    p.add_argument("--sam_path", default=None)
    p.add_argument("--track_path", default=None)

    p = sub.add_parser("rebuild_tracks",
                       help="repair corrupt track npz files (reference "
                            "rebuild_bad_npz.py)")
    p.add_argument("--track_root", required=True,
                   help="track save root (bad files are searched under it)")
    p.add_argument("--bad_list", default=None)
    p.add_argument("--data_root", default=None,
                   help="CALVIN root with source frames: enables real "
                        "re-tracking instead of zero-fill")
    p.add_argument("--image_key", default="rgb_static")
    p.add_argument("--split", default="training")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--tracker", default="cotracker3",
                   choices=("cotracker3", "lk"))
    p.add_argument("--frame_gap", type=int, default=3)
    p.add_argument("--patch_size", type=int, default=8)

    p = sub.add_parser("pack_calvin",
                       help="pack a CALVIN split (+ optional DINO/SAM/"
                            "track sidecars) into mmap-able fixed-stride "
                            "shards (data/packed_cache.py): images pre-"
                            "cropped once, windows become sequential reads"
                            " — the host-side feed for --packed_cache_dir")
    p.add_argument("--data_root", required=True,
                   help="CALVIN dataset root (training/ inside)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--split", default="training")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--frames_per_shard", type=int, default=4096)
    p.add_argument("--dino_path", default=None)
    p.add_argument("--sam_path", default=None)
    p.add_argument("--track_path", default=None)
    p.add_argument("--limit_frames", type=int, default=None)

    p = sub.add_parser("convert_libero",
                       help="LIBERO HDF5 demos -> per-step directory tree "
                            "(reference utils/convert_libero_per_step.py)")
    p.add_argument("--src_dir", required=True)
    p.add_argument("--tgt_dir", required=True)
    p.add_argument("--suite_name", required=True)
    p.add_argument("--process_index", type=int, default=None)
    p.add_argument("--process_count", type=int, default=None)
    return parser


def main(argv=None) -> None:
    from dreamvla_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    {"train": cmd_train, "eval_calvin": cmd_eval_calvin,
     "eval_libero": cmd_eval_libero,
     "extract_sam": lambda a: cmd_extract_features(a, "sam"),
     "extract_dino": lambda a: cmd_extract_features(a, "dino"),
     "extract_tracks": cmd_extract_tracks,
     "merge_features": cmd_merge_features,
     "rebuild_tracks": cmd_rebuild_tracks,
     "pack_calvin": cmd_pack_calvin,
     "convert_libero": cmd_convert_libero}[args.command](args)


if __name__ == "__main__":
    main()
