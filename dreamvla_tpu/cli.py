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

import jax
import numpy as np


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


def _add_io_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--calvin_dataset", default="")
    p.add_argument("--libero_path", default="")
    p.add_argument("--libero_suite", default="libero_90_converted")
    p.add_argument("--finetune_type", default="calvin")
    p.add_argument("--save_checkpoint_path", default="checkpoints/run")
    p.add_argument("--run_name", default="dreamvla_tpu")
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--finetune_from_pretrained_ckpt", default=None)
    p.add_argument("--vit_checkpoint_path", default=None)
    p.add_argument("--clip_checkpoint_path", default=None)
    p.add_argument("--gpt2_checkpoint_path", default=None,
                   help="HF gpt2-medium state dict for --use_gpt2_pretrained"
                        " trunk initialisation (reference dreamvla_model.py"
                        ":539-542)")
    p.add_argument("--workers", type=int, default=8)
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


def _configs_from_args(args):
    from dreamvla_tpu.config import PRESETS, DreamVLAConfig, TrainConfig

    if args.preset:
        mcfg, tcfg = PRESETS[args.preset]()
    else:
        mcfg, tcfg = DreamVLAConfig(), TrainConfig()
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
        data = get_calvin_dataset(
            args.calvin_dataset,
            key="except_lang" if args.except_lang else "lang",
            pretrain=(mcfg.phase == "pretrain"),
            partial_data=args.partial_data, enrich_lang=enrich,
            load_track_labels=args.load_track_labels,
            track_label_path=args.track_label_path,
            load_dino_features=args.load_dino_features,
            dino_features_path=args.dino_features_path,
            load_sam_features=args.load_sam_features,
            sam_features_path=args.sam_features_path,
            merge_data=args.merge_data, text_aug=args.text_aug, **common)
    elif args.finetune_type.startswith("libero"):
        data = get_libero_dataset(
            args.libero_path, args.libero_suite,
            load_track_labels=args.load_track_labels,
            load_dino_features=args.load_dino_features,
            load_sam_features=args.load_sam_features, **common)
    else:
        raise ValueError(f"unsupported finetune_type {args.finetune_type}")

    steps_per_epoch = data.dataloader.num_batches
    total_steps = steps_per_epoch * tcfg.num_epochs
    sample = next(iter(data.dataloader))
    state, tx, _ = create_train_state(
        model, tcfg, sample, jax.random.PRNGKey(tcfg.seed), total_steps,
        steps_per_epoch)

    params = dict(state.params)
    params = _load_pretrained_encoders(mcfg, params, args)
    if args.finetune_from_pretrained_ckpt:
        sd = ti.load_torch_state_dict(args.finetune_from_pretrained_ckpt)
        tree, _, _ = ti.import_dreamvla(sd, mcfg)
        params = finetune_surgery(tree, params, mcfg.sequence_length)
    state = state.replace(params=params)
    resume_epoch = 0
    if args.resume_from_checkpoint:
        state, resume_epoch = restore_checkpoint(args.resume_from_checkpoint,
                                                 state)

    mesh = make_mesh(("dp",))
    step_fn = build_train_step(model, tcfg, tx, mesh=mesh)
    logger = MetricLogger(args.report_to_wandb, args.wandb_project,
                          args.run_name) if rank == 0 else None
    val_data = None
    if args.validation and args.finetune_type == "calvin":
        val_data = get_calvin_dataset(args.calvin_dataset, validation=True,
                                      **common)
    rng = jax.random.PRNGKey(tcfg.seed + rank)
    for epoch in range(resume_epoch, tcfg.num_epochs):
        state, _ = train_one_epoch(model, tcfg, state, step_fn, data, epoch,
                                   rng, mesh=mesh, logger=logger)
        if val_data is not None and rank == 0:
            from dreamvla_tpu.eval.offline import evaluate_open_loop

            metrics = evaluate_open_loop(model, state.params, val_data,
                                         num_batches=10)
            if logger is not None:
                logger.log({f"val/{k}": v for k, v in metrics.items()},
                           step=int(jax.device_get(state.step)))
        if rank == 0 and args.save_checkpoint and epoch % args.save_checkpoint_seq == 0:
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
            state, _ = restore_checkpoint(args.resume_from_checkpoint, state)
            params = state.params
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


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("dreamvla_tpu")
    sub = parser.add_subparsers(dest="command", required=True)
    for name in ("train", "eval_calvin", "eval_libero"):
        p = sub.add_parser(name)
        _add_model_flags(p)
        _add_train_flags(p)
        _add_io_flags(p)
    args = parser.parse_args(argv)
    {"train": cmd_train, "eval_calvin": cmd_eval_calvin,
     "eval_libero": cmd_eval_libero}[args.command](args)


if __name__ == "__main__":
    main()
