#!/usr/bin/env bash
# CALVIN ABC-D finetuning (reference finetune.sh equivalent): DiT head,
# image+depth+SAM losses, flow-as-mask, pretrain surgery.
calvin_dataset_path=${1:?usage: calvin_finetune.sh <calvin_dataset_path> <pretrained_ckpt>}
pretrained=${2:?need pretrained checkpoint}
python -m dreamvla_tpu.cli train --preset calvin_finetune \
    --calvin_dataset "${calvin_dataset_path}" \
    --vit_checkpoint_path checkpoints/mae_pretrain_vit_base.pth \
    --clip_checkpoint_path checkpoints/clip/ViT-B-32.pt \
    --finetune_from_pretrained_ckpt "${pretrained}" \
    --save_checkpoint --save_checkpoint_path checkpoints/ \
    --run_name finetune_dreamvla_calvin_abc_d "${@:3}"
