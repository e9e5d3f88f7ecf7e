#!/usr/bin/env bash
# CALVIN ABC-D pretraining (reference scripts/CALVIN_ABC_D/DreamVLA/pretrain.sh
# equivalent). One process per TPU host — no torchrun; jax.distributed
# bootstraps automatically on pods.
calvin_dataset_path=${1:?usage: calvin_pretrain.sh <calvin_dataset_path>}
python -m dreamvla_tpu.cli train --preset calvin_pretrain \
    --calvin_dataset "${calvin_dataset_path}" \
    --vit_checkpoint_path checkpoints/mae_pretrain_vit_base.pth \
    --clip_checkpoint_path checkpoints/clip/ViT-B-32.pt \
    --except_lang \
    --save_checkpoint --save_checkpoint_path checkpoints/ \
    --run_name pretrain_dreamvla_calvin_abc_d "${@:2}"
