#!/usr/bin/env bash
# LIBERO suite finetuning (reference scripts/LIBERO/DreamVLA/finetune_*.sh).
libero_root=${1:?usage: libero_finetune.sh <converted_root> <suite e.g. libero_spatial>}
suite=${2:?need suite}
python -m dreamvla_tpu.cli train --preset libero_finetune \
    --finetune_type "${suite}" \
    --libero_path "${libero_root}" --libero_suite "${suite}_converted" \
    --vit_checkpoint_path checkpoints/mae_pretrain_vit_base.pth \
    --clip_checkpoint_path checkpoints/clip/ViT-B-32.pt \
    --save_checkpoint --save_checkpoint_path checkpoints/ \
    --run_name "finetune_${suite}" "${@:3}"
