#!/usr/bin/env bash
# CALVIN 1000-sequence protocol (reference eval.sh equivalent).
python -m dreamvla_tpu.cli eval_calvin --preset calvin_finetune \
    --resume_from_checkpoint "${1:?ckpt}" \
    --calvin_dataset "${2:?dataset}" --calvin_conf_path "${3:?conf}" "${@:4}"
