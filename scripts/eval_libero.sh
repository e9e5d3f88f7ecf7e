#!/usr/bin/env bash
# LIBERO suite eval (reference eval_*.sh): 10 tasks x 20 init states,
# temporal ensembling, optional batched rollouts (--parallel_envs 8).
python -m dreamvla_tpu.cli eval_libero --preset libero_finetune \
    --finetune_type "${1:?suite}" --libero_path "${2:?LIBERO path}" \
    --resume_from_checkpoint "${3:?ckpt}" \
    --eval_libero_ensembling "${@:4}"
