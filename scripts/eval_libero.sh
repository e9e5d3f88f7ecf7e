#!/usr/bin/env bash
# LIBERO suite eval (reference eval_*.sh): 10 tasks x 20 init states,
# temporal ensembling, optional batched rollouts (--parallel_envs 8).

# reference eval_*.sh sweeps checkpoint epochs (scripts/LIBERO/DreamVLA/
# eval_spatial.sh:8-18); pass EPOCHS="26 27 ..." to do the same here:
#   EPOCHS="26 27 28" scripts/eval_libero.sh suite /libero ckpts/run
if [ -n "${EPOCHS:-}" ]; then
    for e in ${EPOCHS}; do
        python -m dreamvla_tpu.cli eval_libero --preset libero_finetune \
            --finetune_type "$1" --libero_path "$2" \
            --resume_from_checkpoint "$3" --checkpoint_epoch "$e" \
            --eval_libero_ensembling "${@:4}" | tee "eval_libero_ep${e}.log"
    done
    exit 0
fi
python -m dreamvla_tpu.cli eval_libero --preset libero_finetune \
    --finetune_type "${1:?suite}" --libero_path "${2:?LIBERO path}" \
    --resume_from_checkpoint "${3:?ckpt}" \
    --eval_libero_ensembling "${@:4}"
