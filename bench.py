"""Headline benchmark: closed-loop action-chunk inference throughput/chip.

Measures the full flagship policy step (CALVIN finetune config,
scripts/CALVIN_ABC_D/DreamVLA/finetune.sh shapes): CLIP text encode + MAE
ViT-B over 2 views x 10 frames + perceiver resampler + 24L/1024 trunk under
the block mask + DiT-B DDIM-10 CFG sampling -> one 3-step action chunk.
This is the eval hot loop (eval_utils_calvin.py:127-134: one forward per env
step, DDIM sampling included).

Baseline: the reference publishes no numbers (BASELINE.json.published = {});
we use an engineering estimate of the A100 PyTorch reference eval step —
~65 ms/chunk (MAE bf16 over 20 frames ~30ms + fp32 24L trunk at L=930 ~20ms
+ 10 sequential DiT-B passes ~10ms + host overhead) => ~15 chunks/s.
`vs_baseline` = measured / 15.0. Driver target: >=5x => vs_baseline >= 5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import numpy as np

BASELINE_CHUNKS_PER_SEC = 15.0  # estimated A100 PyTorch reference (see above)


def main():
    from __graft_entry__ import entry

    policy, args = entry()
    fn = policy  # already jitted
    # warmup / compile (first Pallas compile can take minutes on the tunnel)
    out = fn(*args)
    jax.block_until_ready(out)

    iters = 50
    times = []
    for _ in range(5):  # medians over repeats: tunnel timing jitters +-40%
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    per_step = float(np.median(times))
    chunks_per_sec = 1.0 / per_step

    print(json.dumps({
        "metric": "action_chunks_per_sec_per_chip",
        "value": round(chunks_per_sec, 3),
        "unit": "chunks/s (flagship CALVIN-finetune policy step, batch 1)",
        "vs_baseline": round(chunks_per_sec / BASELINE_CHUNKS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
