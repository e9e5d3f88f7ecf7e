"""Anchor the bench baseline: measure the REAL reference policy step.

VERDICT r1 flagged that `vs_baseline` rested on a bare constant
(15 chunks/s, an engineering estimate of the A100 PyTorch reference).
This tool replaces it with a measured + derived figure:

1. Runs the UNMODIFIED reference model (`/root/reference/models/
   dreamvla_model.py`, via dreamvla_tpu.utils.ref_shims) at the flagship
   CALVIN-finetune shapes (finetune.sh:25-61: hidden 1024 x 24L x 16H,
   seq 10, DiT-B DDIM-10 CFG) in mode="test" on CPU torch — the exact
   eval hot step (eval_utils_calvin.py:127-134) — and times it.
2. Counts the step's torch ops with torch.profiler: on a GPU each op is
   >= one kernel launch, so `n_ops x t_launch` is a latency floor for
   the eager reference.
3. Counts the step's FLOPs with XLA cost analysis of this repo's policy
   fn at identical shapes (same architecture => same FLOPs).
4. Derives the A100 estimate GENEROUSLY for the reference:
       T_A100 = max(n_ops * T_LAUNCH, F / (MFU * A100_BF16_PEAK))
   i.e. the faster of "every op free, only launch latency" and
   "perfectly overlapped compute at an optimistic eager-mode MFU" —
   taking the max of the two lower bounds, each individually generous.

Writes the result + method into BASELINE.json["derived"]; bench.py reads
`derived.baseline_chunks_per_sec` from there.

Run: PYTHONPATH=/root/repo python tools/anchor_baseline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

T_LAUNCH = 5e-6        # CUDA kernel-launch overhead, ~5 us (public figure)
A100_BF16_PEAK = 312e12
EAGER_MFU = 0.30       # optimistic for bs-1 eager torch (generous to ref)
FLAGSHIP = dict(sequence_length=10, num_resampler_query=16,
                num_obs_token_per_image=9, transformer_layers=24,
                hidden_dim=1024, transformer_heads=16, action_pred_steps=3,
                obs_pred=True, depth_pred=True, sam_feat_pred=True,
                use_dit_head=True, phase="finetune",
                track_label_patch_size=8,
                attn_implementation="sdpa")  # the flagship script's choice


def measure_reference_cpu(iters: int = 6):
    import torch

    from dreamvla_tpu.utils.ref_shims import build_reference_model

    torch.set_num_threads(os.cpu_count() or 8)
    mae = "/tmp/anchor_mae_empty.pth"
    torch.save({"model": {}}, mae)
    torch.manual_seed(0)
    model = build_reference_model(mae, **FLAGSHIP).eval()
    model._init_model_type()  # reference train.py calls this post-cast

    b, s = 1, FLAGSHIP["sequence_length"]
    inputs = dict(
        image_primary=torch.randn(b, s, 3, 224, 224),
        image_wrist=torch.randn(b, s, 3, 224, 224),
        state=torch.rand(b, s, 7),
        text_token=torch.zeros(b, s, 77, dtype=torch.long),
        action=torch.zeros(b, s, 7),
        mode="test")

    with torch.no_grad():
        for _ in range(2):  # warmup
            model(**inputs)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            model(**inputs)
            times.append(time.perf_counter() - t0)
        t_cpu = float(np.median(times))

        from torch.profiler import ProfilerActivity, profile

        with profile(activities=[ProfilerActivity.CPU]) as prof:
            model(**inputs)
        # aten ops that plausibly launch GPU kernels; metadata/view ops are
        # free on GPU, so excluding them keeps the floor generous to the
        # reference
        metadata = {
            "aten::view", "aten::reshape", "aten::permute",
            "aten::transpose", "aten::slice", "aten::select",
            "aten::unsqueeze", "aten::squeeze", "aten::expand",
            "aten::expand_as", "aten::t", "aten::as_strided",
            "aten::detach", "aten::detach_", "aten::alias", "aten::empty",
            "aten::empty_like", "aten::empty_strided", "aten::resolve_conj",
            "aten::resolve_neg", "aten::result_type", "aten::size",
            "aten::stride", "aten::is_nonzero", "aten::item",
            "aten::_local_scalar_dense", "aten::split", "aten::chunk",
            "aten::narrow", "aten::flatten", "aten::broadcast_to",
            "aten::_unsafe_view", "aten::lift_fresh",
        }
        n_ops = sum(e.count for e in prof.key_averages()
                    if e.key.startswith("aten::") and e.key not in metadata)
    return t_cpu, n_ops


def count_policy_flops():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dreamvla_tpu.config import calvin_finetune
    from dreamvla_tpu.eval.policy import build_policy_core
    from dreamvla_tpu.models.dreamvla import DreamVLA

    cfg, _ = calvin_finetune()
    model = DreamVLA(cfg)
    rng = np.random.default_rng(0)
    b, s = 1, cfg.sequence_length
    ip = jnp.asarray(rng.normal(size=(b, s, 3, 224, 224)), jnp.float32)
    iw = jnp.asarray(rng.normal(size=(b, s, 3, 224, 224)), jnp.float32)
    st = jnp.asarray(rng.normal(size=(b, s, 7)), jnp.float32)
    tt = jnp.zeros((b, 77), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        image_primary=ip, image_wrist=iw, state=st, text_tokens=tt,
        action_label=jnp.zeros((b, s, cfg.action_pred_steps, 7)),
        mode="train", train=False)
    policy = build_policy_core(model)
    lowered = jax.jit(policy).lower(variables["params"], ip, iw, st, tt,
                                    jax.random.PRNGKey(0))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost["flops"])


def measure_reference_train_cpu(iters: int = 1, bs: int = 2):
    """Time + op-count one reference TRAIN step (fwd in train mode, scalar
    loss over every output, backward, AdamW update) on CPU torch at the
    flagship finetune shapes (finetune.sh:12-39: batch_size 2, accum 1).
    The loss scalar is a sum of output means — cheaper than the reference's
    7-term loss assembly (train_utils.py:158-585) but those reductions are
    O(activations), negligible next to fwd+bwd matmuls; excluding them is
    generous to the reference."""
    import torch

    from dreamvla_tpu.utils.ref_shims import build_reference_model

    torch.set_num_threads(os.cpu_count() or 8)
    mae = "/tmp/anchor_mae_empty.pth"
    torch.save({"model": {}}, mae)
    torch.manual_seed(0)
    model = build_reference_model(mae, **FLAGSHIP).train()
    model._init_model_type()
    s = FLAGSHIP["sequence_length"]
    aps = FLAGSHIP["action_pred_steps"]
    inputs = dict(
        image_primary=torch.randn(bs, s, 3, 224, 224),
        image_wrist=torch.randn(bs, s, 3, 224, 224),
        state=torch.rand(bs, s, 7),
        text_token=torch.zeros(bs, s, 77, dtype=torch.long),
        action=torch.rand(bs, s, 7),
        action_label=torch.rand(bs, s, aps, 7),
        mode="train")
    opt = torch.optim.AdamW(
        [p for p in model.parameters() if p.requires_grad], lr=1e-4)

    def one_step():
        opt.zero_grad(set_to_none=True)
        outs = model(**inputs)
        loss = sum(o.float().mean() for o in outs
                   if torch.is_tensor(o) and o.is_floating_point()
                   and o.requires_grad)
        loss.backward()
        opt.step()

    # no warmup and iters=1 by default: the A100 floor derivation uses only
    # the op count + FLOPs; the CPU wall-clock is informational (a single
    # 1-core eager train step at these shapes runs ~10 min)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        one_step()
        times.append(time.perf_counter() - t0)
    t_cpu = float(np.median(times))

    from torch.profiler import ProfilerActivity, profile

    with profile(activities=[ProfilerActivity.CPU]) as prof:
        one_step()
    metadata = {
        "aten::view", "aten::reshape", "aten::permute", "aten::transpose",
        "aten::slice", "aten::select", "aten::unsqueeze", "aten::squeeze",
        "aten::expand", "aten::expand_as", "aten::t", "aten::as_strided",
        "aten::detach", "aten::detach_", "aten::alias", "aten::empty",
        "aten::empty_like", "aten::empty_strided", "aten::resolve_conj",
        "aten::resolve_neg", "aten::result_type", "aten::size",
        "aten::stride", "aten::is_nonzero", "aten::item",
        "aten::_local_scalar_dense", "aten::split", "aten::chunk",
        "aten::narrow", "aten::flatten", "aten::broadcast_to",
        "aten::_unsafe_view", "aten::lift_fresh",
    }
    n_ops = sum(e.count for e in prof.key_averages()
                if (e.key.startswith("aten::") or
                    e.key.startswith("autograd::")) and e.key not in metadata)
    return t_cpu, n_ops


def count_train_flops(bs: int = 2):
    """FLOPs of OUR full train step (fwd, 7 losses, grads, AdamW) at the
    flagship finetune shapes via XLA cost analysis — same architecture as
    the reference, so the same FLOP count up to loss-assembly noise."""
    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dreamvla_tpu.config import calvin_finetune
    from dreamvla_tpu.models.dreamvla import DreamVLA
    from dreamvla_tpu.parallel.train_step import (build_train_step,
                                                  create_train_state)
    from dreamvla_tpu.utils.testing import add_accum_axis, make_synthetic_batch

    cfg, tcfg = calvin_finetune()
    tcfg = dataclasses.replace(tcfg, batch_size=bs)
    model = DreamVLA(cfg)
    batch = make_synthetic_batch(cfg, tcfg, batch=bs)
    state, tx, _ = create_train_state(model, tcfg, batch,
                                      jax.random.PRNGKey(0), total_steps=10)
    step = build_train_step(model, tcfg, tx, mesh=None, donate=False)
    abatch = jax.tree.map(jnp.asarray, add_accum_axis(batch, accum=1))
    lowered = jax.jit(step).lower(state, abatch, jax.random.PRNGKey(1))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost["flops"])


def main():
    if "--train" in sys.argv:
        bs = 2
        t_cpu, n_ops = measure_reference_train_cpu(bs=bs)
        print(f"reference torch-CPU train step (bs{bs}): {t_cpu*1e3:.0f} ms, "
              f"{n_ops} ops")
        flops = count_train_flops(bs=bs)
        print(f"train-step FLOPs (XLA cost analysis, identical shapes): "
              f"{flops/1e9:.1f} GFLOP")
        t_launch_floor = n_ops * T_LAUNCH
        t_compute_floor = flops / (EAGER_MFU * A100_BF16_PEAK)
        t_a100 = max(t_launch_floor, t_compute_floor)
        baseline = bs / t_a100
        print(f"A100 train floors: launch {t_launch_floor*1e3:.1f} ms, "
              f"compute {t_compute_floor*1e3:.1f} ms -> derived baseline "
              f"{baseline:.2f} samples/s")
        path = os.path.join(os.path.dirname(__file__), "..", "BASELINE.json")
        with open(path) as f:
            data = json.load(f)
        data["derived_train"] = {
            "baseline_train_samples_per_sec": round(baseline, 2),
            "method": (
                "real reference model (ref_shims) train step (fwd train "
                "mode + backward + AdamW) timed/op-counted on CPU torch at "
                "finetune.sh shapes (bs2); A100 estimate = max(n_ops*5us "
                "launch floor, FLOPs/(0.30*312e12) compute floor); FLOPs "
                "from XLA cost analysis of our full train step at "
                "identical shapes"),
            "batch_size": bs,
            "reference_cpu_ms": round(t_cpu * 1e3, 1),
            "reference_train_ops": int(n_ops),
            "train_step_gflops": round(flops / 1e9, 2),
            "launch_floor_ms": round(t_launch_floor * 1e3, 2),
            "compute_floor_ms": round(t_compute_floor * 1e3, 2),
            "constants": {"t_launch_us": 5, "a100_bf16_peak_tflops": 312,
                          "eager_mfu": EAGER_MFU},
        }
        with open(path, "w") as f:
            json.dump(data, f, indent=1)
        print(f"wrote derived train baseline to {os.path.abspath(path)}")
        return

    t_cpu, n_ops = measure_reference_cpu()
    print(f"reference torch-CPU policy step: {t_cpu*1e3:.0f} ms, "
          f"{n_ops} aten ops")
    flops = count_policy_flops()
    print(f"policy-step FLOPs (XLA cost analysis, identical shapes): "
          f"{flops/1e9:.1f} GFLOP")

    t_launch_floor = n_ops * T_LAUNCH
    t_compute_floor = flops / (EAGER_MFU * A100_BF16_PEAK)
    t_a100 = max(t_launch_floor, t_compute_floor)
    baseline = 1.0 / t_a100
    print(f"A100 floors: launch {t_launch_floor*1e3:.1f} ms, "
          f"compute {t_compute_floor*1e3:.1f} ms -> "
          f"derived baseline {baseline:.1f} chunks/s")

    path = os.path.join(os.path.dirname(__file__), "..", "BASELINE.json")
    with open(path) as f:
        data = json.load(f)
    data["derived"] = {
        "baseline_chunks_per_sec": round(baseline, 2),
        "method": (
            "real reference model (ref_shims) timed on CPU torch at "
            "flagship shapes; A100 estimate = max(n_ops*5us launch floor, "
            "FLOPs/(0.30*312e12) compute floor), both generous to the "
            "reference; FLOPs from XLA cost analysis at identical shapes"),
        "reference_cpu_ms": round(t_cpu * 1e3, 1),
        "reference_aten_ops": int(n_ops),
        "policy_step_gflops": round(flops / 1e9, 2),
        "launch_floor_ms": round(t_launch_floor * 1e3, 2),
        "compute_floor_ms": round(t_compute_floor * 1e3, 2),
        "constants": {"t_launch_us": 5, "a100_bf16_peak_tflops": 312,
                      "eager_mfu": EAGER_MFU},
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(f"wrote derived baseline to {os.path.abspath(path)}")


if __name__ == "__main__":
    main()
