"""Headline benchmark: closed-loop action-chunk inference throughput/chip.

Measures the full flagship policy step (CALVIN finetune config,
scripts/CALVIN_ABC_D/DreamVLA/finetune.sh shapes): MAE ViT-B views +
perceiver resampler + 24L/1024 trunk under the block mask + DiT-B DDIM-10
CFG sampling -> one 3-step action chunk. This is the eval hot loop
(eval_utils_calvin.py:127-134: one forward per env step, DDIM sampling
included).

Two numbers are measured:
  * bs-1 latency-path step — the reference's own eval configuration
    (one env per device, eval.sh node_num=8);
  * batched serving step — K environments stepped through ONE forward,
    the configuration this framework's eval drivers actually use
    (BatchedPolicyWrapper; per-slot semantics identical to bs-1, see
    tests/test_policy.py). The headline value is the better chunks/s/chip
    of the two: throughput per chip is the metric, and batching rollouts
    is a capability the torch reference does not have.

Methodology: this environment reaches the chip through a tunnel whose
per-dispatch RTT (~30-70 ms) would swamp the device time, and
block_until_ready does not actually block — so the bench runs N policy
steps inside ONE on-device lax.scan (inputs perturbed per step, rng folded)
and reads back an output that depends on every step. That yields pure
device throughput, the number that matters for serving/eval farms.

The measured step is the *steady-state feature-cached* policy step: encode
only the newest frame (2 views) and roll the cached per-frame vision tokens
— bit-identical outputs to the reference's full-history re-encode
(tests/test_policy.py::test_feature_cache_matches_full_recompute) at
roughly half the FLOPs. Inference params are bf16.

Baseline: the reference publishes no numbers (BASELINE.json.published = {}).
`vs_baseline` divides by BASELINE.json["derived"].baseline_chunks_per_sec,
produced by tools/anchor_baseline.py: the REAL reference model timed on
CPU at these shapes, with the A100 figure derived as
max(kernel-launch floor, FLOP floor at optimistic eager MFU) — both floors
generous to the reference. Derivation inputs are recorded in BASELINE.json.

OUTPUT DISCIPLINE (round-3 post-mortem: BENCH_r03.json was parsed=null
because the single final print sat behind every optional extra and the
driver's wall clock ran out first):
  * a complete, valid headline JSON line is printed IMMEDIATELY after the
    first measured bf16 point, and re-printed — strictly enriched, same
    schema — after each further phase completes; the driver may take the
    first or the last parsed line, both are correct;
  * a SIGTERM handler and an atexit hook re-print the best-known line, so
    even a driver kill mid-extra leaves a parseable artifact;
  * the whole run is budgeted (BENCH_BUDGET_S, default 480 s after the
    device probe): each optional phase (serving batch, int8, train point)
    is skipped if the remaining budget can't cover its historical cost,
    and the train subprocess timeout is the remaining budget, not a flat
    constant.

Alongside the serving numbers, one TRAIN-step throughput point (bs-8 full
step: fwd + 7-loss sum + bwd + clip + AdamW) is measured in a subprocess
(tools/train_breakdown.py) and reported as train_samples_per_sec_per_chip
against a baseline re-derived AT THE MEASURED BATCH from
BASELINE.json.derived_train's floors (launch floor is batch-independent,
compute floor scales linearly with batch) — best-effort, never allowed to
cost the serving headline.

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline",
...} (possibly several times, monotonically enriched; every printed line
is valid on its own).
"""

import atexit
import json
import os
import signal
import sys
import time

import numpy as np

FALLBACK_BASELINE = 22.4  # chunks/s; see tools/anchor_baseline.py
STEPS_PER_DISPATCH = 20
REPEATS = 5
SERVE_BATCH = 16  # best bf16 serving batch (bs8/24/32 measured worse)

# Historical per-phase costs through the tunnel (round-3 stderr trail:
# bs16 build+measure ~106 s, int8 bs32 ~218 s, int8 bs1 ~113 s). A phase
# is attempted only if the remaining budget covers ~1.3x its cost.
PHASE_COST_S = {"serve": 120, "int8_serve": 230, "int8_bs1": 130,
                "train": 150}

_emitted = {"line": None}


def _emit(out):
    """Print a complete headline line and remember it for crash flush."""
    line = json.dumps(out)
    _emitted["line"] = line
    print(line, flush=True)


def _flush_on_exit():
    # If the process dies between phases (or the driver SIGTERMs us), make
    # sure the best-known headline is the LAST thing on stdout.
    if _emitted["line"] is not None:
        print(_emitted["line"], flush=True)


def _on_sigterm(signum, frame):  # pragma: no cover - driver-kill path
    _flush_on_exit()
    os._exit(0)


def _baseline():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.json")
    try:
        with open(path) as f:
            return float(json.load(f)["derived"]["baseline_chunks_per_sec"])
    except Exception:
        return FALLBACK_BASELINE


def _train_baseline_at(batch):
    """A100 train floor re-derived at the measured batch.

    BASELINE.json.derived_train records the floors at bs-2: the launch
    floor (op count x 5 us) does not scale with batch, the compute floor
    scales linearly. Using the bs-2 figure for a bs-8 measurement would
    flatter us ~8% (ADVICE r3, medium).
    """
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.json")
    try:
        with open(path) as f:
            dt = json.load(f)["derived_train"]
        b0 = float(dt["batch_size"])
        floor_ms = max(float(dt["launch_floor_ms"]),
                       float(dt["compute_floor_ms"]) * batch / b0)
        return batch / (floor_ms / 1e3)
    except Exception:
        return None


def build_run_n(model, params, batch, steps):
    """Returns (run_n, warm_args): run_n(params, img_hist, cls_hist, rng)
    executes `steps` steady-state policy steps in ONE on-device scan.

    The rollout warm-up (encoding the initial S-frame history and the goal
    text) happens ONCE per rollout in real serving, so it is computed
    outside the timed dispatch; the timed region is the per-env-step work
    only: encode the newest frame (2 views), roll the token cache, trunk +
    DiT DDIM sampling.
    """
    import jax
    import jax.numpy as jnp

    from dreamvla_tpu.eval.policy import build_cached_policy_cores

    cfg = model.cfg
    encode_frame, trunk_step, encode_text = build_cached_policy_cores(model)
    rng = np.random.default_rng(0)
    b, s = batch, cfg.sequence_length
    ip = jnp.asarray(rng.normal(size=(b, s, 3, 224, 224)), jnp.float32)
    iw = jnp.asarray(rng.normal(size=(b, s, 3, 224, 224)), jnp.float32)
    st = jnp.asarray(rng.normal(size=(b, s, 7)), jnp.float32)
    tt = jnp.asarray(rng.integers(0, 49408, size=(b, 77)), jnp.int32)

    # per-rollout warm-up: initial history tokens + goal text (untimed)
    img_hist0, cls_hist0 = jax.jit(encode_frame)(params, ip, iw)
    text_feats = jax.jit(encode_text)(params, tt)
    ip1, iw1 = ip[:, :1], iw[:, :1]
    sel = jnp.full((b,), s - 1, jnp.int32)  # steady state: newest position

    @jax.jit
    def run_n(params, img_hist, cls_hist, rng):
        def step(carry, i):
            acc, rng, img_hist, cls_hist = carry
            rng, sub = jax.random.split(rng)
            # steady state: encode ONE new frame (2 views), roll the cache
            it, ct = encode_frame(params, ip1 + i * 1e-4, iw1)
            img_hist = jnp.concatenate([img_hist[:, 1:], it], axis=1)
            cls_hist = jnp.concatenate([cls_hist[:, 1:], ct], axis=1)
            arm, grip = trunk_step(params, img_hist, cls_hist, st,
                                   text_feats, sub, sel)
            acc = acc + jnp.sum(arm) + jnp.sum(grip)
            return (acc, rng, img_hist, cls_hist), None

        (acc, _, _, _), _ = jax.lax.scan(
            step, (jnp.zeros(()), rng, img_hist, cls_hist),
            jnp.arange(steps))
        return acc

    return run_n, (img_hist0, cls_hist0)


def measure(run_n, warm, params, steps, repeats=REPEATS):
    import jax

    img_hist0, cls_hist0 = warm
    float(run_n(params, img_hist0, cls_hist0,
                jax.random.PRNGKey(7)))  # warmup/compile
    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        float(run_n(params, img_hist0, cls_hist0, jax.random.PRNGKey(r)))
        times.append((time.perf_counter() - t0) / steps)
    return float(np.median(times))


def _device_watchdog(timeout_s: int = 600):
    """Fail fast if the TPU tunnel is wedged.

    Device init hangs inside PJRT C++ when the tunnel is down (observed:
    jax.devices() blocking >9 min), where no in-process timeout can fire.
    Probe it in a THROWAWAY subprocess first; on failure print an honest
    JSON error line (value 0) and exit instead of hanging the driver.
    """
    import subprocess

    probe = ("import jax, jax.numpy as jnp; assert jax.devices(); "
             "x = jnp.ones((128, 128), jnp.bfloat16); "
             "(x @ x).block_until_ready()")
    try:
        subprocess.run([sys.executable, "-c", probe], timeout=timeout_s,
                       check=True, capture_output=True)
    except Exception as e:
        print(json.dumps({
            "metric": "action_chunks_per_sec_per_chip", "value": 0.0,
            "unit": "chunks/s/chip",
            "vs_baseline": 0.0,
            "error": f"device unavailable: {type(e).__name__} "
                     f"(tunnel probe failed within {timeout_s}s)",
        }))
        sys.exit(0)


def main():
    signal.signal(signal.SIGTERM, _on_sigterm)
    atexit.register(_flush_on_exit)
    _device_watchdog()

    from dreamvla_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from dreamvla_tpu.config import calvin_finetune
    from dreamvla_tpu.models.dreamvla import DreamVLA

    budget_s = float(os.environ.get("BENCH_BUDGET_S", "480"))
    T0 = time.perf_counter()

    def remaining():
        return budget_s - (time.perf_counter() - T0)

    def note(msg):
        print(f"[bench +{time.perf_counter() - T0:.0f}s] {msg}",
              file=sys.stderr, flush=True)

    def have_time(phase):
        ok = remaining() > PHASE_COST_S[phase] * 1.3
        if not ok:
            note(f"{phase}: skipped ({remaining():.0f}s left < "
                 f"{PHASE_COST_S[phase] * 1.3:.0f}s needed)")
        return ok

    cfg, _ = calvin_finetune()
    model = DreamVLA(cfg)
    rng = np.random.default_rng(0)
    b, s = 1, cfg.sequence_length
    ip = jnp.asarray(rng.normal(size=(b, s, 3, 224, 224)), jnp.float32)
    iw = jnp.asarray(rng.normal(size=(b, s, 3, 224, 224)), jnp.float32)
    st = jnp.asarray(rng.normal(size=(b, s, 7)), jnp.float32)
    tt = jnp.asarray(rng.integers(0, 49408, size=(b, 77)), jnp.int32)
    action_label = jnp.zeros((b, s, cfg.action_pred_steps, 7), jnp.float32)
    # init in train mode so the DiT head's params are created too
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        image_primary=ip, image_wrist=iw, state=st, text_tokens=tt,
        action_label=action_label, mode="train", train=False)
    # bf16 inference params (standard serving practice; halves weight reads)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 and x.ndim >= 2 else x,
        variables["params"])

    baseline = _baseline()

    # ---- phase 1 (mandatory): bs-1 bf16 — emit the headline IMMEDIATELY
    run1, warm1 = build_run_n(model, params, 1, STEPS_PER_DISPATCH)
    note("bs1 built")
    t_bs1 = measure(run1, warm1, params, STEPS_PER_DISPATCH)
    bs1_chunks = 1.0 / t_bs1
    note(f"bs1 measured: {bs1_chunks:.1f} chunks/s")

    out = {
        "metric": "action_chunks_per_sec_per_chip",
        "value": round(bs1_chunks, 3),
        "unit": "chunks/s/chip (flagship CALVIN-finetune policy step; bs-1)",
        "vs_baseline": round(bs1_chunks / baseline, 3),
        "bs1_chunks_per_sec": round(bs1_chunks, 3),
        "bs1_latency_ms": round(t_bs1 * 1e3, 3),
        "baseline_chunks_per_sec": baseline,
        "baseline_method": "derived (tools/anchor_baseline.py)",
    }
    _emit(out)

    # ---- phase 2 (optional): best bf16 serving batch
    serve = {}
    serve_steps = max(STEPS_PER_DISPATCH // 4, 5)
    if have_time("serve"):
        try:
            runb, warmb = build_run_n(model, params, SERVE_BATCH,
                                      serve_steps)
            note(f"bs{SERVE_BATCH} built")
            t_serve = measure(runb, warmb, params, serve_steps)
            serve[SERVE_BATCH] = SERVE_BATCH / t_serve
            note(f"bs{SERVE_BATCH} measured: "
                 f"{serve[SERVE_BATCH]:.1f} chunks/s")
            del runb, warmb
        except Exception as e:  # pragma: no cover - device-side failures
            note(f"bs{SERVE_BATCH} failed: {type(e).__name__}: {e}")
    if serve:
        headline = max([bs1_chunks] + list(serve.values()))
        best_sb = max(serve, key=serve.get)
        out["value"] = round(headline, 3)
        out["unit"] = ("chunks/s/chip (flagship CALVIN-finetune policy "
                       f"step; best of bs-1 and batched-{best_sb} serving)")
        out["vs_baseline"] = round(headline / baseline, 3)
        for sb, v in serve.items():
            out[f"batch{sb}_chunks_per_sec"] = round(v, 3)
        _emit(out)

    # ---- phase 3 (optional): int8 (W8A8) serving mode (trunk + encoder +
    # DiT head quantized) — an opt-in quality trade (1.3% max / 0.35% mean
    # action drift, 100% gripper-decision agreement; measured by
    # tools/fused_action_parity.py --int8 and bounded in CI by
    # tests/test_int8_openloop.py), so it is reported alongside but kept
    # OUT of the headline, which stays numerics-faithful bf16. Two points:
    # bs-32 (the measured knee of the int8 serving curve: 97% of the bs-64
    # rate at half the per-env latency) and bs-1 (the reference's own eval
    # config, weight-read bound -> halved traffic).
    int8_sb = 32
    params_q = None
    if have_time("int8_serve"):
        try:
            from dreamvla_tpu.models.dit import quantize_dit_params
            from dreamvla_tpu.ops.gpt2_fused import quantize_trunk_params
            from dreamvla_tpu.ops.vit_fused import quantize_encoder_params

            params_q = quantize_encoder_params(quantize_trunk_params(params))
            params_q["action_model"] = quantize_dit_params(
                params_q["action_model"])
            runq, warmq = build_run_n(model, params_q, int8_sb, serve_steps)
            note(f"int8 bs{int8_sb} built")
            t_q = measure(runq, warmq, params_q, serve_steps)
            int8_serve = int8_sb / t_q
            note(f"int8 bs{int8_sb} measured: {int8_serve:.1f} chunks/s")
            out[f"int8_batch{int8_sb}_chunks_per_sec"] = round(int8_serve, 3)
            out["int8_vs_baseline"] = round(int8_serve / baseline, 3)
            _emit(out)
            del runq, warmq
        except Exception as e:  # pragma: no cover - device-side failures
            note(f"int8 serve failed: {type(e).__name__}: {e}")
    if params_q is not None and have_time("int8_bs1"):
        try:
            runq1, warmq1 = build_run_n(model, params_q, 1,
                                        STEPS_PER_DISPATCH)
            note("int8 bs1 built")
            int8_bs1 = measure(runq1, warmq1, params_q, STEPS_PER_DISPATCH)
            note(f"int8 bs1 measured: {int8_bs1 * 1e3:.2f} ms")
            out["int8_bs1_latency_ms"] = round(int8_bs1 * 1e3, 3)
            _emit(out)
            del runq1, warmq1
        except Exception as e:  # pragma: no cover - device-side failures
            note(f"int8 bs1 failed: {type(e).__name__}: {e}")

    # ---- phase 4 (optional): train-step throughput point. Measured in a
    # SUBPROCESS (tools/train_breakdown.py --only step): the serving
    # executables + buffers already resident here would OOM the 16 GB chip
    # alongside the ~6.3 GB train state, and a crash/timeout must never
    # cost the serving headline (it is already printed above). The
    # subprocess timeout is the REMAINING budget, not a flat constant.
    train_bs = 8
    if have_time("train"):
        try:
            import re
            import subprocess

            root = os.path.dirname(os.path.abspath(__file__))
            tool = os.path.join(root, "tools", "train_breakdown.py")
            # APPEND to PYTHONPATH: clobbering it would drop this
            # environment's sitecustomize dir and with it the TPU backend
            # registration. Only add the separator when there is an
            # existing value (a trailing ':' puts CWD on the child's path).
            env = dict(os.environ)
            old = env.get("PYTHONPATH", "")
            env["PYTHONPATH"] = root + ((os.pathsep + old) if old else "")
            proc = subprocess.run(
                [sys.executable, tool, "--only", "step",
                 "--batch", str(train_bs), "--steps", "5", "--repeats", "3"],
                timeout=max(remaining(), 30), capture_output=True,
                text=True, env=env)
            m = re.search(r"\(([\d.]+) samples/s\)", proc.stdout)
            if m:
                train_sps = float(m.group(1))
                note(f"train bs{train_bs} measured: "
                     f"{train_sps:.2f} samples/s")
                out["train_samples_per_sec_per_chip"] = round(train_sps, 3)
                out["train_batch_size"] = train_bs
                tb = _train_baseline_at(train_bs)
                if tb is not None:
                    out["train_vs_baseline"] = round(train_sps / tb, 3)
                    out["train_baseline_samples_per_sec"] = round(tb, 3)
                _emit(out)
            else:
                note(f"train point: no sample line (rc={proc.returncode})")
        except Exception as e:  # pragma: no cover - device-side failures
            note(f"train point failed: {type(e).__name__}: {e}")

    note(f"done at +{time.perf_counter() - T0:.0f}s "
         f"(budget {budget_s:.0f}s)")


if __name__ == "__main__":
    main()
