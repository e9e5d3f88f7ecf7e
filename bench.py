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
  * the whole run is budgeted (BENCH_BUDGET_S, default 1100 s after the
    device probe): each optional phase (serving batch, train point, int8)
    is skipped if the remaining budget can't cover its expected cost. The
    budget sequences PRIORITIES (bs-16 serve > train > int8); running
    past the driver's wall clock is safe because every line already
    printed is complete — the driver parses the tail;
  * expected phase costs are SCALED by the measured bs-1 build time
    relative to its historical norm — compile latency through this
    environment's tunnel varies several-fold across the day (measured
    79 s..775 s for the same bs-1 program), so a slow-tunnel round skips
    phases up front — honestly flagged — instead of stalling mid-compile.

STARTUP COST CONTROLS (round-5 decomposition, tools-era breakdown on an
idle host: model.init 536 s, run_n persistent-cache HIT 387 s, measure
1.1 s):
  * the PERSISTENT XLA CACHE IS NOT USED here: the tunnel backend
    compiles server-side from the shipped HLO, so a fresh compile moves
    megabytes, while a cache hit must upload the serialized executable
    (70 MB for bs-1 run_n) at the measured ~200 KB/s — a cache hit is
    4-5x SLOWER than recompiling (387 s vs ~80 s). Opt back in with
    DREAMVLA_BENCH_COMPILE_CACHE=1 on a fast-local-device install.
  * params are NOT model.init'd (536 s of init-program compile + blob
    shuttle): throughput does not depend on weight values, so the bench
    builds the exact param tree via jax.eval_shape (host-only) and fills
    it on-device with a constant — a broadcast program that compiles in
    seconds. DREAMVLA_BENCH_REAL_INIT=1 restores the real initializer
    (measured: identical chunks/s, see CAPABILITIES.md).

Alongside the serving numbers, one TRAIN-step throughput point (bs-8 full
step: fwd + 7-loss sum + bwd + clip + AdamW) is measured in-process after
the serving headline is safely emitted (tools/train_breakdown.py
methodology: N steps per dispatch, donated carried state) and reported as
train_samples_per_sec_per_chip against a baseline re-derived AT THE
MEASURED BATCH from BASELINE.json.derived_train's floors (launch floor is
batch-independent, compute floor scales linearly with batch) —
best-effort, never allowed to cost the serving headline.

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

# Historical per-phase costs through the tunnel at its FAST state
# (round-3 stderr trail, no persistent cache: bs16 build+measure ~106 s,
# int8 bs32 ~218 s, int8 bs1 ~113 s; train-step compile ~5 min,
# CAPABILITIES.md). A phase is attempted only if the remaining budget
# covers ~1.3x its cost, SCALED by the measured bs-1 build time relative
# to the fast-tunnel norm — tunnel compile latency varies several-fold
# across the day, so a slow round degrades by skipping phases up front
# with the slowdown recorded in the emitted line.
PHASE_COST_S = {"serve": 110, "train": 310, "int8_serve": 230,
                "int8_bs1": 130}
NORM_BS1_BUILD_S = 90.0  # fast-tunnel bs-1 compile (round-3: ~79 s)

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


def warmup(run_n, warm, params):
    """One untimed dispatch: triggers (or hits) the XLA compile."""
    import jax

    img_hist0, cls_hist0 = warm
    float(run_n(params, img_hist0, cls_hist0, jax.random.PRNGKey(7)))


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


def build_params(model, cfg, inputs, rngs):
    """The bench param tree WITHOUT running the real initializer.

    jax.eval_shape traces model.init on the host (no device work, no
    compile) to get the exact tree-of-shapes, which one trivial broadcast
    program fills with a constant on-device. Throughput is independent of
    weight values (no data-dependent control flow on TPU);
    DREAMVLA_BENCH_REAL_INIT=1 swaps the real initializer back in.
    bf16 for matrices / f32 for vectors matches the serving cast below.
    """
    import jax
    import jax.numpy as jnp

    if os.environ.get("DREAMVLA_BENCH_REAL_INIT", "") == "1":
        variables = model.init(rngs, **inputs)
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 and x.ndim >= 2 else x,
            variables["params"])

    shapes = jax.eval_shape(lambda: model.init(rngs, **inputs))["params"]

    @jax.jit
    def fill():
        return jax.tree.map(
            lambda s: jnp.full(
                s.shape, 0.01,
                jnp.bfloat16 if (s.dtype == jnp.float32 and s.ndim >= 2)
                else s.dtype),
            shapes)

    return fill()


def main():
    signal.signal(signal.SIGTERM, _on_sigterm)
    atexit.register(_flush_on_exit)
    _device_watchdog()

    if os.environ.get("DREAMVLA_BENCH_COMPILE_CACHE", "") == "1":
        # opt-in only: through the axon tunnel a persistent-cache HIT is
        # slower than recompiling (see module docstring)
        from dreamvla_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from dreamvla_tpu.config import calvin_finetune
    from dreamvla_tpu.models.dreamvla import DreamVLA

    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1100"))
    T0 = time.perf_counter()

    def remaining():
        return budget_s - (time.perf_counter() - T0)

    def note(msg):
        print(f"[bench +{time.perf_counter() - T0:.0f}s] {msg}",
              file=sys.stderr, flush=True)

    # Phase costs scale with the measured tunnel state. The bs-1 build is
    # a BIASED probe — it carries the one-time server-side compiler
    # bootstrap (round-5 validation: bs-1 built in 276 s, the next program
    # in the SAME process in 24 s) — so its ratio is capped for gating the
    # first optional phase, and the scale is re-anchored on that phase's
    # actual (bootstrap-free) cost as soon as it completes.
    cost_scale = [1.0]

    def have_time(phase):
        need = PHASE_COST_S[phase] * cost_scale[0] * 1.15
        ok = remaining() > need
        if not ok:
            note(f"{phase}: skipped ({remaining():.0f}s left < "
                 f"{need:.0f}s needed at tunnel cost scale "
                 f"{cost_scale[0]:.1f}x)")
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
    # init in train mode so the DiT head's params are created too; bf16
    # matrices = standard serving practice (halves weight reads)
    t_init0 = time.perf_counter()
    params_raw = build_params(
        model, cfg,
        dict(image_primary=ip, image_wrist=iw, state=st, text_tokens=tt,
             action_label=action_label, mode="train", train=False),
        {"params": jax.random.PRNGKey(0),
         "diffusion": jax.random.PRNGKey(1)})
    # serving layout: trunk (24) + encoder (12) layers stacked so each
    # fused kernel runs once under lax.scan — bit-equal to unrolled
    # (tests/test_gpt2_fused, test_vit_fused), ~depth-fold smaller
    # executables => proportionally cheaper tunnel compiles. params_raw
    # stays alive for the int8 phase (quantization walks per-layer trees).
    from dreamvla_tpu.ops.gpt2_fused import stack_trunk_params
    from dreamvla_tpu.ops.vit_fused import stack_encoder_params

    params = stack_encoder_params(stack_trunk_params(params_raw))
    jax.block_until_ready(params)
    init_s = time.perf_counter() - t_init0

    baseline = _baseline()

    # ---- phase 1 (mandatory): bs-1 bf16 — emit the headline IMMEDIATELY.
    # The build+warmup time doubles as the tunnel-speed probe: the same
    # program compiles in ~79 s at the tunnel's fast state and 300+ s at
    # its slow state; every later phase is compile-dominated the same way.
    t_build0 = time.perf_counter()
    run1, warm1 = build_run_n(model, params, 1, STEPS_PER_DISPATCH)
    warmup(run1, warm1, params)
    bs1_build_s = time.perf_counter() - t_build0
    cost_scale[0] = min(max(1.0, bs1_build_s / NORM_BS1_BUILD_S), 2.0)
    note(f"bs1 built in {bs1_build_s:.0f}s (init {init_s:.0f}s, "
         f"phase cost scale {cost_scale[0]:.1f}x capped)")
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
        "bs1_build_s": round(bs1_build_s, 1),
        "init_s": round(init_s, 1),
        "baseline_chunks_per_sec": baseline,
        "baseline_method": "derived (tools/anchor_baseline.py)",
    }
    _emit(out)

    # ---- phase 2 (optional): best bf16 serving batch
    serve = {}
    serve_steps = max(STEPS_PER_DISPATCH // 4, 5)
    if have_time("serve"):
        try:
            t_phase0 = time.perf_counter()
            runb, warmb = build_run_n(model, params, SERVE_BATCH,
                                      serve_steps)
            note(f"bs{SERVE_BATCH} built")
            # repeats=3: each dispatch costs a tunnel RTT (~18 s at the
            # tunnel's slow state) that dwarfs the on-device time; the
            # batched points have been stable across rounds (190.8/190.1/
            # 191.2), so 3 samples suffice
            t_serve = measure(runb, warmb, params, serve_steps, repeats=3)
            serve[SERVE_BATCH] = SERVE_BATCH / t_serve
            # re-anchor the tunnel scale on this phase's bootstrap-free cost
            cost_scale[0] = max(1.0, (time.perf_counter() - t_phase0)
                                / PHASE_COST_S["serve"])
            note(f"bs{SERVE_BATCH} measured: "
                 f"{serve[SERVE_BATCH]:.1f} chunks/s "
                 f"(cost scale re-anchored {cost_scale[0]:.1f}x)")
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

    # ---- phase 3 (optional): train-step throughput point (bs-8 full
    # step: fwd + 7-loss sum + bwd + clip + AdamW), IN-PROCESS. It used to
    # run in a tools/train_breakdown.py subprocess, but a fresh process
    # re-pays the ~200 s tunnel compiler bootstrap; in-process it costs
    # only its own compile. Safe ordering: the serving headline is already
    # emitted (a crash here loses nothing — atexit re-flush), the serving
    # executables are freed first for HBM headroom, and the train state is
    # freed before the int8 phases below.
    train_bs = 8
    if have_time("train"):
        try:
            import dataclasses
            import functools
            import gc

            from dreamvla_tpu.parallel.train_step import (build_train_step,
                                                          create_train_state)
            from dreamvla_tpu.utils.testing import make_synthetic_batch

            del run1, warm1
            gc.collect()
            _, tcfg = calvin_finetune()
            tcfg = dataclasses.replace(tcfg, batch_size=train_bs)
            tbatch = make_synthetic_batch(cfg, tcfg, batch=train_bs)
            state, tx, _ = create_train_state(
                model, tcfg, tbatch, jax.random.PRNGKey(0),
                total_steps=100, cheap_init=True)
            tbatch = jax.tree.map(jnp.asarray, tbatch)
            step = build_train_step(model, tcfg, tx, mesh=None, donate=False)
            n_tr = 5

            # N steps per dispatch + donated carried state, matching
            # tools/train_breakdown.py's methodology (accum axis = 1)
            @functools.partial(jax.jit, donate_argnums=(0,))
            def run_step(st, batch, r):
                def body(st, i):
                    micro = jax.tree.map(
                        lambda v: v[None],
                        dict(batch, images_primary=batch["images_primary"]
                             + i.astype(jnp.float32) * 1e-4))
                    st, losses = step(st, micro, jax.random.fold_in(r, i))
                    return st, losses.total
                st, tot = jax.lax.scan(body, st, jnp.arange(n_tr))
                return st, jnp.sum(tot)

            trng = jax.random.PRNGKey(7)
            t_tr0 = time.perf_counter()
            state, tot = run_step(state, tbatch, trng)
            float(tot)
            note(f"train bs{train_bs} built "
                 f"(+{time.perf_counter() - t_tr0:.0f}s)")
            ts = []
            for r in range(3):
                t_tr0 = time.perf_counter()
                state, tot = run_step(state, tbatch, trng)
                float(tot)
                ts.append((time.perf_counter() - t_tr0) / n_tr)
            train_sps = train_bs / float(np.median(ts))
            note(f"train bs{train_bs} measured: {train_sps:.2f} samples/s")
            out["train_samples_per_sec_per_chip"] = round(train_sps, 3)
            out["train_batch_size"] = train_bs
            tb = _train_baseline_at(train_bs)
            if tb is not None:
                out["train_vs_baseline"] = round(train_sps / tb, 3)
                out["train_baseline_samples_per_sec"] = round(tb, 3)
            _emit(out)
            del state, step, run_step, tbatch, tx
            gc.collect()
        except Exception as e:  # pragma: no cover - device-side failures
            note(f"train point failed: {type(e).__name__}: {e}")

    # ---- phase 4 (optional): int8 (W8A8) serving mode (trunk + encoder +
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

            params_q = quantize_encoder_params(
                quantize_trunk_params(params_raw))
            params_q["action_model"] = quantize_dit_params(
                params_q["action_model"])
            params_q = stack_encoder_params(stack_trunk_params(params_q))
            runq, warmq = build_run_n(model, params_q, int8_sb, serve_steps)
            note(f"int8 bs{int8_sb} built")
            t_q = measure(runq, warmq, params_q, serve_steps, repeats=3)
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
            int8_bs1 = measure(runq1, warmq1, params_q, STEPS_PER_DISPATCH,
                               repeats=3)
            note(f"int8 bs1 measured: {int8_bs1 * 1e3:.2f} ms")
            out["int8_bs1_latency_ms"] = round(int8_bs1 * 1e3, 3)
            _emit(out)
            del runq1, warmq1
        except Exception as e:  # pragma: no cover - device-side failures
            note(f"int8 bs1 failed: {type(e).__name__}: {e}")

    note(f"done at +{time.perf_counter() - T0:.0f}s "
         f"(budget {budget_s:.0f}s)")


if __name__ == "__main__":
    main()
