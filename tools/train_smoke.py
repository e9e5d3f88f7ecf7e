"""On-chip CLI train smoke: the full `dreamvla_tpu train` path end-to-end.

Exercises the path a user actually runs (reference train.py:40-292) on the
real chip with NO shortcuts: synthetic CALVIN-shaped data on disk -> packed
cache -> loader -> collator -> shard -> fused SPMD train step -> metric
logging -> orbax end-of-epoch save -> `--resume_from_checkpoint auto`
restart into a second epoch. Asserts the loss is finite and decreases
between the first and last logged step of epoch 0, and that the restart
resumes at epoch 1 rather than redoing epoch 0.

Everything tools/train_breakdown.py measures is the device step in
isolation; this script is the evidence the assembled CLI path works on
hardware (VERDICT r4 next-round item 7). Results are recorded in
CAPABILITIES.md.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/train_smoke.py \
        [--workdir /tmp/dv_smoke] [--batch_size 8] [--log_every 5]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, **kw):
    env = dict(os.environ)
    old = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = ROOT + ((os.pathsep + old) if old else "")
    print(f"[smoke] $ {' '.join(cmd)}", flush=True)
    return subprocess.run(cmd, env=env, text=True, capture_output=True, **kw)


def metric_lines(stdout: str):
    out = []
    for line in stdout.splitlines():
        if line.startswith("{") and '"loss/total"' in line:
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/dv_smoke")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--episodes", type=int, default=20)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--log_every", type=int, default=5)
    ap.add_argument("--fresh", action="store_true",
                    help="wipe the workdir (fixture + cache + checkpoints)")
    args = ap.parse_args()

    wd = args.workdir
    if args.fresh and os.path.isdir(wd):
        shutil.rmtree(wd)
    fix, packed, ckpt = (os.path.join(wd, n)
                         for n in ("fixture", "packed", "ckpt"))

    if not os.path.isdir(os.path.join(fix, "training")):
        r = run([sys.executable, os.path.join(ROOT, "tools",
                                              "make_calvin_fixture.py"),
                 fix, "--episodes", str(args.episodes),
                 "--frames_per_episode", str(args.frames), "--features"])
        assert r.returncode == 0, r.stderr[-2000:]
    if not os.path.isdir(packed):
        r = run([sys.executable, "-m", "dreamvla_tpu.cli", "pack_calvin",
                 "--data_root", fix, "--out_dir", packed,
                 "--sam_path", os.path.join(fix, "sam"),
                 "--track_path", os.path.join(fix, "tracks")])
        assert r.returncode == 0, r.stderr[-2000:]
    shutil.rmtree(ckpt, ignore_errors=True)

    train_cmd = [
        sys.executable, "-m", "dreamvla_tpu.cli", "train",
        "--preset", "calvin_finetune", "--finetune_type", "calvin",
        "--calvin_dataset", fix, "--packed_cache_dir", packed,
        "--batch_size", str(args.batch_size),
        "--workers", str(args.workers),
        "--save_checkpoint_path", ckpt, "--run_name", "smoke",
        "--save_checkpoint",  # end-of-epoch orbax saves (reference-style
        # opt-in gate; without it the auto-resume leg finds no checkpoint)
        "--resume_from_checkpoint", "auto",
        "--log_every", str(args.log_every),
    ]

    # ---- epoch 0: fresh run, one epoch, end-of-epoch orbax save
    t0 = time.time()
    r = run(train_cmd + ["--num_epochs", "1"])
    wall0 = time.time() - t0
    sys.stdout.write(r.stdout[-3000:])
    assert r.returncode == 0, r.stderr[-4000:]
    logs = metric_lines(r.stdout)
    assert logs, "no metric lines in epoch-0 stdout"
    first, last = logs[0], logs[-1]
    assert all(l["epoch"] == 0 for l in logs)
    assert last["loss/total"] == last["loss/total"], "NaN loss"
    assert last["loss/total"] < first["loss/total"], (
        f"loss did not decrease: {first['loss/total']} -> "
        f"{last['loss/total']}")
    sps = max(l.get("perf/samples_per_sec_per_chip", 0.0) for l in logs)
    print(f"[smoke] epoch 0 OK in {wall0:.0f}s: loss "
          f"{first['loss/total']:.4f} -> {last['loss/total']:.4f}, "
          f"peak {sps:.2f} samples/s/chip (incl. host feed + tunnel "
          "dispatch)", flush=True)

    # ---- auto-resume: same command, 2 epochs — must restore epoch-0 state
    # and train ONLY epoch 1
    t0 = time.time()
    r = run(train_cmd + ["--num_epochs", "2"])
    wall1 = time.time() - t0
    sys.stdout.write(r.stdout[-2000:])
    assert r.returncode == 0, r.stderr[-4000:]
    logs = metric_lines(r.stdout)
    assert logs and all(l["epoch"] == 1 for l in logs), (
        "auto-resume re-ran epoch 0: "
        f"epochs seen {sorted({l['epoch'] for l in logs})}")
    print(f"[smoke] auto-resume OK in {wall1:.0f}s: trained epoch 1 only, "
          f"loss {logs[0]['loss/total']:.4f} -> "
          f"{logs[-1]['loss/total']:.4f}", flush=True)
    print("[smoke] PASS", flush=True)


if __name__ == "__main__":
    main()
