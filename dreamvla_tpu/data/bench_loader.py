"""Dataloader timing smoke tool.

Capability parity with the reference's hidden loader benchmark
(`utils/data_utils.py:3608-3630` __main__): time batch loading over a few
epochs' worth of steps and print batches/sec + samples/sec. Also reports
native-loader availability.

    python -m dreamvla_tpu.data.bench_loader /data/task_ABC_D --batch_size 4
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("root", help="CALVIN dataset root (training/ inside)")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--window_size", type=int, default=13)
    p.add_argument("--act_step", type=int, default=3)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--packed", default=None,
                   help="packed cache dir (data/packed_cache.py): measure "
                        "the sequential-read path instead of per-frame npz")
    p.add_argument("--image_mode", default="u8", choices=("u8", "f32"),
                   help="packed-path host contract (u8 = on-device decode)")
    args = p.parse_args()

    from dreamvla_tpu.data import native_loader
    from dreamvla_tpu.data.calvin import get_calvin_dataset
    from dreamvla_tpu.data.packed_cache import get_packed_calvin_dataset

    print(f"native loader: {'yes' if native_loader.available() else 'no'}")
    if args.packed:
        info = get_packed_calvin_dataset(
            args.root, args.packed, batch_size=args.batch_size,
            window_size=args.window_size, act_step=args.act_step,
            num_workers=args.num_workers, image_mode=args.image_mode)
    else:
        info = get_calvin_dataset(args.root, batch_size=args.batch_size,
                                  window_size=args.window_size,
                                  act_step=args.act_step,
                                  num_workers=args.num_workers)
    info.set_epoch(0)
    it = iter(info.dataloader)
    next(it)  # warm the prefetch pipeline
    t0 = time.perf_counter()
    n = 0
    for batch in it:
        n += 1
        if n >= args.steps:
            break
    dt = time.perf_counter() - t0
    print(f"{n} batches in {dt:.2f}s -> {n / dt:.2f} batches/s, "
          f"{n * args.batch_size / dt:.2f} samples/s")


if __name__ == "__main__":
    main()
