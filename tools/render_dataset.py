#!/usr/bin/env python
"""Pre-render procedural synthetic scenes to an on-disk cache.

The reference trains on pre-rendered TOD directories (README.md:60-66); this
is the equivalent offline step for the in-container procedural renderer:
render each deterministic scene once, persist it, and let every later
training/eval run load from disk instead of re-ray-casting (~0.8 s/scene at
480x640 on this host).

Usage:
  python tools/render_dataset.py --cache-dir output/render_cache \
      --height 480 --width 640 --num 6000 [--split train]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cache-dir", default="output/render_cache")
    p.add_argument("--split", default="train", choices=["train", "test"])
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--num", type=int, default=6000)
    p.add_argument("--start", type=int, default=0)
    args = p.parse_args()

    from unseenobjectclustering_tpu.config import Config
    from unseenobjectclustering_tpu.data.synthetic import (
        SyntheticTabletopDataset)

    cfg = Config.from_dict({"INPUT": "RGBD", "MODE": "TRAIN"})
    ds = SyntheticTabletopDataset(
        args.split, cfg, height=args.height, width=args.width,
        size=args.num, cache_dir=args.cache_dir)
    ds._cache_cap = 0  # disk only; keep the prerender process small

    t0 = time.time()
    done = 0
    for i in range(args.start, args.num):
        if os.path.exists(ds._scene_path(i)):
            continue
        ds.get_scene(i)
        done += 1
        if done % 50 == 0:
            rate = done / (time.time() - t0)
            eta = (args.num - args.start - done) / max(rate, 1e-9)
            print(f"[{i + 1}/{args.num}] {rate:.2f} scenes/s, "
                  f"eta {eta / 60:.1f} min", flush=True)
    print(f"done: {done} rendered, {args.num - args.start - done} "
          f"already cached, {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
