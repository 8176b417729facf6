#!/usr/bin/env python3
"""Browse TableTop Object Dataset samples (parity with the reference
tools/view_tabletop_data.py) — saves per-sample visualization grids.

Example:
  python tools/view_tabletop_data.py --dataset_root data/tabletop \
      --num 4 --outdir viz/
"""

import argparse
import os

import _init_paths  # noqa: F401

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="View TOD samples")
    parser.add_argument("--dataset", dest="dataset_name", type=str,
                        default="tabletop_object_train")
    parser.add_argument("--dataset_root", type=str, default=None)
    parser.add_argument("--cfg", dest="cfg_file", type=str, default=None)
    parser.add_argument("--num", type=int, default=8)
    parser.add_argument("--outdir", type=str, default="viz")
    args = parser.parse_args()

    import matplotlib
    matplotlib.use("Agg")

    from unseenobjectclustering_tpu.config import Config
    from unseenobjectclustering_tpu.data import get_dataset
    from unseenobjectclustering_tpu.utils.visualization import (
        segmentation_grid)

    cfg = (Config.from_yaml(args.cfg_file) if args.cfg_file
           else Config.default())
    cfg = cfg.replace(MODE="TEST")
    dataset = get_dataset(args.dataset_name, cfg, path=args.dataset_root)
    os.makedirs(args.outdir, exist_ok=True)

    pixel_means = cfg.pixel_means
    for i in range(min(args.num, len(dataset))):
        s = dataset[i]
        # denormalize for display
        im = ((s["image_color"] + pixel_means / 255.0) * 255.0)
        im = np.clip(im, 0, 255).astype(np.uint8)
        lab = np.maximum(s["label"], 0)
        fig = segmentation_grid(im, s.get("depth"), None, lab)
        out = os.path.join(args.outdir, f"sample_{i:05d}.png")
        fig.savefig(out, dpi=100)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
