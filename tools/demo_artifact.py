#!/usr/bin/env python
"""Qualitative regression artifact: segmentation overlays on the 9 real
RGB-D demo pairs shipped with the reference (data/demo/, README.md:56).

Runs the two-stage Segmentor on every demo image and writes ONE grid image
(rows = scenes; columns = color / stage-1 overlay / refined overlay) so
each round's sim-to-real behavior is reviewable at a glance.

Usage:
  python tools/demo_artifact.py --pretrained <ckpt-or-orbax-dir>
      [--pretrained_crop ...] [--imgdir /root/reference/data/demo]
      [--out docs/demo_overlays.png] [--fast]
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrained", type=str, default=None)
    p.add_argument("--pretrained_crop", type=str, default=None)
    p.add_argument("--network", dest="network_name", type=str,
                   default="seg_resnet34_8s_embedding")
    p.add_argument("--cfg", dest="cfg_file", type=str, default=None)
    p.add_argument("--imgdir", default="/root/reference/data/demo")
    p.add_argument("--out", default="docs/demo_overlays.png")
    p.add_argument("--scale", type=float, default=0.5)
    p.add_argument("--fast", action="store_true")
    p.add_argument("--crop_network", type=str, default=None,
                   help="zoom-in factory (e.g. seg_resnet18_8s_embedding)")
    p.add_argument("--crop_size", type=int, default=None)
    args = p.parse_args()
    from unseenobjectclustering_tpu.utils.profiling import (
        enable_persistent_compile_cache)
    enable_persistent_compile_cache()

    import cv2
    import jax.numpy as jnp

    from unseenobjectclustering_tpu.config import FAST_CLUSTER, Config
    from unseenobjectclustering_tpu.data.datasets import compute_xyz_np
    from unseenobjectclustering_tpu.engine.builder import build_segmentor
    from unseenobjectclustering_tpu.ops.preprocess import (
        camera_params_to_arrays)
    from unseenobjectclustering_tpu.utils.masks import visualize_segmentation

    if args.cfg_file:
        cfg = Config.from_yaml(args.cfg_file)
    else:
        cfg = Config.inference_default()  # shipped-recipe defaults
    cfg = cfg.replace(MODE="TEST")
    if args.fast:
        cfg = cfg.replace(CLUSTER=dict(FAST_CLUSTER))
    if args.crop_size:
        cfg = cfg.replace(TRAIN={"SYN_CROP_SIZE": args.crop_size})

    color_files = sorted(glob.glob(os.path.join(args.imgdir, "*-color.png")))
    if not color_files:
        sys.exit(f"no *-color.png under {args.imgdir}")
    params_file = os.path.join(args.imgdir, "camera_params.json")
    with open(params_file) as f:
        params = json.load(f)
    fx, fy, px, py = camera_params_to_arrays(params)

    pixel_means = cfg.pixel_means / 255.0
    segmentor = None
    rows = []
    counts = {}
    for color_file in color_files:
        im = cv2.imread(color_file)
        raw = cv2.imread(color_file.replace("-color.png", "-depth.png"),
                         cv2.IMREAD_ANYDEPTH)
        if im is None or raw is None:
            raise IOError(f"cannot read demo pair for {color_file} "
                          "(cv2.imread returned None)")
        depth = raw.astype(np.float32) / 1000.0
        h, w = im.shape[:2]
        if segmentor is None:
            segmentor = build_segmentor(
                cfg, args.network_name, pretrained=args.pretrained,
                pretrained_crop=args.pretrained_crop, height=h, width=w,
                depth_threshold=0.8,
                model_dtype=jnp.bfloat16 if args.fast else None,
                crop_network_name=args.crop_network)
        image = (im.astype(np.float32) / 255.0 - pixel_means)[None]
        xyz = compute_xyz_np(depth, fx, fy, px, py)[None]
        res = segmentor.segment(image, xyz,
                                refine=segmentor.model_crop is not None)
        cells = [im, visualize_segmentation(im, res.labels[0])]
        if res.labels_refined is not None:
            cells.append(visualize_segmentation(im, res.labels_refined[0]))
        rows.append(np.concatenate(cells, axis=1))
        n1 = len(np.unique(res.labels[0])) - 1
        counts[os.path.basename(color_file)] = n1
        print(f"{os.path.basename(color_file)}: {n1} stage-1 objects",
              flush=True)

    grid = np.concatenate(rows, axis=0)
    if args.scale != 1.0:
        grid = cv2.resize(grid, None, fx=args.scale, fy=args.scale)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    cv2.imwrite(args.out, grid)
    with open(args.out + ".json", "w") as f:
        json.dump({"pretrained": args.pretrained,
                   "stage1_instances": counts}, f, indent=1)
    print(f"wrote {args.out} ({grid.shape[1]}x{grid.shape[0]})")


if __name__ == "__main__":
    main()
