#!/usr/bin/env python3
"""Segment a directory of RGB-D images (CLI parity with the reference
tools/test_images.py:138-225).

Expects `<imgdir>/*-color.png` + `*-depth.png` pairs and an optional
`<imgdir>/camera_params.json`; writes `<name>-label.png` (and a color
overlay) next to the inputs or under --outdir.

Example:
  python tools/test_images.py --imgdir data/demo \
      --network seg_resnet34_8s_embedding \
      --pretrained ckpt.pth --pretrained_crop ckpt_crop.pth
"""

import argparse

import _init_paths  # noqa: F401  (repo-root import bootstrap)
import glob
import json
import os
import sys

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(
        description="Segment unseen objects in RGB-D images (TPU)")
    parser.add_argument("--gpu", dest="gpu_id", type=int, default=0)
    parser.add_argument("--pretrained", type=str, default=None)
    parser.add_argument("--pretrained_crop", type=str, default=None)
    parser.add_argument("--cfg", dest="cfg_file", type=str, default=None)
    parser.add_argument("--imgdir", type=str, required=True)
    parser.add_argument("--outdir", type=str, default=None)
    parser.add_argument("--network", dest="network_name", type=str,
                        default="seg_resnet34_8s_embedding")
    parser.add_argument("--depth_factor", type=float, default=1000.0,
                        help="depth png value per meter")
    parser.add_argument("--fast", action="store_true")
    parser.add_argument("--vis", action="store_true",
                        help="also save color overlay images")
    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit(1)
    return parser.parse_args()


def read_sample(color_file: str, depth_file: str, depth_factor: float):
    """Read one RGB-D pair (tools/test_images.py:96-135 semantics)."""
    import cv2

    im = cv2.imread(color_file)
    if im is None:
        raise IOError(f"cannot read color image {color_file} "
                      "(missing or corrupt; cv2.imread returned None)")
    depth = None
    if depth_file and os.path.exists(depth_file):
        raw = cv2.imread(depth_file, cv2.IMREAD_ANYDEPTH)
        if raw is None:
            raise IOError(f"cannot read depth image {depth_file} "
                          "(corrupt; cv2.imread returned None)")
        depth = raw.astype(np.float32) / depth_factor
    return im, depth


def main():
    args = parse_args()
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
    from unseenobjectclustering_tpu.utils.masks import (get_color_mask,
                                                        visualize_segmentation)

    cfg = (Config.from_yaml(args.cfg_file) if args.cfg_file
           else Config.inference_default())  # shipped-recipe defaults
    cfg = cfg.replace(MODE="TEST")
    if args.fast:
        cfg = cfg.replace(CLUSTER=dict(FAST_CLUSTER))

    color_files = sorted(glob.glob(os.path.join(args.imgdir, "*-color.png")))
    if not color_files:
        print(f"no *-color.png files under {args.imgdir}")
        sys.exit(1)
    params_file = os.path.join(args.imgdir, "camera_params.json")
    if os.path.exists(params_file):
        with open(params_file) as f:
            params = json.load(f)
    else:  # Intel RealSense D415 defaults (ros/test_images_segmentation.py)
        params = {"fx": 616.0, "fy": 616.0, "x_offset": 310.0,
                  "y_offset": 240.0}
    fx, fy, px, py = camera_params_to_arrays(params)

    outdir = args.outdir or args.imgdir
    os.makedirs(outdir, exist_ok=True)

    segmentor = None
    pixel_means = cfg.pixel_means / 255.0
    for color_file in color_files:
        depth_file = color_file.replace("-color.png", "-depth.png")
        im, depth = read_sample(color_file, depth_file, args.depth_factor)
        h, w = im.shape[:2]
        if segmentor is None:
            segmentor = build_segmentor(
                cfg, args.network_name, pretrained=args.pretrained,
                pretrained_crop=args.pretrained_crop, height=h, width=w,
                depth_threshold=0.8,
                model_dtype=jnp.bfloat16 if args.fast else None)

        image = (im.astype(np.float32) / 255.0 - pixel_means)[None]
        xyz = None
        if depth is not None and cfg.INPUT in ("DEPTH", "RGBD"):
            xyz = compute_xyz_np(depth, fx, fy, px, py)[None]

        res = segmentor.segment(image, xyz,
                                refine=args.pretrained_crop is not None)
        labels = (res.labels_refined if res.labels_refined is not None
                  else res.labels)[0]

        base = os.path.basename(color_file).replace("-color.png", "")
        out_label = os.path.join(outdir, base + "-label.png")
        cv2.imwrite(out_label, labels.astype(np.uint8))
        if args.vis:
            overlay = visualize_segmentation(im, labels)
            cv2.imwrite(os.path.join(outdir, base + "-seg.png"), overlay)
            cv2.imwrite(os.path.join(outdir, base + "-mask.png"),
                        get_color_mask(labels))
        n = len(np.unique(labels)) - 1
        print(f"{color_file}: {n} objects -> {out_label} "
              f"({res.timing['total']:.2f}s)")


if __name__ == "__main__":
    main()
