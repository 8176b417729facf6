#!/usr/bin/env python3
"""Segment .npy sample dicts (CLI parity with the reference
tools/test_npy.py: input files are numpy dicts with 'rgb', 'depth', and
optionally 'debug_info' carrying intrinsics).

Example:
  python tools/test_npy.py --imgdir samples/ --network seg_resnet34_8s_embedding \
      --pretrained ckpt.pth
"""

import argparse

import _init_paths  # noqa: F401  (repo-root import bootstrap)
import glob
import os
import sys

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(
        description="Segment unseen objects in .npy RGB-D dumps (TPU)")
    parser.add_argument("--gpu", dest="gpu_id", type=int, default=0)
    parser.add_argument("--pretrained", type=str, default=None)
    parser.add_argument("--pretrained_crop", type=str, default=None)
    parser.add_argument("--cfg", dest="cfg_file", type=str, default=None)
    parser.add_argument("--imgdir", type=str, required=True)
    parser.add_argument("--outdir", type=str, default=None)
    parser.add_argument("--network", dest="network_name", type=str,
                        default="seg_resnet34_8s_embedding")
    parser.add_argument("--fast", action="store_true")
    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit(1)
    return parser.parse_args()


def read_npy_sample(path):
    """Decode one .npy dump into (rgb u8 BGR, depth_m float|None,
    (fx, fy, px, py)).

    Two dump flavors, mirroring the reference (tools/test_npy.py:105-122):
    'debug_info' carries a 3x3 intrinsics matrix, an already-in-meters
    depth image and the rgb; the plain flavor stores uint16 MILLIMETER
    depth that must be /1000'd.
    """
    data = np.load(path, allow_pickle=True, encoding="latin1").item()
    if "debug_info" in data:
        info = data["debug_info"]
        rgb = info["rgb"]
        depth_m = info["depth_image"]
        k = np.asarray(info["intrinsics"], np.float64)
        fx, fy = float(k[0, 0]), float(k[1, 1])
        px, py = float(k[0, 2]), float(k[1, 2])
    else:
        rgb = data["rgb"]  # BGR uint8 HWC
        depth = data.get("depth")
        depth_m = (depth.astype(np.float32) / 1000.0
                   if depth is not None else None)
        fx = fy = 616.0
        px, py = rgb.shape[1] / 2.0, rgb.shape[0] / 2.0
    return rgb, depth_m, (fx, fy, px, py)


def main():
    args = parse_args()
    from unseenobjectclustering_tpu.utils.profiling import (
        enable_persistent_compile_cache)
    enable_persistent_compile_cache()
    import jax.numpy as jnp

    from unseenobjectclustering_tpu.config import FAST_CLUSTER, Config
    from unseenobjectclustering_tpu.data.datasets import compute_xyz_np
    from unseenobjectclustering_tpu.engine.builder import build_segmentor

    cfg = (Config.from_yaml(args.cfg_file) if args.cfg_file
           else Config.inference_default())  # shipped-recipe defaults
    cfg = cfg.replace(MODE="TEST")
    if args.fast:
        cfg = cfg.replace(CLUSTER=dict(FAST_CLUSTER))

    files = sorted(glob.glob(os.path.join(args.imgdir, "*.npy")))
    if not files:
        print(f"no .npy files under {args.imgdir}")
        sys.exit(1)
    outdir = args.outdir or args.imgdir
    os.makedirs(outdir, exist_ok=True)

    pixel_means = cfg.pixel_means / 255.0
    segmentor = None
    for path in files:
        rgb, depth_m, (fx, fy, px, py) = read_npy_sample(path)
        h, w = rgb.shape[:2]

        if segmentor is None:
            segmentor = build_segmentor(
                cfg, args.network_name, pretrained=args.pretrained,
                pretrained_crop=args.pretrained_crop, height=h, width=w,
                depth_threshold=0.8,
                model_dtype=jnp.bfloat16 if args.fast else None)

        image = (rgb.astype(np.float32) / 255.0 - pixel_means)[None]
        xyz = None
        if depth_m is not None and cfg.INPUT in ("DEPTH", "RGBD"):
            xyz = compute_xyz_np(depth_m.astype(np.float32), fx, fy, px,
                                 py)[None]
        res = segmentor.segment(image, xyz,
                                refine=args.pretrained_crop is not None)
        labels = (res.labels_refined if res.labels_refined is not None
                  else res.labels)[0]
        out = os.path.join(
            outdir, os.path.basename(path).replace(".npy", "-label.npy"))
        np.save(out, labels)
        print(f"{path}: {len(np.unique(labels)) - 1} objects -> {out}")


if __name__ == "__main__":
    main()
