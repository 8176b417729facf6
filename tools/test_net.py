#!/usr/bin/env python3
"""Evaluate a network on OCID / OSD / TOD-test (CLI parity with the
reference tools/test_net.py:24-131).

Example:
  python tools/test_net.py --network seg_resnet34_8s_embedding \
      --dataset ocid_object_test --cfg experiments/cfgs/..._ocid.yml \
      --pretrained ckpt.pth --pretrained_crop ckpt_crop.pth
"""

import argparse

import _init_paths  # noqa: F401  (repo-root import bootstrap)
import pprint
import sys

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(
        description="Test an unseen-object clustering network (TPU)")
    parser.add_argument("--gpu", dest="gpu_id", type=int, default=0,
                        help="kept for script compatibility (unused)")
    parser.add_argument("--pretrained", type=str, default=None)
    parser.add_argument("--pretrained_crop", type=str, default=None)
    parser.add_argument("--cfg", dest="cfg_file", type=str, default=None)
    parser.add_argument("--dataset", dest="dataset_name", type=str,
                        default="ocid_object_test")
    parser.add_argument("--dataset_root", type=str, default=None)
    parser.add_argument("--rand", dest="randomize", action="store_true")
    parser.add_argument("--network", dest="network_name", type=str,
                        default="seg_resnet34_8s_embedding")
    parser.add_argument("--network_crop", dest="crop_network_name",
                        type=str, default=None,
                        help="zoom-in backbone factory (default: same as "
                             "--network; e.g. seg_resnet18_8s_embedding "
                             "for a lighter stage 2)")
    parser.add_argument("--max_images", type=int, default=None)
    parser.add_argument("--crop_size", type=int, default=None,
                        help="override zoom-in crop resolution (default "
                             "cfg.TRAIN.SYN_CROP_SIZE=224; smaller is a "
                             "fast-mode option, e.g. 128)")
    parser.add_argument("--fast", action="store_true",
                        help="bfloat16 conv stack + subsampled seeding")
    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit(1)
    return parser.parse_args()


def main():
    args = parse_args()
    from unseenobjectclustering_tpu.utils.profiling import (
        enable_persistent_compile_cache)
    enable_persistent_compile_cache()
    print("Called with args:")
    print(args)

    import jax.numpy as jnp

    from unseenobjectclustering_tpu.config import (FAST_CLUSTER, Config, get_output_dir)
    from unseenobjectclustering_tpu.data import get_dataset
    from unseenobjectclustering_tpu.engine.builder import build_segmentor
    from unseenobjectclustering_tpu.engine.evaluate import (
        depth_threshold_for, evaluate_dataset)

    cfg = (Config.from_yaml(args.cfg_file) if args.cfg_file
           else Config.inference_default())
    cfg = cfg.replace(MODE="TEST")
    if args.fast:
        cfg = cfg.replace(CLUSTER=dict(FAST_CLUSTER))
    if args.crop_size:
        cfg = cfg.replace(TRAIN={"SYN_CROP_SIZE": args.crop_size})
    print("Using config:")
    pprint.pprint(cfg.to_dict())

    if not args.randomize:
        np.random.seed(cfg.RNG_SEED)

    dataset = get_dataset(args.dataset_name, cfg, path=args.dataset_root)
    output_dir = get_output_dir(cfg, dataset.name)
    print(f"Output will be saved to `{output_dir}`")

    segmentor = build_segmentor(
        cfg, args.network_name, pretrained=args.pretrained,
        pretrained_crop=args.pretrained_crop,
        crop_network_name=args.crop_network_name,
        depth_threshold=depth_threshold_for(dataset.name),
        model_dtype=jnp.bfloat16 if args.fast else None)

    evaluate_dataset(dataset, segmentor, output_dir=output_dir,
                     refine=args.pretrained_crop is not None,
                     max_images=args.max_images)


if __name__ == "__main__":
    main()
