#!/usr/bin/env python3
"""Print object-count statistics for a dataset (parity with the reference
tools/dataset_statistics.py).

Example:
  python tools/dataset_statistics.py --dataset ocid_object_test \
      --dataset_root data/OCID
"""

import argparse

import _init_paths  # noqa: F401

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Dataset statistics")
    parser.add_argument("--dataset", dest="dataset_name", type=str,
                        default="tabletop_object_train")
    parser.add_argument("--dataset_root", type=str, default=None)
    parser.add_argument("--cfg", dest="cfg_file", type=str, default=None)
    parser.add_argument("--max_images", type=int, default=None)
    args = parser.parse_args()

    from unseenobjectclustering_tpu.config import Config
    from unseenobjectclustering_tpu.data import get_dataset

    cfg = (Config.from_yaml(args.cfg_file) if args.cfg_file
           else Config.default())
    cfg = cfg.replace(MODE="TEST", INPUT="COLOR")  # labels only
    dataset = get_dataset(args.dataset_name, cfg, path=args.dataset_root)

    n = len(dataset) if args.max_images is None else min(len(dataset),
                                                         args.max_images)
    counts = []
    for i in range(n):
        sample = dataset[i]
        lab = sample["label"]
        counts.append(int(lab.max()))
    counts = np.array(counts)
    print(f"{dataset.name}: {n} images")
    print(f"objects/image: mean {counts.mean():.2f}, median "
          f"{np.median(counts):.1f}, min {counts.min()}, max {counts.max()}")
    hist = np.bincount(counts)
    for k, c in enumerate(hist):
        if c:
            print(f"  {k} objects: {c} images")


if __name__ == "__main__":
    main()
