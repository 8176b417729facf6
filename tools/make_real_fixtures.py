#!/usr/bin/env python
"""Write rendered scenes into REAL OCID/OSD on-disk layouts (readiness drill).

Zero egress means the real OCID/OSD archives can never enter this container,
so this tool materializes their exact wire formats from the procedural
renderer instead: indexed-PNG labels with the datasets' id conventions and
organized binary_compressed PCDs (LZF, the format PCL writes and the real
datasets ship — reference readers: lib/datasets/ocid_object.py:43-112,
lib/datasets/osd_object.py:60-88).  A machine WITH the real data then needs
zero code changes: the same `tools/test_net.py --dataset ocid_object_test
--dataset_root <root>/OCID` command runs either tree.

OCID conventions exercised (lib/datasets/ocid_object.py:86-95):
  - label 1 is the support plane -> background,
  - in sequences whose path contains 'table', label 2 is ALSO background,
  - objects follow (2+ on floor sequences, 3+ on table sequences),
  - PCDs are organized 640x480 clouds with NaNs at invalid depth.
OSD conventions (lib/datasets/osd_object.py:60-88): image_color/ +
annotation/ (objects 1..K directly) + pcd/.

Usage:
  python tools/make_real_fixtures.py --root output/fixtures --num 20
  python tools/test_net.py --network seg_resnet34_8s_embedding \
      --dataset ocid_object_test --dataset_root output/fixtures/OCID \
      --pretrained <ckpt>
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_ocid(root, ds, indices, *, compressed=True):
    """OCID tree: ARID20/{floor/seq01,table/seq02}/{rgb,label,pcd}/."""
    import cv2

    from unseenobjectclustering_tpu.data.datasets import compute_xyz_np
    from unseenobjectclustering_tpu.utils.masks import imwrite_indexed

    half = (len(indices) + 1) // 2
    seqs = [("ARID20/floor/seq01", False, indices[:half]),
            ("ARID20/table/seq02", True, indices[half:])]
    for seq, is_table, idxs in seqs:
        for sub in ("rgb", "label", "pcd"):
            os.makedirs(os.path.join(root, seq, sub), exist_ok=True)
        for i in idxs:
            bgr, depth_mm, gt = ds.get_scene(i)
            name = f"result_2026_{i:04d}.png"
            cv2.imwrite(os.path.join(root, seq, "rgb", name), bgr)

            # id conventions: plane=1 (+ table seqs reserve 2), objects after
            shift = 2 if is_table else 1
            lab = np.where(gt > 0, gt + shift, 1).astype(np.uint8)
            if is_table:
                # a second support-plane strip carrying id 2 (the remap the
                # loader must erase on 'table' paths)
                strip = (gt == 0) & (np.arange(gt.shape[0])[:, None]
                                     > gt.shape[0] * 3 // 4)
                lab[strip] = 2
            imwrite_indexed(os.path.join(root, seq, "label", name), lab)

            depth = depth_mm.astype(np.float32) / 1000.0
            xyz = compute_xyz_np(depth, ds.f, ds.f, ds.cx, ds.cy)
            xyz[depth == 0] = np.nan  # organized-cloud invalid points
            from unseenobjectclustering_tpu.data.pcd import save_pcd_xyz
            save_pcd_xyz(os.path.join(root, seq, "pcd",
                                      name.replace("png", "pcd")),
                         xyz, compressed=compressed)


def write_osd(root, ds, indices, *, compressed=True):
    """OSD tree: image_color/ + annotation/ + pcd/."""
    import cv2

    from unseenobjectclustering_tpu.data.datasets import compute_xyz_np
    from unseenobjectclustering_tpu.data.pcd import save_pcd_xyz
    from unseenobjectclustering_tpu.utils.masks import imwrite_indexed

    for sub in ("image_color", "annotation", "pcd"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in indices:
        bgr, depth_mm, gt = ds.get_scene(i)
        name = f"learn{i:02d}.png"
        cv2.imwrite(os.path.join(root, "image_color", name), bgr)
        imwrite_indexed(os.path.join(root, "annotation", name),
                        gt.astype(np.uint8))
        depth = depth_mm.astype(np.float32) / 1000.0
        xyz = compute_xyz_np(depth, ds.f, ds.f, ds.cx, ds.cy)
        xyz[depth == 0] = np.nan
        save_pcd_xyz(os.path.join(root, "pcd", name.replace("png", "pcd")),
                     xyz, compressed=compressed)


def main():
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--root", default="output/fixtures")
    p.add_argument("--num", type=int, default=20)
    p.add_argument("--dataset", default="both",
                   choices=["ocid", "osd", "both"])
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--start", type=int, default=100,
                   help="first test-split scene index (keep clear of the "
                        "50-scene eval prefix so metrics stay held-out)")
    p.add_argument("--uncompressed", action="store_true",
                   help="write plain binary PCDs instead of "
                        "binary_compressed")
    args = p.parse_args()

    from unseenobjectclustering_tpu.config import Config
    from unseenobjectclustering_tpu.data.synthetic import (
        SyntheticTabletopDataset)

    cfg = Config.from_dict({"INPUT": "RGBD", "MODE": "TEST"})
    ds = SyntheticTabletopDataset("test", cfg, height=args.height,
                                  width=args.width,
                                  size=args.start + args.num)
    idxs = list(range(args.start, args.start + args.num))
    comp = not args.uncompressed
    if args.dataset in ("ocid", "both"):
        write_ocid(os.path.join(args.root, "OCID"), ds, idxs,
                   compressed=comp)
        print(f"OCID tree: {args.root}/OCID ({len(idxs)} images, "
              f"{'binary_compressed' if comp else 'binary'} PCDs)")
    if args.dataset in ("osd", "both"):
        write_osd(os.path.join(args.root, "OSD"), ds, idxs, compressed=comp)
        print(f"OSD tree: {args.root}/OSD ({len(idxs)} images)")


if __name__ == "__main__":
    main()
