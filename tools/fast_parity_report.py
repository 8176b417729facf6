#!/usr/bin/env python
"""Fast-mode vs parity-mode quality report on a TRAINED checkpoint.

The production-fast configuration (bfloat16 similarity matmuls + stride-4
farthest-point seeding) deviates algorithmically from the reference-exact
path (lib/utils/mean_shift.py:128-189 scans every pixel in fp32).  This
tool quantifies the cost on real trained embeddings: it evaluates held-out
rendered scenes in BOTH modes with the same checkpoint and reports
Objects/Boundary F vs GT plus direct fast-vs-parity label agreement.

Usage:
  python tools/fast_parity_report.py --pretrained <orbax-dir-or-pth>
      [--scenes 50] [--height 480 --width 640] [--out docs/FAST_PARITY.md]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrained", required=True)
    p.add_argument("--cfg", dest="cfg_file", type=str, default=None)
    p.add_argument("--network", dest="network_name", type=str,
                   default="seg_resnet34_8s_embedding")
    p.add_argument("--scenes", type=int, default=50)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--out", default="docs/FAST_PARITY.md")
    p.add_argument("--subsample", type=int, default=8,
                   help="fast-mode farthest-point seeding stride "
                        "(8 = the production FAST_CLUSTER preset)")
    args = p.parse_args()

    import jax.numpy as jnp

    from unseenobjectclustering_tpu.config import Config
    from unseenobjectclustering_tpu.data.datasets import compute_xyz_np
    from unseenobjectclustering_tpu.data.synthetic import (
        SyntheticTabletopDataset)
    from unseenobjectclustering_tpu.engine.builder import build_segmentor
    from unseenobjectclustering_tpu.engine.evaluate import average_metrics
    from unseenobjectclustering_tpu.utils.evaluation import multilabel_metrics

    if args.cfg_file:
        base = Config.from_yaml(args.cfg_file).replace(MODE="TEST")
    else:
        base = Config.inference_default(INPUT="RGBD")
    ds = SyntheticTabletopDataset("test", base, height=args.height,
                                  width=args.width, size=args.scenes)

    modes = {
        "parity": base,
        "fast": base.replace(CLUSTER={"DTYPE": "bfloat16",
                                      "SEED_SUBSAMPLE": args.subsample}),
    }
    segs = {
        name: build_segmentor(cfg, args.network_name,
                              pretrained=args.pretrained,
                              height=args.height, width=args.width,
                              depth_threshold=0.8,
                              model_dtype=(jnp.bfloat16 if name == "fast"
                                           else None))
        for name, cfg in modes.items()
    }

    per_mode = {name: [] for name in modes}
    agrees = []
    pm = base.pixel_means.astype(np.float32) / 255.0
    for i in range(args.scenes):
        bgr, depth_mm, gt = ds.get_scene(i)
        img = (bgr.astype(np.float32) / 255.0 - pm)[None]
        xyz = compute_xyz_np(depth_mm.astype(np.float32) / 1000.0,
                             ds.f, ds.f, ds.cx, ds.cy)[None]
        labels = {}
        for name, seg in segs.items():
            res = seg.segment(img, xyz, refine=False)
            labels[name] = res.labels[0]
            per_mode[name].append(
                multilabel_metrics(labels[name], gt.astype(np.int32)))
        # direct agreement: same instance decomposition up to relabeling ->
        # measure as F between the two label images
        cross = multilabel_metrics(labels["fast"],
                                   labels["parity"].astype(np.int32))
        agrees.append(cross["Objects F-measure"])
        if (i + 1) % 10 == 0:
            print(f"[{i + 1}/{args.scenes}]", flush=True)

    avg = {name: average_metrics(ms) for name, ms in per_mode.items()}
    keys = ("Objects F-measure", "Boundary F-measure",
            "obj_detected_075_percentage")
    lines = [
        "# Fast-mode vs parity-mode on a trained checkpoint",
        "",
        f"Checkpoint: `{args.pretrained}`; {args.scenes} held-out rendered "
        f"scenes at {args.height}x{args.width}; stage-1 clustering.",
        "",
        f"| metric | parity (fp32, stride-1) | fast (bf16, "
        f"stride-{args.subsample}) | delta |",
        "|---|---|---|---|",
    ]
    for k in keys:
        pv, fv = avg["parity"][k], avg["fast"][k]
        lines.append(f"| {k} | {pv:.4f} | {fv:.4f} | {fv - pv:+.4f} |")
    lines += [
        "",
        f"Direct fast-vs-parity instance agreement (Objects F of fast "
        f"labels against parity labels): mean {np.mean(agrees):.4f}, "
        f"min {np.min(agrees):.4f}.",
    ]
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines[4:]))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
