#!/usr/bin/env python3
"""Real-image F-measures on the hand-annotated demo frames.

The reference ships 9 real RealSense RGB-D pairs (data/demo/,
README.md:56) but no GT masks, so every prior sim-to-real claim rested
on instance-count plausibility.  `tools/annotate_demo_gt.py` produced
human-verified instance masks for these frames (data/demo_gt/); this
tool closes the loop: it runs the two-stage Segmentor on each annotated
frame and reports per-frame + mean Objects F / Boundary F / %75
(utils/evaluation.py, metric parity with the reference's
lib/utils/evaluation.py:109-257) for stage-1 AND refined predictions.

Example:
  python tools/eval_demo_gt.py --fast \
      --pretrained output/synthetic_tabletop_fullres/synthetic_tabletop_train \
      --pretrained_crop output/synthetic_tabletop_crop128_r18/synthetic_tabletop_train \
      --crop_network seg_resnet18_8s_embedding --crop_size 128 \
      --report docs/REAL_DEMO_EVAL.md
"""

import argparse
import glob
import json
import os
import sys

import _init_paths  # noqa: F401  (repo-root import bootstrap)
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(
        description="Evaluate demo-frame predictions against hand GT")
    p.add_argument("--imgdir", type=str, default="/root/reference/data/demo")
    p.add_argument("--gtdir", type=str, default="data/demo_gt")
    p.add_argument("--pretrained", type=str, required=True)
    p.add_argument("--pretrained_crop", type=str, default=None)
    p.add_argument("--network", dest="network_name", type=str,
                   default="seg_resnet34_8s_embedding")
    p.add_argument("--crop_network", type=str, default=None)
    p.add_argument("--crop_size", type=int, default=None)
    p.add_argument("--cfg", dest="cfg_file", type=str, default=None)
    p.add_argument("--fast", action="store_true")
    p.add_argument("--refine_fallback", action="store_true",
                   help="keep stage-1 instances whose zoom-in clusters "
                        "were ALL vetoed (cfg.CLUSTER.REFINE_FALLBACK) "
                        "instead of deleting them (reference default)")
    p.add_argument("--depth_factor", type=float, default=1000.0)
    p.add_argument("--report", type=str, default=None,
                   help="write a markdown table + .json sidecar here")
    return p.parse_args()


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
    from unseenobjectclustering_tpu.utils.evaluation import multilabel_metrics

    cfg = (Config.from_yaml(args.cfg_file) if args.cfg_file
           else Config.inference_default())
    cfg = cfg.replace(MODE="TEST")
    if args.fast:
        cfg = cfg.replace(CLUSTER=dict(FAST_CLUSTER))
    if args.refine_fallback:
        cfg = cfg.replace(CLUSTER={"REFINE_FALLBACK": True})
    if args.crop_size:
        cfg = cfg.replace(TRAIN={"SYN_CROP_SIZE": args.crop_size})

    gt_files = sorted(glob.glob(os.path.join(args.gtdir, "*-label.png")))
    if not gt_files:
        sys.exit(f"no *-label.png GT under {args.gtdir}")
    with open(os.path.join(args.imgdir, "camera_params.json")) as fh:
        params = json.load(fh)
    fx, fy, px, py = camera_params_to_arrays(params)
    pixel_means = cfg.pixel_means / 255.0

    segmentor = None
    rows = []
    for gt_file in gt_files:
        name = os.path.basename(gt_file).replace("-label.png", "")
        im = cv2.imread(os.path.join(args.imgdir, f"{name}-color.png"))
        raw = cv2.imread(os.path.join(args.imgdir, f"{name}-depth.png"),
                         cv2.IMREAD_ANYDEPTH)
        gt = cv2.imread(gt_file, cv2.IMREAD_GRAYSCALE).astype(np.int32)
        depth = raw.astype(np.float32) / args.depth_factor
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
                                refine=args.pretrained_crop is not None)
        row = {"frame": name,
               "gt_objects": int(len(np.unique(gt)) - 1),
               "stage1": multilabel_metrics(res.labels[0], gt)}
        if res.labels_refined is not None:
            row["refined"] = multilabel_metrics(res.labels_refined[0], gt)
        rows.append(row)
        print(f"{name}: gt={row['gt_objects']} "
              f"s1 OF={row['stage1']['Objects F-measure']:.3f} "
              f"BF={row['stage1']['Boundary F-measure']:.3f}"
              + (f" ref OF={row['refined']['Objects F-measure']:.3f} "
                 f"BF={row['refined']['Boundary F-measure']:.3f}"
                 if "refined" in row else ""))

    def mean_of(stage, key):
        vals = [r[stage][key] for r in rows if stage in r]
        return float(np.mean(vals)) if vals else None

    keys = ("Objects F-measure", "Objects Precision", "Objects Recall",
            "Boundary F-measure", "obj_detected_075_percentage")
    summary = {stage: {k: mean_of(stage, k) for k in keys}
               for stage in ("stage1", "refined")
               if any(stage in r for r in rows)}
    print(json.dumps({"frames": len(rows), "mean": summary}, indent=1))

    if args.report:
        short = {"Objects F-measure": "Objects F",
                 "Objects Precision": "P", "Objects Recall": "R",
                 "Boundary F-measure": "Boundary F",
                 "obj_detected_075_percentage": "%75"}
        lines = [
            "# Real-image F-measures (hand-annotated demo frames)", "",
            f"{len(rows)} annotated RealSense frames from the reference's "
            "data/demo (GT: data/demo_gt, tools/annotate_demo_gt.py; "
            "metrics: utils/evaluation.py).", "",
            "Command: `" + " ".join(sys.argv) + "`", "",
            "| frame | GT objs | stage | Objects F | P | R | Boundary F "
            "| %75 |", "|---|---|---|---|---|---|---|---|"]
        for r in rows:
            for stage in ("stage1", "refined"):
                if stage not in r:
                    continue
                m = r[stage]
                lines.append(
                    f"| {r['frame']} | {r['gt_objects']} | {stage} | "
                    f"{m['Objects F-measure']:.3f} | "
                    f"{m['Objects Precision']:.3f} | "
                    f"{m['Objects Recall']:.3f} | "
                    f"{m['Boundary F-measure']:.3f} | "
                    f"{m['obj_detected_075_percentage']:.3f} |")
        lines += ["", "| stage | " + " | ".join(short.values()) + " |",
                  "|---|" + "---|" * len(short)]
        for stage, m in summary.items():
            lines.append(f"| mean {stage} | " + " | ".join(
                f"{m[k]:.3f}" for k in keys) + " |")
        lines.append("")
        with open(args.report, "w") as fh:
            fh.write("\n".join(lines))
        with open(args.report.replace(".md", ".json"), "w") as fh:
            json.dump({"rows": rows, "mean": summary}, fh, indent=1,
                      default=float)
        print(f"wrote {args.report}")


if __name__ == "__main__":
    main()
