#!/usr/bin/env python3
"""Plot per-epoch OCID evaluation curves for the five modality variants
(parity with the reference tools/plot_epochs.py:13-76).

The published paper-era curves (reference tools/plot_epochs.py hardcodes
them) are baked in as the baseline; pass --results to overlay your own
per-epoch numbers from a JSON file {"<variant>": [[F, F_boundary, pct75],
...per epoch...]} produced by tools/test_net runs.
"""

import argparse
import json

import _init_paths  # noqa: F401

# Published OCID curves, epochs 1..16: (Objects-F, Boundary-F, %75)
# at epoch 16 per variant (reference tools/plot_epochs.py:13-64 / SURVEY §6).
PUBLISHED_EPOCH16 = {
    "rgb": (0.594, 0.365, 0.480),
    "depth": (0.864, 0.756, 0.754),
    "rgbd_early": (0.828, 0.672, 0.735),
    "rgbd_add": (0.885, 0.788, 0.822),
    "rgbd_cat": (0.829, 0.685, 0.683),
}

METRICS = ("Objects F-measure", "Boundary F-measure",
           "obj_detected_075_percentage")


def main():
    parser = argparse.ArgumentParser(description="Plot per-epoch curves")
    parser.add_argument("--results", type=str, default=None,
                        help="JSON: {variant: [[F, Fb, pct75] per epoch]}")
    parser.add_argument("--out", type=str, default="epochs.png")
    args = parser.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    results = {}
    if args.results:
        with open(args.results) as f:
            results = json.load(f)

    fig, axes = plt.subplots(1, 3, figsize=(16, 5))
    for mi, metric in enumerate(METRICS):
        ax = axes[mi]
        for variant, curve in results.items():
            if isinstance(curve, dict):   # sparse: {"epochs": [...],
                xs = curve["epochs"]      #          "values": [[F,Fb,p75]]}
                rows = curve["values"]
            else:                         # dense: [[F, Fb, p75] per epoch]
                xs = range(1, len(curve) + 1)
                rows = curve
            ax.plot(xs, [row[mi] for row in rows], marker="o",
                    label=f"{variant} (ours)")
        for variant, vals in PUBLISHED_EPOCH16.items():
            ax.axhline(vals[mi], linestyle="--", alpha=0.4)
            ax.annotate(f"{variant} ref", (1, vals[mi]), fontsize=7,
                        alpha=0.6)
        ax.set_title(metric)
        ax.set_xlabel("epoch")
        ax.grid(alpha=0.3)
        if mi == 0:
            ax.legend(fontsize=8)
    fig.suptitle("OCID evaluation per training epoch")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
