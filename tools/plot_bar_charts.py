#!/usr/bin/env python3
"""Bar charts comparing methods on OSD / OCID (parity with the reference
tools/plot_bar_charts.py:8-56).

Baseline numbers are the published comparison set; pass --ours F_overlap
F_boundary pct75 to append this framework's measured results.
"""

import argparse

import _init_paths  # noqa: F401

# Published OSD comparison (reference tools/plot_bar_charts.py:28-30):
# method -> (F-overlap, F-boundary, %75)
OSD_BASELINES = {
    "MRCNN-Depth": (80.6, 66.0, 71.0),
    "UOIS-2D": (79.9, 65.6, 70.9),
    "UOIS-3D": (83.3, 67.3, 73.8),
    "UCN (ref)": (87.4, 69.4, 83.2),
}
# OCID comparison (reference tools/plot_bar_charts.py:11-26, commented set)
OCID_BASELINES = {
    "MRCNN": (84.7, 55.6, 72.9),
    "UCN (ref)": (88.5, 78.8, 82.2),
    "UCN refined (ref)": (87.8, 82.3, 85.6),
}


def main():
    parser = argparse.ArgumentParser(description="Method comparison charts")
    parser.add_argument("--dataset", choices=("osd", "ocid"), default="osd")
    parser.add_argument("--ours", type=float, nargs=3, default=None,
                        metavar=("F", "FB", "PCT75"))
    parser.add_argument("--out", type=str, default="bars.png")
    args = parser.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    data = dict(OSD_BASELINES if args.dataset == "osd" else OCID_BASELINES)
    if args.ours:
        data["UCN-TPU (ours)"] = tuple(args.ours)

    methods = list(data)
    metrics = ["F-overlap", "F-boundary", "%75"]
    x = np.arange(len(metrics))
    width = 0.8 / len(methods)

    fig, ax = plt.subplots(figsize=(9, 5))
    for i, m in enumerate(methods):
        ax.bar(x + i * width, data[m], width, label=m)
    ax.set_xticks(x + width * (len(methods) - 1) / 2)
    ax.set_xticklabels(metrics)
    ax.set_ylim(0, 100)
    ax.legend()
    ax.set_title(f"{args.dataset.upper()} comparison")
    ax.grid(axis="y", alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
