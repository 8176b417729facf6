#!/usr/bin/env python
"""Semi-automatic GT instance-mask annotation for the 9 real demo frames.

The reference ships 9 real RealSense RGB-D pairs (data/demo/, expected
output README.md:56) but no ground-truth masks, so real-image F-measures
were never computable in-container.  This tool produces human-verified GT:

  1. `propose`: fit the table plane (RANSAC on the backprojected cloud),
     mark points >`--height-mm` above the plane as foreground, connected
     components -> numbered proposal overlay for visual review.
  2. A per-frame JSON spec (keep/merge/erase/polygon edits, authored by a
     human inspecting the overlays) turns proposals into final labels:
     `apply` writes <out>/00000i-label.png (indexed PNG, 0 = background,
     1..K = instances) + a final overlay for verification.

The GT convention matches OCID/OSD (SURVEY.md §2.4): background/table = 0,
each tabletop object instance a distinct id; objects off the table
(floor, shelving, the toy in frames 0-2) are background.

Usage:
  python tools/annotate_demo_gt.py propose --frame 0
  python tools/annotate_demo_gt.py apply   --frame 0 \
      --spec data/demo_gt/specs/000000.json
"""

import argparse
import json
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEMO = "/root/reference/data/demo"


def load_frame(idx: int):
    color = cv2.imread(f"{DEMO}/{idx:06d}-color.png")
    depth = cv2.imread(f"{DEMO}/{idx:06d}-depth.png", -1).astype(np.float32)
    depth /= 1000.0
    with open(f"{DEMO}/camera_params.json") as fh:
        cam = json.load(fh)
    return color, depth, cam


def backproject(depth: np.ndarray, cam: dict) -> np.ndarray:
    h, w = depth.shape
    us, vs = np.meshgrid(np.arange(w), np.arange(h))
    z = depth
    x = (us - cam["x_offset"]) * z / cam["fx"]
    y = (vs - cam["y_offset"]) * z / cam["fy"]
    return np.stack([x, y, z], axis=-1)


def fit_table_plane(xyz: np.ndarray, iters: int = 500, tol: float = 0.006,
                    seed: int = 0, roi=None):
    """RANSAC dominant-plane fit on the valid cloud (the table fills most
    of each demo frame).  `roi` (x0,y0,x1,y1) restricts the fit to a
    region — needed for frames 5-8 where the carpet, not the small table,
    is the dominant plane.  Returns (normal, d) with the normal oriented
    toward the camera so `dist > 0` means 'above the table'."""
    if roi is not None:
        x0, y0, x1, y1 = roi
        xyz = xyz[y0:y1, x0:x1]
    pts = xyz.reshape(-1, 3)
    valid = pts[:, 2] > 0.1
    pts = pts[valid]
    rng = np.random.RandomState(seed)
    sub = pts[rng.choice(len(pts), min(len(pts), 40000), replace=False)]
    best = (None, -1)
    for _ in range(iters):
        p = sub[rng.choice(len(sub), 3, replace=False)]
        n = np.cross(p[1] - p[0], p[2] - p[0])
        nn = np.linalg.norm(n)
        if nn < 1e-9:
            continue
        n = n / nn
        d = -n.dot(p[0])
        inl = np.abs(sub @ n + d) < tol
        cnt = int(inl.sum())
        if cnt > best[1]:
            best = ((n, d), cnt)
    (n, d), _ = best
    # refine on inliers (least squares)
    inl = np.abs(sub @ n + d) < tol
    q = sub[inl]
    c = q.mean(axis=0)
    _, _, vt = np.linalg.svd(q - c, full_matrices=False)
    n = vt[2]
    d = -n.dot(c)
    # orient: camera origin (0,0,0) must be on the positive side
    if d < 0:
        n, d = -n, -d
    return n, d


def propose(idx: int, height_mm: float, min_px: int, out_dir: str,
            roi=None):
    color, depth, cam = load_frame(idx)
    xyz = backproject(depth, cam)
    n, d = fit_table_plane(xyz, roi=roi)
    dist = xyz @ n + d
    valid = depth > 0.1
    fg = valid & (dist > height_mm / 1000.0)
    num, cc = cv2.connectedComponents(fg.astype(np.uint8), connectivity=4)
    labels = np.zeros_like(cc)
    k = 0
    for c in range(1, num):
        m = cc == c
        if m.sum() >= min_px:
            k += 1
            labels[m] = k
    os.makedirs(out_dir, exist_ok=True)
    np.save(f"{out_dir}/{idx:06d}-proposal.npy", labels.astype(np.uint8))
    overlay = draw_overlay(color, labels)
    cv2.imwrite(f"{out_dir}/{idx:06d}-proposal.png", overlay)
    print(f"frame {idx}: {k} proposals (plane n={np.round(n, 3)}, "
          f"d={d:.3f}) -> {out_dir}/{idx:06d}-proposal.png")


def draw_overlay(color: np.ndarray, labels: np.ndarray) -> np.ndarray:
    rng = np.random.RandomState(1)
    palette = rng.randint(60, 255, size=(labels.max() + 1, 3))
    palette[0] = 0
    over = color.copy()
    mask = labels > 0
    over[mask] = (0.45 * color[mask] + 0.55 * palette[labels[mask]]).astype(
        np.uint8)
    for k in range(1, labels.max() + 1):
        ys, xs = np.nonzero(labels == k)
        if len(ys) == 0:
            continue
        cy, cx = int(ys.mean()), int(xs.mean())
        cv2.putText(over, str(k), (cx - 8, cy + 6),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 3)
        cv2.putText(over, str(k), (cx - 8, cy + 6),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 0, 0), 1)
    return over


def apply_spec(idx: int, spec_path: str, out_dir: str, work_dir: str):
    """Edits, applied in order: erase -> merge -> keep -> polygons -> fills.

    Spec keys (all optional):
      erase:    [[x0,y0,x1,y1], ...]  proposal pixels in these boxes -> 0
      split:    [{"src": id, "polygon": [[x,y], ...]}, ...]  src-component
                pixels inside the polygon become a NEW instance (the depth-
                derived boundary is kept; the polygon only partitions it)
      merge:    [[a, b, c], ...]      proposal ids b,c -> a
      keep:     [ids]                 whitelist AFTER merges (else: all)
      polygon:  {"new_id_or_target": [[x,y], ...], ...}  hand-drawn regions
                (id "new" appends; an int id adds area to that instance)
      grabcut:  [[x0,y0,x1,y1], ...]  color-model segmentation inside a box,
                appended as new instances (for objects the depth misses)
    Final ids are re-densified to 1..K in top-left scan order.
    """
    with open(spec_path) as fh:
        spec = json.load(fh)
    color, depth, cam = load_frame(idx)
    labels = np.load(f"{work_dir}/{idx:06d}-proposal.npy").astype(np.int32)

    for x0, y0, x1, y1 in spec.get("erase", []):
        labels[y0:y1, x0:x1] = 0
    for op in spec.get("split", []):
        pts = np.asarray(op["polygon"], np.int32).reshape(-1, 1, 2)
        pmask = np.zeros(labels.shape, np.uint8)
        cv2.fillPoly(pmask, [pts], 1)
        sel = (labels == op["src"]) & (pmask > 0)
        labels[sel] = labels.max() + 1
    for group in spec.get("merge", []):
        tgt = group[0]
        for src in group[1:]:
            labels[labels == src] = tgt
    if "keep" in spec:
        keep = set(spec["keep"])
        m = np.isin(labels, list(keep))
        labels[~m] = 0
    next_id = labels.max() + 1
    for key, poly in spec.get("polygon", {}).items():
        pts = np.asarray(poly, np.int32).reshape(-1, 1, 2)
        mask = np.zeros(labels.shape, np.uint8)
        cv2.fillPoly(mask, [pts], 1)
        tid = next_id if key == "new" else int(key)
        if key == "new":
            next_id += 1
        # polygons only claim background (or re-claim their own id): a
        # sloppy vertex can never steal a neighboring instance's pixels
        labels[(mask > 0) & ((labels == 0) | (labels == tid))] = tid
    for key, (ecx, ecy, erx, ery, eang) in spec.get("ellipse", {}).items():
        # full-silhouette ellipse for bowls/cans whose interiors sit at
        # table height (depth can't see them); background-only claim
        mask = np.zeros(labels.shape, np.uint8)
        cv2.ellipse(mask, (int(ecx), int(ecy)), (int(erx), int(ery)),
                    float(eang), 0, 360, 1, -1)
        tid = next_id if key == "new" else int(key)
        if key == "new":
            next_id += 1
        labels[(mask > 0) & ((labels == 0) | (labels == tid))] = tid
    for x0, y0, x1, y1 in spec.get("grabcut", []):
        gmask = np.zeros(labels.shape, np.uint8)
        bgd = np.zeros((1, 65), np.float64)
        fgd = np.zeros((1, 65), np.float64)
        rect = (x0, y0, x1 - x0, y1 - y0)
        cv2.grabCut(color, gmask, rect, bgd, fgd, 5,
                    cv2.GC_INIT_WITH_RECT)
        m = (gmask == cv2.GC_FGD) | (gmask == cv2.GC_PR_FGD)
        labels[m] = next_id
        next_id += 1
    # split remainders: polygons claim pixels OFF a src component, so any
    # src pixels the polygons missed (interface slivers, stray above-plane
    # speckle) stay on the src id.  Keep only the largest connected piece
    # as the remainder object; smaller scraps go to background.
    for src in {op["src"] for op in spec.get("split", [])}:
        m = (labels == src).astype(np.uint8)
        if not m.any():
            continue
        num, cc = cv2.connectedComponents(m, connectivity=8)
        if num > 2:
            sizes = np.bincount(cc.ravel())
            sizes[0] = 0
            keep_cc = sizes.argmax()
            labels[(cc > 0) & (cc != keep_cc)] = 0
    # fill enclosed holes per instance (bowl/cup interiors sit near the
    # table-plane height, so the depth threshold excludes them; any
    # background region NOT reachable from the image border is interior)
    for k in [v for v in np.unique(labels) if v]:
        m = (labels == k).astype(np.uint8)
        ff = m.copy()
        ffmask = np.zeros((m.shape[0] + 2, m.shape[1] + 2), np.uint8)
        cv2.floodFill(ff, ffmask, (0, 0), 1)
        holes = (ff == 0) & (m == 0)
        labels[holes & (labels == 0)] = k
    # color-snap each instance: GrabCut (mask init) recovers pixels the
    # depth misses (hole interiors, bottom rims in the depth shadow) —
    # UNION with the depth mask so refinement only ever adds, never eats
    # true object pixels, and never steals another instance's pixels
    if spec.get("refine", True):
        skip = set(spec.get("norefine", []))
        for k in [v for v in np.unique(labels) if v and v not in skip]:
            m0 = (labels == k).astype(np.uint8)
            g = np.full(labels.shape, cv2.GC_BGD, np.uint8)
            g[cv2.dilate(m0, np.ones((13, 13), np.uint8)) > 0] = cv2.GC_PR_BGD
            g[m0 > 0] = cv2.GC_PR_FGD
            g[cv2.erode(m0, np.ones((7, 7), np.uint8)) > 0] = cv2.GC_FGD
            bgd = np.zeros((1, 65), np.float64)
            fgd = np.zeros((1, 65), np.float64)
            try:
                cv2.grabCut(color, g, None, bgd, fgd, 3,
                            cv2.GC_INIT_WITH_MASK)
            except cv2.error:
                continue  # degenerate mask (all-FG/all-BG): keep depth mask
            ref = (g == cv2.GC_FGD) | (g == cv2.GC_PR_FGD)
            labels[ref & (labels == 0)] = k
    # close small holes inside each instance (depth speckle)
    for k in np.unique(labels):
        if k == 0:
            continue
        m = (labels == k).astype(np.uint8)
        m = cv2.morphologyEx(m, cv2.MORPH_CLOSE,
                             np.ones((5, 5), np.uint8))
        labels[(m > 0) & (labels == 0)] = k
    # final erase: boxes applied AFTER refinement (for trimming polygon /
    # GrabCut overshoot the early `erase` op runs too soon to see)
    for x0, y0, x1, y1 in spec.get("erase_final", []):
        labels[y0:y1, x0:x1] = 0
    # clip: restrict an instance to a bbox (kills plane-noise halos that
    # merge into a component over reflective table patches)
    for key, (x0, y0, x1, y1) in spec.get("clip", {}).items():
        k = int(key)
        keep_box = np.zeros(labels.shape, bool)
        keep_box[y0:y1, x0:x1] = True
        labels[(labels == k) & ~keep_box] = 0
    # densify ids in scan order
    out = np.zeros_like(labels)
    nid = 0
    seen = {}
    for y, x in zip(*np.nonzero(labels)):
        v = labels[y, x]
        if v not in seen:
            nid += 1
            seen[v] = nid
    for v, t in seen.items():
        out[labels == v] = t
    os.makedirs(out_dir, exist_ok=True)
    cv2.imwrite(f"{out_dir}/{idx:06d}-label.png", out.astype(np.uint8))
    cv2.imwrite(f"{out_dir}/{idx:06d}-verify.png",
                draw_overlay(color, out))
    print(f"frame {idx}: {nid} instances -> {out_dir}/{idx:06d}-label.png")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("cmd", choices=["propose", "apply"])
    p.add_argument("--frame", type=int, required=True)
    p.add_argument("--height-mm", type=float, default=10.0)
    p.add_argument("--min-px", type=int, default=400)
    p.add_argument("--spec", type=str, default=None)
    p.add_argument("--work-dir", type=str, default="/tmp/demo_gt_work")
    p.add_argument("--out-dir", type=str, default="data/demo_gt")
    p.add_argument("--plane-roi", type=int, nargs=4, default=None,
                   metavar=("X0", "Y0", "X1", "Y1"),
                   help="fit the table plane inside this box (frames "
                        "where the floor is the dominant plane)")
    args = p.parse_args()
    if args.cmd == "propose":
        propose(args.frame, args.height_mm, args.min_px, args.work_dir,
                roi=args.plane_roi)
    else:
        assert args.spec, "apply needs --spec"
        apply_spec(args.frame, args.spec, args.out_dir, args.work_dir)


if __name__ == "__main__":
    main()
