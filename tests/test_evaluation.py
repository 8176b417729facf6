"""Tests for utils.evaluation against a naive per-pair oracle.

The oracle below re-derives the published metric definitions (DAVIS boundary
F, Dave et al. P/R/F with Hungarian matching) with straightforward per-pair
loops, so the vectorized implementation is checked end to end on random
label images.
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from unseenobjectclustering_tpu.utils.evaluation import (
    boundary_overlap, disk, multilabel_metrics, seg2bmap, _bound_pix)


# ---------------------------------------------------------------------------
# naive oracle
# ---------------------------------------------------------------------------

def oracle_metrics(pred, gt, thr=0.75):
    gts = [g for g in np.unique(gt) if g != 0]
    prs = [p for p in np.unique(pred) if p != 0]
    G, P = len(gts), len(prs)
    if P == 0 or G == 0:
        return None  # edge cases tested separately

    tp = np.zeros((G, P))
    F = np.zeros((G, P))
    btp = np.zeros((G, P, 2))
    for i, g in enumerate(gts):
        gm = gt == g
        for j, p in enumerate(prs):
            pm = pred == p
            t = np.count_nonzero(gm & pm)
            tp[i, j] = t
            pr = t / np.count_nonzero(pm)
            rc = t / np.count_nonzero(gm)
            if pr + rc > 0:
                F[i, j] = 2 * pr * rc / (pr + rc)
            btp[i, j] = boundary_overlap(pm, gm)

    bpd = sum(seg2bmap(pred == p).sum() for p in prs)
    brd = sum(seg2bmap(gt == g).sum() for g in gts)

    ri, ci = linear_sum_assignment(F.max() - F)
    ndet = int(np.sum(F[ri, ci] > thr))
    prec = tp[ri, ci].sum() / np.sum(pred > 0)
    rec = tp[ri, ci].sum() / np.sum(gt > 0)
    Fm = 2 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
    bp = btp[ri, ci][:, 0].sum() / bpd
    br = btp[ri, ci][:, 1].sum() / brd
    bF = 2 * bp * br / (bp + br) if bp + br > 0 else 0.0
    return dict(F=Fm, P=prec, R=rec, bF=bF, bP=bp, bR=br,
                ndet=ndet, pct=ndet / G)


def random_labels(rng, h=48, w=64, k=4):
    """Random blobby label image: k disks on a background."""
    img = np.zeros((h, w), np.int32)
    for i in range(1, k + 1):
        cy, cx = rng.randint(8, h - 8), rng.randint(8, w - 8)
        r = rng.randint(4, 9)
        y, x = np.mgrid[:h, :w]
        img[(y - cy) ** 2 + (x - cx) ** 2 <= r * r] = i
    return img


# ---------------------------------------------------------------------------
# unit pieces
# ---------------------------------------------------------------------------

def test_seg2bmap_square():
    seg = np.zeros((8, 8), bool)
    seg[2:5, 2:5] = True
    b = seg2bmap(seg)
    # boundary offset 1/2 px toward the origin: fires one pixel before the
    # mask starts (XOR with SE shift) and on the mask's far edges
    assert b[1, 1] and b[4, 4] and b[2, 4] and b[4, 2]
    assert not b[3, 3]           # interior
    assert not b[2, 2]           # near corner is offset out to (1, 1)
    assert not b[0, 0] and not b[7, 7]


def test_seg2bmap_full_image_no_boundary_interior():
    seg = np.ones((6, 6), bool)
    b = seg2bmap(seg)
    # full-frame mask: east/south XOR only fires at the image border
    assert not b[1:-1, 1:-1].any()


def test_disk_matches_skimage_definition():
    d = disk(3)
    assert d.shape == (7, 7)
    assert d[3, 3] == 1 and d[0, 3] == 1 and d[0, 0] == 0
    assert d.sum() == 29  # skimage.morphology.disk(3).sum()


def test_bound_pix_480x640():
    assert _bound_pix((480, 640)) == 3  # ceil(0.003 * 800)


def test_boundary_overlap_identical_masks():
    m = np.zeros((32, 32), bool)
    m[8:20, 10:22] = True
    p_tp, r_tp = boundary_overlap(m, m)
    nb = seg2bmap(m).sum()
    assert p_tp == nb and r_tp == nb


# ---------------------------------------------------------------------------
# full metric vs oracle
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_multilabel_metrics_vs_oracle(seed):
    rng = np.random.RandomState(seed)
    gt = random_labels(rng, k=3)
    pred = random_labels(rng, k=4)
    got = multilabel_metrics(pred, gt)
    want = oracle_metrics(pred, gt)
    assert got["Objects F-measure"] == pytest.approx(want["F"])
    assert got["Objects Precision"] == pytest.approx(want["P"])
    assert got["Objects Recall"] == pytest.approx(want["R"])
    assert got["Boundary F-measure"] == pytest.approx(want["bF"])
    assert got["Boundary Precision"] == pytest.approx(want["bP"])
    assert got["Boundary Recall"] == pytest.approx(want["bR"])
    assert got["obj_detected_075"] == want["ndet"]
    assert got["obj_detected_075_percentage"] == pytest.approx(want["pct"])


def test_perfect_prediction():
    rng = np.random.RandomState(7)
    gt = random_labels(rng, k=3)
    got = multilabel_metrics(gt.copy(), gt)
    assert got["Objects F-measure"] == pytest.approx(1.0)
    assert got["Boundary F-measure"] == pytest.approx(1.0)
    assert got["obj_detected_075_percentage"] == pytest.approx(1.0)


def test_permuted_labels_are_equivalent():
    """Metric must be invariant to instance-id permutation (Hungarian)."""
    rng = np.random.RandomState(8)
    gt = random_labels(rng, k=3)
    perm = gt.copy()
    perm[gt == 1], perm[gt == 2], perm[gt == 3] = 3, 1, 2
    got = multilabel_metrics(perm, gt)
    assert got["Objects F-measure"] == pytest.approx(1.0)


def test_edge_cases():
    gt = np.zeros((16, 16), np.int32)
    pred = np.zeros((16, 16), np.int32)
    m = multilabel_metrics(pred, gt)
    assert m["Objects F-measure"] == 1.0          # nothing to predict
    gt2 = gt.copy(); gt2[4:8, 4:8] = 1
    m = multilabel_metrics(pred, gt2)             # all false negatives
    assert m["Objects F-measure"] == 0.0 and m["Objects Precision"] == 1.0
    m = multilabel_metrics(gt2, gt)               # all false positives
    assert m["Objects F-measure"] == 0.0 and m["Objects Recall"] == 1.0
