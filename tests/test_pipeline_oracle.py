"""Whole-pipeline cross-stack parity oracle.

The complete reference inference path (lib/fcn/test_dataset.py:232-267):

    SEGNET forward -> mean_shift_smart_init -> filter_labels_depth ->
    crop_rois -> zoom-in network -> re-cluster -> match_label_crop

is reproduced here as a CPU torch+numpy oracle (torch twin network from
torch_twin.py; clustering/filter/crop/match re-derived from the reference
semantics with torch/numpy ops) and compared against the JAX stack end to
end: identical converted weights, identical rendered inputs, pinned first
seeds.  Per-component oracles exist elsewhere (test_mean_shift,
test_roi_merge, test_checkpoint); this test catches CROSS-stack semantic
drift those cannot see — e.g. a stage ordering bug, a label-id remap
mismatch, or a normalization applied in one stack only.

fp32 accumulation-order differences between torch and XLA can flip
near-tie argmax picks inside farthest-point seeding, so the assertion is
metric-level (the reference's own randomized seeding has the same
property; SURVEY.md hard-part #4): both stacks' Objects/Boundary F against
the rendered GT must agree within a small tolerance, for the stage-1 AND
the refined outputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from test_mean_shift import (oracle_connected_components, oracle_hill_climb,
                             oracle_select_seeds)
from torch_twin import TorchSegnetAdd, _randomize_bn_stats

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.data.datasets import compute_xyz_np
from unseenobjectclustering_tpu.data.synthetic import SyntheticTabletopDataset
from unseenobjectclustering_tpu.ops.mean_shift import mean_shift_smart_init
from unseenobjectclustering_tpu.ops.roi import (crop_rois,
                                                filter_labels_depth,
                                                paste_back, veto_and_order)
from unseenobjectclustering_tpu.utils.checkpoint import (
    convert_torch_checkpoint)
from unseenobjectclustering_tpu.utils.evaluation import multilabel_metrics

pytestmark = pytest.mark.slow  # multi-minute: full CI tier only (pytest --runslow)

H, W = 240, 320
NUM_UNITS = 8
LAYERS = (1, 1, 1, 1)
NUM_SEEDS = 100
CROP_SEEDS = 20
CROP_SIZE = 64
KAPPA, MAX_ITERS, EPS = 20.0, 10, 0.04
FIRST_SEED = 1234


# ---------------------------------------------------------------------------
# reference-semantics oracle (torch/numpy)
# ---------------------------------------------------------------------------

def oracle_mean_shift(x, first, num_seeds):
    """mean_shift_smart_init (lib/utils/mean_shift.py:192-229)."""
    seeds, _ = oracle_select_seeds(x, num_seeds, first)
    z = oracle_hill_climb(x, seeds, KAPPA, MAX_ITERS)
    seed_labels = oracle_connected_components(z, EPS)
    dist = 0.5 * (1 - x @ z.T)
    labels = seed_labels[np.argmin(dist, axis=1)]
    num = len(np.unique(seed_labels))
    count = np.array([(labels == i).sum() for i in range(num)])
    label_max = int(np.argmax(count))
    if label_max != 0:
        i1 = labels == 0
        i2 = labels == label_max
        labels = labels.copy()
        labels[i1] = label_max
        labels[i2] = 0
    return labels


def oracle_filter_labels_depth(labels, xyz, threshold):
    """filter_labels_depth (test_dataset.py:183-198)."""
    out = labels.copy()
    for mask_id in np.unique(labels):
        if mask_id == 0:
            continue
        mask = labels == mask_id
        frac = (xyz[..., 2][mask] > 0).sum() / mask.sum()
        if frac < threshold:
            out[mask] = 0
    return out


def oracle_crop_rois(rgb_hwc, labels, xyz_hwc, crop_size):
    """crop_rois (test_dataset.py:62-112): tight box + 25% padding,
    bilinear (align_corners) RGB/XYZ resize, nearest mask resize."""
    mask_ids = [m for m in np.unique(labels) if m != 0]
    rgb = torch.tensor(rgb_hwc.transpose(2, 0, 1))[None]
    dep = torch.tensor(xyz_hwc.transpose(2, 0, 1))[None]
    out = []
    h, w = labels.shape
    for mask_id in mask_ids:
        mask = (labels == mask_id)
        ys, xs = np.nonzero(mask)
        x_min, x_max = xs.min(), xs.max()
        y_min, y_max = ys.min(), ys.max()
        x_pad = int(np.round((x_max - x_min) * 0.25))
        y_pad = int(np.round((y_max - y_min) * 0.25))
        x_min = max(x_min - x_pad, 0)
        x_max = min(x_max + x_pad, w - 1)
        y_min = max(y_min - y_pad, 0)
        y_max = min(y_max + y_pad, h - 1)
        sl = (slice(y_min, y_max + 1), slice(x_min, x_max + 1))
        size = (crop_size, crop_size)
        rgb_c = tF.interpolate(rgb[:, :, sl[0], sl[1]], size,
                               mode="bilinear", align_corners=True)[0]
        dep_c = tF.interpolate(dep[:, :, sl[0], sl[1]], size,
                               mode="bilinear", align_corners=True)[0]
        mask_c = tF.interpolate(
            torch.tensor(mask[sl].astype(np.float32))[None, None], size,
            mode="nearest")[0, 0]
        out.append((rgb_c, mask_c, dep_c, (x_min, y_min, x_max, y_max)))
    return out


def oracle_match_label_crop(initial_labels, labels_crop, mask_crops, rois,
                            depth_crops):
    """match_label_crop (test_dataset.py:116-179): 50% overlap veto,
    depth-ordered nearest paste-back with overwrite."""
    num = len(labels_crop)
    labels_crop = [lc.copy() for lc in labels_crop]
    for i in range(num):
        for mask_id in np.unique(labels_crop[i]):
            mask = labels_crop[i] == mask_id
            pct = (mask_crops[i][mask]).sum() / mask.sum()
            if pct < 0.5:
                labels_crop[i][mask] = -1
    order = []
    for i in range(num):
        z = depth_crops[i][2].numpy()
        sel = z[labels_crop[i] > -1] if (labels_crop[i] > -1).any() else z
        order.append((i, sel[sel > 0].mean() if (sel > 0).any() else np.nan))
    order = [i for i, _ in sorted(order, key=lambda t: t[1], reverse=True)]

    refined = np.zeros_like(initial_labels)
    count = 0
    for index in order:
        mask_ids = [m for m in np.unique(labels_crop[index]) if m != -1]
        label_crop = np.zeros_like(labels_crop[index])
        for mask_id in mask_ids:
            count += 1
            label_crop[labels_crop[index] == mask_id] = count
        x_min, y_min, x_max, y_max = rois[index]
        size = (y_max - y_min + 1, x_max - x_min + 1)
        resized = tF.interpolate(
            torch.tensor(label_crop.astype(np.float32))[None, None], size,
            mode="nearest")[0, 0].numpy()
        region = refined[y_min:y_max + 1, x_min:x_max + 1]
        region[resized > 0] = resized[resized > 0]
    return refined


def torch_pipeline(twin, img, xyz, gt, depth_threshold=0.8,
                   stage1_labels=None):
    """Full reference-semantics inference on one scene (CPU torch+numpy).

    stage1_labels: when given, skip stage 1 and refine THESE labels — the
    bisect mode that isolates stage-2 semantics from stage-1 cascade noise
    (tools/parity_oracle.py --common-stage1).
    """
    if stage1_labels is not None:
        labels = np.asarray(stage1_labels, np.int32).copy()
    else:
        with torch.no_grad():
            feats = twin(torch.tensor(img.transpose(2, 0, 1))[None],
                         torch.tensor(xyz.transpose(2, 0, 1))[None])
        feats = feats[0].numpy().transpose(1, 2, 0)
        x = feats.reshape(-1, NUM_UNITS).astype(np.float32)
        labels = oracle_mean_shift(x, FIRST_SEED, NUM_SEEDS).reshape(H, W)
        labels = oracle_filter_labels_depth(labels, xyz, depth_threshold)

    crops = oracle_crop_rois(img, labels, xyz, CROP_SIZE)
    labels_crop, mask_crops, rois, depth_crops = [], [], [], []
    for rgb_c, mask_c, dep_c, roi in crops:
        with torch.no_grad():
            f = twin(rgb_c[None], dep_c[None])
        xc = f[0].numpy().transpose(1, 2, 0).reshape(-1, NUM_UNITS)
        lc = oracle_mean_shift(xc.astype(np.float32), 0, CROP_SEEDS)
        labels_crop.append(lc.reshape(CROP_SIZE, CROP_SIZE))
        mask_crops.append(mask_c.numpy())
        depth_crops.append(dep_c)
        rois.append(roi)
    refined = (oracle_match_label_crop(labels, labels_crop, mask_crops, rois,
                                       depth_crops)
               if crops else labels.copy())
    return labels, refined


def jax_pipeline(fmodel, variables, img, xyz, depth_threshold=0.8,
                 max_instances=16, stage1_labels=None):
    """The JAX stack with the same pinned seed choices.

    stage1_labels: when given, skip stage 1 and refine THESE labels (see
    torch_pipeline) so both stacks' zoom-in paths start from one label map.
    """
    if stage1_labels is not None:
        labels = jnp.asarray(stage1_labels, jnp.int32)
    else:
        feats = fmodel.apply(variables, jnp.asarray(img)[None],
                             jnp.asarray(xyz)[None], train=False)
        res = mean_shift_smart_init(
            feats.reshape(H * W, NUM_UNITS), jax.random.key(0), kappa=KAPPA,
            num_seeds=NUM_SEEDS, max_iters=MAX_ITERS, epsilon=EPS,
            use_pallas=False, first_index=jnp.int32(FIRST_SEED))
        labels = filter_labels_depth(res.labels.reshape(H, W),
                                     jnp.asarray(xyz), depth_threshold,
                                     max_labels=NUM_SEEDS + 1)

    crops = crop_rois(jnp.asarray(img), labels, jnp.asarray(xyz),
                      max_instances=max_instances, crop_size=CROP_SIZE)
    feats_c = fmodel.apply(variables, crops.rgb_crops, crops.depth_crops,
                           train=False)
    labels_crop = []
    for i in range(max_instances):
        if not bool(crops.valid[i]):
            labels_crop.append(np.zeros((CROP_SIZE, CROP_SIZE), np.int32))
            continue
        r = mean_shift_smart_init(
            feats_c[i].reshape(-1, NUM_UNITS), jax.random.key(0),
            kappa=KAPPA, num_seeds=CROP_SEEDS, max_iters=MAX_ITERS,
            epsilon=EPS, use_pallas=False, first_index=jnp.int32(0))
        labels_crop.append(np.asarray(r.labels.reshape(CROP_SIZE,
                                                       CROP_SIZE)))
    labels_crop = jnp.asarray(np.stack(labels_crop))
    lv, key = veto_and_order(labels_crop, crops.mask_crops,
                             crops.depth_crops[..., 2], crops.valid,
                             max_labels=NUM_SEEDS + 1)
    labels_np = np.asarray(labels, np.int32)
    refined = paste_back(labels_np, np.asarray(lv), np.asarray(key),
                         np.asarray(crops.rois), np.asarray(crops.valid))
    return labels_np, refined


# ---------------------------------------------------------------------------

def build_jax_model():
    """Dual-tower 'add' SEGNET over the module-level LAYERS/NUM_UNITS —
    the torch twin's flax counterpart at any topology (the production
    factory only exposes the resnet18/34 presets).  Shared with
    tools/parity_oracle.py, which overrides the module dims first."""
    import flax.linen as nn

    from unseenobjectclustering_tpu.models.resnet import ResNetFCN

    layers, num_units = LAYERS, NUM_UNITS

    class SmallSegnet(nn.Module):
        @nn.compact
        def __call__(self, img, depth, *, train=False):
            f1 = ResNetFCN(block="basic", layers=layers,
                           num_classes=num_units, output_stride=8,
                           name="fcn")(img, train=train)
            f2 = ResNetFCN(block="basic", layers=layers,
                           num_classes=num_units, output_stride=8,
                           name="fcn_depth")(depth, train=train)
            f = f1 + f2
            norm = jnp.sqrt(jnp.maximum(
                jnp.sum(f * f, axis=-1, keepdims=True), 1e-24))
            return f / jnp.maximum(norm, 1e-12)

    return SmallSegnet()


@pytest.fixture(scope="module")
def stacks():
    rng = np.random.RandomState(7)
    torch.manual_seed(7)
    twin = TorchSegnetAdd(layers=LAYERS, num_units=NUM_UNITS)
    with torch.no_grad():
        _randomize_bn_stats(twin, rng)
    twin.eval()
    sd = {"module." + k: v for k, v in twin.state_dict().items()}

    fmodel = build_jax_model()
    init_vars = fmodel.init(jax.random.key(0),
                            jnp.zeros((1, H, W, 3), jnp.float32),
                            jnp.zeros((1, H, W, 3), jnp.float32),
                            train=False)
    variables = convert_torch_checkpoint(sd, expected=init_vars)
    return twin, fmodel, variables


@pytest.mark.parametrize("scene", [0, 1])
def test_whole_pipeline_cross_stack_parity(stacks, scene):
    twin, fmodel, variables = stacks
    cfg = Config.from_dict({"INPUT": "RGBD", "MODE": "TEST"})
    ds = SyntheticTabletopDataset("test", cfg, height=H, width=W, size=4)
    bgr, depth_mm, gt = ds.get_scene(scene)
    img = (bgr.astype(np.float32) / 255.0
           - cfg.pixel_means.astype(np.float32) / 255.0)
    depth = depth_mm.astype(np.float32) / 1000.0
    xyz = compute_xyz_np(depth, ds.f, ds.f, ds.cx, ds.cy)
    gt = gt.astype(np.int32)

    t_labels, t_refined = torch_pipeline(twin, img, xyz, gt)
    j_labels, j_refined = jax_pipeline(fmodel, variables, img, xyz)

    mt1 = multilabel_metrics(t_labels.astype(np.int32), gt)
    mj1 = multilabel_metrics(j_labels, gt)
    mt2 = multilabel_metrics(t_refined.astype(np.int32), gt)
    mj2 = multilabel_metrics(j_refined.astype(np.int32), gt)

    for name, mt, mj in (("stage1", mt1, mj1), ("refined", mt2, mj2)):
        for k in ("Objects F-measure", "Boundary F-measure"):
            assert abs(mt[k] - mj[k]) < 0.03, (
                f"{name} {k}: torch={mt[k]:.4f} jax={mj[k]:.4f}")
    # stage-1 labels must be near-identical pixelwise (identical pinned
    # first seed; only fp32 accumulation noise distinguishes the stacks)
    agree = (t_labels == j_labels).mean()
    assert agree > 0.95, f"stage-1 pixel agreement {agree:.4f}"
