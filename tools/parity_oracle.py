#!/usr/bin/env python
"""Full-scale whole-pipeline parity run: torch oracle vs JAX stack.

Runs the complete reference inference path (SEGNET forward -> mean shift ->
depth filter -> crop -> zoom-in -> match/paste, test_dataset.py:232-267) as
a CPU torch+numpy oracle AND as the JAX stack, at the flagship topology
(ResNet34-8s dual-tower add, 64-D) and resolution (480x640), over N rendered
scenes with identical converted weights and pinned seeds.  Writes a
markdown report of per-scene stage-1/refined Objects & Boundary F for both
stacks and their deltas.

The pytest version (tests/test_pipeline_oracle.py) runs a reduced setting
(240x320, 1-block towers) so the suite stays fast; this tool is the
full-size evidence run.  It reuses the test module's oracle machinery by
overriding its module-level dimensions — the oracle code lives with the
tests on purpose (it re-derives reference semantics and is not part of the
shipping framework).

Usage:
  python tools/parity_oracle.py [--scenes 10] [--out docs/PARITY_RUN.md]
  python tools/parity_oracle.py --scenes 2 --height 240 --width 320  # quick
"""

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scenes", type=int, default=10)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--layers", type=int, nargs=4, default=(3, 4, 6, 3))
    p.add_argument("--num-units", type=int, default=64)
    p.add_argument("--crop-size", type=int, default=224)
    p.add_argument("--out", default="docs/PARITY_RUN.md")
    p.add_argument("--common-stage1", action="store_true",
                   help="bisect mode: feed the torch stack's stage-1 labels "
                        "into BOTH stacks' zoom-in paths, so the refined "
                        "deltas isolate stage-2 semantics from stage-1 "
                        "cascade noise (tiny fp differences in stage-1 "
                        "labels move ROI boxes, which moves every "
                        "downstream crop)")
    p.add_argument("--pretrained", default=None,
                   help="orbax checkpoint dir or .pth: run the comparison "
                        "on trained weights (exported to the torch twin via "
                        "export_torch_state_dict) instead of random init — "
                        "random full-size weights collapse to one cluster, "
                        "making the metric comparison vacuous")
    args = p.parse_args()

    # CPU-only oracle: the container's sitecustomize pins the axon TPU
    # platform and ignores the env var, so force the platform through
    # jax.config BEFORE any jax op (the tests/conftest.py technique) — a
    # second process touching the tunnel would fight the training job
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import torch

    import test_pipeline_oracle as po
    from torch_twin import TorchSegnetAdd, _randomize_bn_stats

    # full-size configuration
    po.H, po.W = args.height, args.width
    po.NUM_UNITS = args.num_units
    po.LAYERS = tuple(args.layers)
    po.CROP_SIZE = args.crop_size
    po.CROP_SEEDS = 100  # reference crop re-clustering uses the default 100

    import jax
    import jax.numpy as jnp

    from unseenobjectclustering_tpu.config import Config
    from unseenobjectclustering_tpu.data.datasets import compute_xyz_np
    from unseenobjectclustering_tpu.data.synthetic import (
        SyntheticTabletopDataset)
    from unseenobjectclustering_tpu.models import get_network
    from unseenobjectclustering_tpu.utils.checkpoint import (
        convert_torch_checkpoint)
    from unseenobjectclustering_tpu.utils.evaluation import multilabel_metrics

    rng = np.random.RandomState(7)
    torch.manual_seed(7)
    print(f"building torch twin {po.LAYERS} x {po.NUM_UNITS}u ...",
          flush=True)
    twin = TorchSegnetAdd(layers=po.LAYERS, num_units=po.NUM_UNITS)
    with torch.no_grad():
        _randomize_bn_stats(twin, rng)
    twin.eval()

    cfg = Config.from_dict({"INPUT": "RGBD", "MODE": "TEST",
                            "TRAIN": {"NUM_UNITS": po.NUM_UNITS}})
    if tuple(po.LAYERS) == (3, 4, 6, 3):
        fmodel = get_network("seg_resnet34_8s_embedding", cfg,
                             num_units=po.NUM_UNITS)
    else:
        # toy topologies (quick bisects) share the test module's builder
        fmodel = po.build_jax_model()
    z = jnp.zeros((1, po.H, po.W, 3), jnp.float32)
    init_vars = fmodel.init(jax.random.key(0), z, z, train=False)

    if args.pretrained:
        from unseenobjectclustering_tpu.engine.builder import (
            load_network_variables)
        from unseenobjectclustering_tpu.utils.checkpoint import (
            export_torch_state_dict)
        variables = load_network_variables(cfg, "seg_resnet34_8s_embedding",
                                           args.pretrained, po.H, po.W,
                                           num_units=po.NUM_UNITS)
        sd = {k: torch.tensor(np.asarray(v)) for k, v in
              export_torch_state_dict(variables).items()}
        missing, unexpected = twin.load_state_dict(sd, strict=False)
        assert not unexpected, unexpected
        assert all("num_batches_tracked" in k for k in missing), missing
        print("trained weights exported into the torch twin", flush=True)
    else:
        sd = {"module." + k: v for k, v in twin.state_dict().items()}
        variables = convert_torch_checkpoint(sd, expected=init_vars)
        print("random twin weights converted", flush=True)

    ds = SyntheticTabletopDataset("test", cfg, height=po.H, width=po.W,
                                  size=args.scenes)
    rows = []
    for scene in range(args.scenes):
        bgr, depth_mm, gt = ds.get_scene(scene)
        img = (bgr.astype(np.float32) / 255.0
               - cfg.pixel_means.astype(np.float32) / 255.0)
        depth = depth_mm.astype(np.float32) / 1000.0
        xyz = compute_xyz_np(depth, ds.f, ds.f, ds.cx, ds.cy)
        gt = gt.astype(np.int32)

        t0 = time.time()
        t_labels, t_refined = po.torch_pipeline(twin, img, xyz, gt)
        t_torch = time.time() - t0
        t0 = time.time()
        j_labels, j_refined = po.jax_pipeline(
            fmodel, variables, img, xyz,
            stage1_labels=t_labels if args.common_stage1 else None)
        t_jax = time.time() - t0

        r = {"scene": scene, "torch_s": t_torch, "jax_s": t_jax,
             "agree1": float((t_labels == j_labels).mean())}
        mt1 = multilabel_metrics(t_labels.astype(np.int32), gt)
        mj1 = multilabel_metrics(j_labels.astype(np.int32), gt)
        mt2 = multilabel_metrics(t_refined.astype(np.int32), gt)
        mj2 = multilabel_metrics(j_refined.astype(np.int32), gt)
        r.update(tOF1=mt1["Objects F-measure"], jOF1=mj1["Objects F-measure"],
                 tBF1=mt1["Boundary F-measure"],
                 jBF1=mj1["Boundary F-measure"],
                 tOF2=mt2["Objects F-measure"], jOF2=mj2["Objects F-measure"],
                 tBF2=mt2["Boundary F-measure"],
                 jBF2=mj2["Boundary F-measure"])
        rows.append(r)
        print(f"scene {scene}: stage1 OF torch {r['tOF1']:.3f} / jax "
              f"{r['jOF1']:.3f}  refined OF {r['tOF2']:.3f} / {r['jOF2']:.3f}"
              f"  agree {r['agree1']:.3f}  ({t_torch:.0f}s / {t_jax:.0f}s)",
              flush=True)

    def col(k):
        return np.array([r[k] for r in rows])

    lines = [
        "# Whole-pipeline parity run: torch oracle vs JAX stack",
        "",
        f"Topology: ResNet34-8s dual-tower add, {po.NUM_UNITS}-D, layers "
        f"{po.LAYERS}; resolution {po.H}x{po.W}; {args.scenes} rendered "
        "scenes; identical converted weights; pinned first seeds "
        "(tests/test_pipeline_oracle.py machinery).",
        "",
        "| scene | stage-1 OF (torch/jax) | stage-1 BF | refined OF | "
        "refined BF | label agree |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['scene']} | {r['tOF1']:.3f} / {r['jOF1']:.3f} "
            f"| {r['tBF1']:.3f} / {r['jBF1']:.3f} "
            f"| {r['tOF2']:.3f} / {r['jOF2']:.3f} "
            f"| {r['tBF2']:.3f} / {r['jBF2']:.3f} | {r['agree1']:.3f} |")
    d1 = np.abs(col("tOF1") - col("jOF1"))
    d2 = np.abs(col("tOF2") - col("jOF2"))
    b1 = np.abs(col("tBF1") - col("jBF1"))
    b2 = np.abs(col("tBF2") - col("jBF2"))
    lines += [
        "",
        f"Mean |delta|: stage-1 Objects F {d1.mean():.4f}, Boundary F "
        f"{b1.mean():.4f}; refined Objects F {d2.mean():.4f}, Boundary F "
        f"{b2.mean():.4f}.",
        f"Max |delta|: stage-1 Objects F {d1.max():.4f}, Boundary F "
        f"{b1.max():.4f}; refined Objects F {d2.max():.4f}, Boundary F "
        f"{b2.max():.4f}.  Mean stage-1 pixel agreement "
        f"{col('agree1').mean():.4f}.",
    ]
    if args.common_stage1:
        lines += [
            "",
            "Mode: --common-stage1 — both stacks refined the TORCH stack's "
            "stage-1 labels, so stage-1 columns are identical by "
            "construction and the refined deltas above measure stage-2 "
            "semantics alone (crop extraction, zoom-in forward, per-crop "
            "clustering, veto/order, paste-back).",
        ]
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
