#!/usr/bin/env python3
"""Train an unseen-object embedding network (CLI parity with the reference
tools/train_net.py:30-160).

Example:
  python tools/train_net.py \
      --network seg_resnet34_8s_embedding --dataset tabletop_object_train \
      --cfg experiments/cfgs/seg_resnet34_8s_embedding_cosine_rgbd_add_tabletop.yml \
      --solver adam --epochs 16
"""

import argparse

import _init_paths  # noqa: F401  (repo-root import bootstrap)
import pprint
import sys

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(
        description="Train an unseen-object clustering network (TPU)")
    parser.add_argument("--epochs", type=int, default=16)
    parser.add_argument("--startepoch", type=int, default=0)
    parser.add_argument("--pretrained", type=str, default=None,
                        help="initialize with pretrained checkpoint "
                             "(.pth or orbax dir)")
    parser.add_argument("--resume", type=str, default=None,
                        help="orbax dir: restore the FULL train state "
                             "(params + optimizer + step) for exact resume")
    parser.add_argument("--cfg", dest="cfg_file", type=str, default=None)
    parser.add_argument("--solver", type=str, default="sgd",
                        choices=("adam", "sgd"))
    parser.add_argument("--dataset", dest="dataset_name", type=str,
                        default="tabletop_object_train")
    parser.add_argument("--dataset_root", type=str, default=None)
    parser.add_argument("--rand", dest="randomize", action="store_true")
    parser.add_argument("--network", dest="network_name", type=str,
                        default="seg_resnet34_8s_embedding")
    parser.add_argument("--batch_size", type=int, default=None,
                        help="override cfg.TRAIN.IMS_PER_BATCH")
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--max_k", type=int, default=32,
                        help="static bound on GT instances per image")
    parser.add_argument("--bf16", action="store_true",
                        help="mixed precision: bf16 conv stack, fp32 "
                             "params/optimizer/loss")
    parser.add_argument("--device-augment", action="store_true",
                        help="run the augmentation stack on-device fused "
                             "into the train step (synthetic datasets only; "
                             "the loader emits raw cached scenes)")
    parser.add_argument("--device-resident", action="store_true",
                        help="upload the whole render cache to HBM once and "
                             "train from device-resident scenes (implies "
                             "--device-augment; avoids per-step host->device "
                             "streaming entirely)")
    parser.add_argument("--resident-limit", type=int, default=None,
                        help="cap on resident scenes (HBM budget)")
    parser.add_argument("--render-cache", type=str, default=None,
                        help="on-disk scene cache dir for the procedural "
                             "renderer (see tools/render_dataset.py)")
    parser.add_argument("--keep", type=int, default=4,
                        help="orbax snapshots to retain (disk budget: "
                             "study runs keep<=2, flagship may keep more)")
    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit(1)
    return parser.parse_args()


def main():
    args = parse_args()
    from unseenobjectclustering_tpu.utils.profiling import (
        enable_persistent_compile_cache)
    enable_persistent_compile_cache()
    print("Called with args:")
    print(args)

    from unseenobjectclustering_tpu.config import Config, get_output_dir
    from unseenobjectclustering_tpu.data import DataLoader, get_dataset
    from unseenobjectclustering_tpu.engine.builder import (
        load_network_variables)
    from unseenobjectclustering_tpu.engine.train import (create_train_state,
                                                         train_epochs)
    from unseenobjectclustering_tpu.parallel import make_mesh, replicate

    cfg = (Config.from_yaml(args.cfg_file) if args.cfg_file
           else Config.default())
    cfg = cfg.replace(MODE="TRAIN")
    print("Using config:")
    pprint.pprint(cfg.to_dict())

    if not args.randomize:
        np.random.seed(cfg.RNG_SEED)

    dataset = get_dataset(args.dataset_name, cfg, path=args.dataset_root)
    if args.render_cache is not None:
        assert hasattr(dataset, "cache_dir"), (
            f"{args.dataset_name} has no render cache")
        dataset.cache_dir = args.render_cache
    if args.device_resident:
        args.device_augment = True
    if args.device_augment:
        assert hasattr(dataset, "raw"), (
            f"{args.dataset_name} has no raw mode (synthetic datasets only)")
        assert args.device_resident or not cfg.TRAIN.SYN_CROP, (
            "--device-augment covers the full-image path; crop training "
            "needs --device-resident (make_device_augment_crop) or the "
            "host pipeline")
        dataset.raw = True
    output_dir = get_output_dir(cfg, dataset.name)
    print(f"Output will be saved to `{output_dir}`")

    batch = args.batch_size or int(cfg.TRAIN.IMS_PER_BATCH)
    import jax
    mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    if batch % n_dev:
        batch = (batch // n_dev + 1) * n_dev
        print(f"rounded batch to {batch} for {n_dev} devices")
    loader = DataLoader(dataset, batch_size=batch, shuffle=True,
                        num_workers=args.workers, seed=int(cfg.RNG_SEED))

    sample_hw = (int(cfg.TRAIN.SYN_CROP_SIZE),) * 2 if cfg.TRAIN.SYN_CROP \
        else (480, 640)
    variables = load_network_variables(cfg, args.network_name,
                                       args.pretrained, *sample_hw)
    import jax.numpy as jnp
    # the optimizer's MultiStepLR milestones are baked into state.tx in
    # epoch units x steps/epoch — use the RESIDENT steps/epoch when
    # --resident-limit (or a smaller cache) shrinks the epoch, so the
    # applied schedule matches the one train_epochs_resident logs
    if args.device_resident:
        n_res = args.resident_limit or len(dataset)
        steps_per_epoch = max(n_res // batch, 1)
    else:
        steps_per_epoch = len(loader)
    # Milestone convention must match the optimizer count convention:
    #   --startepoch alone = reference-style continue from bare weights
    #     (fresh optimizer count 0 -> milestones RELATIVE to startepoch,
    #     tools/train_net.py:142 in the reference);
    #   --resume = exact restore (optimizer count is the ABSOLUTE step ->
    #     milestones stay absolute, start_epoch 0 in the schedule).
    schedule_start = 0 if args.resume else args.startepoch
    state = create_train_state(
        cfg, network_name=args.network_name, solver=args.solver,
        steps_per_epoch=steps_per_epoch, start_epoch=schedule_start,
        height=sample_hw[0], width=sample_hw[1], variables=variables,
        model_dtype=jnp.bfloat16 if args.bf16 else None)
    if args.resume:
        # exact resume: params + batch stats + optimizer state + step
        # (the reference can only restart from bare weights, SURVEY.md §5)
        from unseenobjectclustering_tpu.utils.checkpoint import (
            restore_checkpoint)
        restored, ck_step = restore_checkpoint(
            args.resume, target={"step": state.step, "params": state.params,
                                 "batch_stats": state.batch_stats,
                                 "opt_state": state.opt_state})
        state = state.replace(step=restored["step"],
                              params=restored["params"],
                              batch_stats=restored["batch_stats"],
                              opt_state=restored["opt_state"])
        args.startepoch = max(args.startepoch, int(ck_step))
        print(f"=> resumed full train state at epoch {ck_step}")
    state = replicate(state, mesh)

    intrinsics = None
    if args.device_augment:
        intrinsics = (dataset.f, dataset.f, dataset.cx, dataset.cy)

    print(f"=> training on {n_dev} device(s): {mesh}")
    if args.device_resident:
        import os

        from unseenobjectclustering_tpu.data.resident import (
            load_resident_scenes)
        from unseenobjectclustering_tpu.engine.train import (
            train_epochs_resident)
        assert getattr(dataset, "cache_dir", None), (
            "--device-resident needs an on-disk scene cache: pass "
            "--render-cache DIR (see tools/render_dataset.py)")
        scene_dir = os.path.dirname(dataset._scene_path(0))
        # same params.json guard the streaming path applies in get_scene:
        # refuse a cache rendered under different scene parameters
        dataset.check_cache_manifest()
        scenes = load_resident_scenes(
            scene_dir, limit=args.resident_limit or len(dataset), mesh=mesh)
        n_res = int(scenes[0].shape[0])
        gb = sum(x.size * x.dtype.itemsize for x in scenes) / 2 ** 30
        print(f"=> device-resident: {n_res} scenes ({gb:.1f} GiB) in HBM")
        train_epochs_resident(cfg, state, scenes, epochs=args.epochs,
                              batch_size=batch, start_epoch=args.startepoch,
                              solver=args.solver, output_dir=output_dir,
                              mesh=mesh, max_k=args.max_k,
                              intrinsics=intrinsics, seed=int(cfg.RNG_SEED),
                              crop=bool(cfg.TRAIN.SYN_CROP), keep=args.keep)
    else:
        train_epochs(cfg, state, loader, epochs=args.epochs,
                     start_epoch=args.startepoch, solver=args.solver,
                     output_dir=output_dir, mesh=mesh, max_k=args.max_k,
                     intrinsics=intrinsics, seed=int(cfg.RNG_SEED),
                     keep=args.keep)


if __name__ == "__main__":
    main()
