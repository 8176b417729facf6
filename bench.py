"""Benchmark: end-to-end RGB-D segmentation throughput at 640x480.

Measures the flagship stage-1 pipeline (the reference demo path,
lib/fcn/test_dataset.py:232-252): on-device preprocessing (normalize +
depth->XYZ backprojection), ResNet34-8s RGBD-add forward, unit-norm
embeddings, fused-Pallas vMF mean-shift clustering, depth validity filter.

Timing methodology: ITERS frames are dependency-chained inside ONE compiled
lax.scan (frame i+1's input depends on frame i's labels), so the device must
execute them serially, result caching is impossible, and a single host fetch
bounds total device time.  This measures pure per-chip throughput — robust
to async-dispatch / RPC-tunnel artifacts that make per-call
block_until_ready unreliable (measured: per-call dispatch through the axon
tunnel costs ~85 ms/frame of pure RPC overhead).

Default mode is the production-fast configuration (bfloat16 conv stack +
bfloat16 similarity matmuls + stride-8 farthest-point seeding,
the FAST_CLUSTER preset); pass
--parity for the reference-exact float32 / full-seeding path.  --refine
adds the stage-2 zoom-in (optionally --crop-size 128 for the fast
128^2-trained crop net); --batch N measures aggregate multi-frame
serving throughput (measured on v5e: B=1 already saturates the chip —
87 fps at B=4 vs 92 single-frame — so the default single-frame number
is also the throughput ceiling).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured fps / 60 — the north-star target of
>= 60 RGB-D frames/sec/chip on v5e (BASELINE.json; the reference publishes
no throughput numbers, SURVEY.md §6).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 480, 640
ITERS = 30
TARGET_FPS = 60.0

_T0 = time.monotonic()
_PHASE = "startup"


def _bc(phase: str) -> None:
    """Phase breadcrumb on stderr so a driver log can tell 'compiling'
    from 'hung tunnel' at a glance (round-4 BENCH_r04.json was rc=124
    with NOTHING on stdout — undiagnosable)."""
    global _PHASE
    _PHASE = phase
    print(f"[bench +{time.monotonic() - _T0:6.1f}s] {phase}",
          file=sys.stderr, flush=True)


def _setup_compile_cache() -> None:
    """Persistent XLA compilation cache in a repo-local dir.

    The 480x640 stage-1 program takes 2-4 min to compile cold (CLAUDE.md);
    a fresh driver process used to repay that in full and could blow the
    driver's timeout (BENCH_r04.json rc=124).  The cache is pre-warmed at
    snapshot time, so the driver's run skips straight to execution."""
    cache_dir = os.environ.get(
        "BENCH_XLA_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".xla_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as exc:  # cache is an optimization, never fatal
        print(f"[bench] compile cache unavailable: {exc}", file=sys.stderr)


def _arm_watchdog() -> None:
    """Whole-run deadline (env BENCH_DEADLINE_S, default 540 — safely under
    a plausible 600 s driver timeout).  A daemon thread, not SIGALRM: the
    hang modes observed through the axon tunnel block inside C++ RPC calls
    where a Python signal handler cannot run until the call returns (a dead
    tunnel hung jax.devices() for 5+ h).  On expiry it emits ONE structured
    JSON line naming the phase that was live, then hard-exits."""
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "540"))
    if deadline <= 0:
        return

    def _expire():
        print(json.dumps({
            "metric": _metric_name(),
            "value": None,
            "unit": "frames/sec/chip",
            "vs_baseline": None,
            "error": "bench-deadline-exceeded",
            "phase": _PHASE,
            "deadline_s": deadline,
        }), flush=True)
        print(f"[bench +{time.monotonic() - _T0:6.1f}s] DEADLINE "
              f"({deadline:.0f}s) exceeded in phase '{_PHASE}'",
              file=sys.stderr, flush=True)
        os._exit(4)

    t = threading.Timer(deadline, _expire)
    t.daemon = True
    t.start()


def build_refine_pipeline(fast: bool, max_instances: int = 8,
                          crop_size: int = 224,
                          network: str = "seg_resnet34_8s_embedding",
                          crop_network: str = "seg_resnet34_8s_embedding",
                          pretrained: str | None = None,
                          pretrained_crop: str | None = None):
    """Two-stage (zoom-in) demo-path benchmark (test_dataset.py:232-267).

    Stage 1 runs the full backbone + clustering + depth filter; stage 2
    crops RoIs around the instances stage 1 actually predicted (one
    procedurally rendered scene — deterministic and representative, ~5-8
    instances), after the same on-device _dense_relabel sparse-id remap
    the production Segmentor._stage2_impl runs, then runs the zoom-in
    network on the padded crop batch and re-clusters each valid crop.
    Host paste-back (~1 ms numpy, ops/roi.py paste_back) is excluded: it
    cannot live inside the scan chain.

    With --pretrained/--pretrained-crop (orbax dirs or reference .pth) the
    stage-1 net predicts a REALISTIC instance count on the rendered scene,
    so the zoom-in workload matches production; random init over-segments
    and yields a denser, conservatively slower crop workload.
    """
    import numpy as np

    from unseenobjectclustering_tpu.config import Config
    from unseenobjectclustering_tpu.data.synthetic import (
        SyntheticTabletopDataset)
    from unseenobjectclustering_tpu.engine.pipeline import _cluster_crops
    from unseenobjectclustering_tpu.models import get_network
    from unseenobjectclustering_tpu.ops.mean_shift import mean_shift_smart_init
    from unseenobjectclustering_tpu.ops.preprocess import (compute_xyz,
                                                           normalize_bgr)
    from unseenobjectclustering_tpu.ops.roi import crop_rois, veto_and_order
    from unseenobjectclustering_tpu.ops.train_pipeline import _dense_relabel

    cfg = Config.default()
    on_tpu = jax.default_backend() == "tpu"
    model_dtype = jnp.bfloat16 if (fast and on_tpu) else jnp.float32
    model = get_network(network, cfg, dtype=model_dtype)
    model_crop = get_network(crop_network, cfg, dtype=model_dtype)
    key = jax.random.PRNGKey(3)
    zeros = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(key, zeros, zeros, train=False)
    zc = jnp.zeros((1, crop_size, crop_size, 3), jnp.float32)
    variables_crop = model_crop.init(jax.random.PRNGKey(4), zc, zc,
                                     train=False)
    if pretrained:
        from unseenobjectclustering_tpu.engine.builder import (
            load_network_variables)
        variables = load_network_variables(cfg, network, pretrained, H, W)
    if pretrained_crop:
        from unseenobjectclustering_tpu.engine.builder import (
            load_network_variables)
        variables_crop = load_network_variables(
            cfg, crop_network, pretrained_crop, crop_size, crop_size)

    # one deterministic rendered scene: realistic object count / extents
    ds = SyntheticTabletopDataset("test", cfg, height=H, width=W, size=1)
    bgr, depth_m, _ = ds.get_scene(0)
    img = normalize_bgr(jnp.asarray(bgr), jnp.asarray(cfg.pixel_means))
    xyz = compute_xyz(jnp.asarray(depth_m.astype(np.float32) / 1000.0),
                      jnp.float32(ds.f), jnp.float32(ds.f),
                      jnp.float32(ds.cx), jnp.float32(ds.cy),
                      height=H, width=W)

    num_seeds = int(cfg.CLUSTER.NUM_SEEDS)
    ms_kw = dict(kappa=float(cfg.CLUSTER.KAPPA), num_seeds=num_seeds,
                 max_iters=int(cfg.CLUSTER.MAX_ITERS),
                 epsilon=float(cfg.cluster_epsilon), metric="cosine",
                 use_pallas=on_tpu, seed_subsample=8 if fast else 1,
                 compute_dtype="bfloat16" if (fast and on_tpu) else "float32")

    @jax.jit
    def run_frames(variables, variables_crop, img, xyz, keys):
        def body(carry, key):
            img_i = img + carry * 1e-12  # serialize frames
            feats = model.apply(variables, img_i[None], xyz[None],
                                train=False)
            res = mean_shift_smart_init(
                feats.reshape(H * W, feats.shape[-1]), key,
                z_valid=(xyz[..., 2] > 0).reshape(H * W),
                filter_threshold=0.8, **ms_kw)
            labels1 = res.labels.reshape(H, W)
            # production route (Segmentor._stage2_impl): sparse post-filter
            # ids -> dense, then crop the PREDICTED instances
            labels_dense = _dense_relabel(labels1, max_id=num_seeds)
            crops = crop_rois(img_i, labels_dense, xyz,
                              max_instances=max_instances,
                              crop_size=crop_size)
            feats_c = model_crop.apply(variables_crop, crops.rgb_crops,
                                       crops.depth_crops, train=False)
            keys_c = jax.random.split(key, max_instances)
            labels_crop = _cluster_crops(feats_c, crops.valid, keys_c,
                                         **ms_kw)
            labels_veto, order_key = veto_and_order(
                labels_crop, crops.mask_crops, crops.depth_crops[..., 2],
                crops.valid, max_labels=num_seeds + 1)
            out = (labels1.sum() + labels_veto.sum()
                   + order_key.sum().astype(jnp.int32))
            return out.astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return c

    args = (variables, variables_crop, img, xyz)
    return run_frames, args


def build_pipeline(fast: bool, batch: int = 1, subsample: int = 8,
                   network: str = "seg_resnet34_8s_embedding"):
    """Stage-1 pipeline benchmark.

    batch > 1 measures aggregate serving throughput: each scan step
    preprocesses + forwards a batch of frames through the backbone in one
    batched conv stack (better MXU utilization than B=1) and clusters each
    frame's embeddings; scan steps stay dependency-chained so the device
    executes them serially.
    """
    from unseenobjectclustering_tpu.config import Config
    from unseenobjectclustering_tpu.models import get_network
    from unseenobjectclustering_tpu.ops.mean_shift import mean_shift_smart_init
    from unseenobjectclustering_tpu.ops.preprocess import preprocess_rgbd

    cfg = Config.default()
    on_tpu = jax.default_backend() == "tpu"
    model_dtype = jnp.bfloat16 if (fast and on_tpu) else jnp.float32
    model = get_network(network, cfg, dtype=model_dtype)
    key = jax.random.PRNGKey(3)
    zeros = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(key, zeros, zeros, train=False)

    kappa = float(cfg.CLUSTER.KAPPA)
    num_seeds = int(cfg.CLUSTER.NUM_SEEDS)
    max_iters = int(cfg.CLUSTER.MAX_ITERS)
    epsilon = float(cfg.cluster_epsilon)
    pixel_means = jnp.asarray(cfg.pixel_means)
    compute_dtype = "bfloat16" if (fast and on_tpu) else "float32"
    seed_subsample = subsample if fast else 1

    def cluster_one(features_hw_c, key, z_valid):
        res = mean_shift_smart_init(
            features_hw_c, key,
            kappa=kappa, num_seeds=num_seeds, max_iters=max_iters,
            epsilon=epsilon, metric="cosine", use_pallas=on_tpu,
            seed_subsample=seed_subsample, compute_dtype=compute_dtype,
            z_valid=z_valid, filter_threshold=0.8)
        return res.labels.reshape(H, W)

    @jax.jit
    def run_frames(variables, bgr_u8, depth_m, intrinsics, keys):
        fx, fy, px, py = intrinsics

        def body(carry, key):
            # chain: this frame's input depends on the previous labels,
            # forcing serial execution and defeating result caching
            bgr_i = bgr_u8 + (carry[0, 0] % 2).astype(jnp.uint8)
            img, xyz = preprocess_rgbd(bgr_i, depth_m, pixel_means, fx, fy,
                                       px, py, height=H, width=W)
            features = model.apply(variables, img[None], xyz[None],
                                   train=False)
            res = mean_shift_smart_init(
                features.reshape(H * W, features.shape[-1]), key,
                kappa=kappa, num_seeds=num_seeds, max_iters=max_iters,
                epsilon=epsilon, metric="cosine", use_pallas=on_tpu,
                seed_subsample=seed_subsample, compute_dtype=compute_dtype,
                z_valid=(xyz[..., 2] > 0).reshape(H * W),
                filter_threshold=0.8)
            labels = res.labels.reshape(H, W)
            return labels, ()

        labels, _ = jax.lax.scan(body, jnp.zeros((H, W), jnp.int32), keys)
        return labels

    @jax.jit
    def run_batches(variables, bgr_u8, depth_m, intrinsics, keys):
        # bgr_u8/depth_m: [batch, H, W, ...]; keys: [steps, batch, 2]
        fx, fy, px, py = intrinsics

        def body(carry, key_b):
            bgr_b = bgr_u8 + (carry[0, 0] % 2).astype(jnp.uint8)
            img_b, xyz_b = jax.vmap(
                lambda b, d: preprocess_rgbd(b, d, pixel_means, fx, fy,
                                             px, py, height=H, width=W)
            )(bgr_b, depth_m)
            features = model.apply(variables, img_b, xyz_b, train=False)
            feats = features.reshape(batch, H * W, features.shape[-1])
            zv = (xyz_b[..., 2] > 0).reshape(batch, H * W)
            # clustering is per-frame; lax.map keeps one kernel instance
            # live at a time (the fused Pallas seeding kernel is
            # VMEM-resident and must not be batch-instantiated)
            labels = jax.lax.map(
                lambda a: cluster_one(a[0], a[1], a[2]), (feats, key_b, zv))
            return labels[0], ()

        first, _ = jax.lax.scan(body, jnp.zeros((H, W), jnp.int32), keys)
        return first

    if batch > 1:
        return run_batches, variables
    return run_frames, variables


def _metric_name() -> str:
    if "--refine" in sys.argv:
        return "rgbd_two_stage_fps_640x480"
    if "--batch" in sys.argv:
        return "rgbd_segmentation_batched_fps_640x480"
    return "rgbd_segmentation_fps_640x480"


def _emit_backend_error(detail: str) -> None:
    """One structured JSON line so the driver log distinguishes a TPU
    outage from a perf regression at a glance (round-2 BENCH failure mode:
    rc=1 with a 40-line traceback when the axon tunnel was down)."""
    print(json.dumps({
        "metric": _metric_name(),
        "value": None,
        "unit": "frames/sec/chip",
        "vs_baseline": None,
        "error": "tpu-backend-unavailable",
        "detail": detail[:300],
    }))


def _probe_backend(timeout_s: int = 240) -> None:
    """Bound backend init: through the axon tunnel a dead backend either
    raises ('Unable to initialize backend') or HANGS jax.devices() forever
    (observed 5+ h, CLAUDE.md) — the SIGALRM turns the hang into the same
    structured error line."""
    import signal

    def _on_alarm(signum, frame):
        raise TimeoutError(f"backend init exceeded {timeout_s}s")

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(timeout_s)
    try:
        jax.devices()
    except Exception as exc:  # noqa: BLE001 - any init failure is an outage
        _emit_backend_error(f"{type(exc).__name__}: {exc}")
        sys.exit(3)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


_USAGE = ("usage: bench.py [--parity] [--refine] [--network NAME] "
          "[--crop-size N] [--crop-net NAME] [--batch N] [--subsample N] "
          "[--pretrained DIR] [--pretrained-crop DIR]")
_KNOWN_FLAGS = {"--parity", "--refine"}
_KNOWN_VALUED = {"--network", "--crop-size", "--crop-net", "--batch",
                 "--subsample", "--pretrained", "--pretrained-crop"}


def _check_argv() -> None:
    """Reject unknown flags instead of silently running the default bench
    (a stray --help used to burn a full TPU measurement)."""
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in _KNOWN_FLAGS:
            i += 1
        elif a in _KNOWN_VALUED:
            if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
                # catches `--pretrained --parity` BEFORE the backend probe
                print(_USAGE, file=sys.stderr)
                sys.exit(f"{a} needs a value")
            i += 2
        else:
            print(_USAGE, file=sys.stderr)
            sys.exit(0 if a in ("-h", "--help") else 2)


def _valued(flag: str) -> str | None:
    if flag not in sys.argv:
        return None
    i = sys.argv.index(flag)
    if i + 1 >= len(sys.argv) or sys.argv[i + 1].startswith("--"):
        # another flag is not a value: `--pretrained --parity` must fail
        # loudly, not consume --parity as a checkpoint path
        print(_USAGE, file=sys.stderr)
        sys.exit(f"{flag} needs a value")
    return sys.argv[i + 1]


def main():
    _check_argv()
    _arm_watchdog()
    _setup_compile_cache()
    _bc("probe-backend")
    _probe_backend()
    fast = "--parity" not in sys.argv
    refine = "--refine" in sys.argv

    if refine:
        iters = 10
        crop_size = 224
        if "--crop-size" in sys.argv:
            i = sys.argv.index("--crop-size")
            if i + 1 >= len(sys.argv) or not sys.argv[i + 1].isdigit():
                sys.exit("--crop-size needs an integer value, e.g. "
                         "--crop-size 128")
            crop_size = int(sys.argv[i + 1])
        crop_network = "seg_resnet34_8s_embedding"
        if "--crop-net" in sys.argv:
            i = sys.argv.index("--crop-net")
            if i + 1 >= len(sys.argv):
                sys.exit("--crop-net needs a factory name, e.g. "
                         "--crop-net seg_resnet18_8s_embedding")
            crop_network = sys.argv[i + 1]
        _bc("build-refine-pipeline")
        run_frames, args = build_refine_pipeline(
            fast, crop_size=crop_size,
            network=_valued("--network") or "seg_resnet34_8s_embedding",
            crop_network=crop_network,
            pretrained=_valued("--pretrained"),
            pretrained_crop=_valued("--pretrained-crop"))
        keys = jax.random.split(jax.random.PRNGKey(7), iters)
        _bc("compile+warm")
        np.asarray(run_frames(*args, keys))  # warm + sync
        _bc("measure")
        t0 = time.perf_counter()
        np.asarray(run_frames(*args, keys))
        fps = iters / (time.perf_counter() - t0)
        _bc("done")
        print(json.dumps({
            "metric": "rgbd_two_stage_fps_640x480",
            "value": round(fps, 2),
            "unit": "frames/sec/chip",
            "vs_baseline": round(fps / TARGET_FPS, 3),
        }))
        return

    batch = 1
    if "--batch" in sys.argv:
        i = sys.argv.index("--batch")
        if i + 1 >= len(sys.argv) or not sys.argv[i + 1].isdigit():
            sys.exit("--batch needs an integer value, e.g. --batch 4")
        batch = int(sys.argv[i + 1])
    subsample = 8
    if "--subsample" in sys.argv:
        i = sys.argv.index("--subsample")
        if i + 1 >= len(sys.argv) or not sys.argv[i + 1].isdigit():
            sys.exit("--subsample needs an integer value, e.g. "
                     "--subsample 8")
        subsample = int(sys.argv[i + 1])

    _bc("build-pipeline")
    run_frames, variables = build_pipeline(
        fast, batch=batch, subsample=subsample,
        network=_valued("--network") or "seg_resnet34_8s_embedding")

    rng = np.random.RandomState(3)
    intr = tuple(jnp.float32(v) for v in (615.0, 615.0, W / 2.0, H / 2.0))

    if batch > 1:
        steps = max(1, ITERS // batch)
        bgr = jnp.asarray(rng.randint(0, 255, size=(batch, H, W, 3)),
                          jnp.uint8)
        depth = jnp.asarray(0.5 + rng.rand(batch, H, W).astype(np.float32))
        keys = jax.random.split(jax.random.PRNGKey(7),
                                steps * batch).reshape(steps, batch, -1)
        nframes = steps * batch
        metric = "rgbd_segmentation_batched_fps_640x480"
    else:
        bgr = jnp.asarray(rng.randint(0, 255, size=(H, W, 3)), jnp.uint8)
        depth = jnp.asarray(0.5 + rng.rand(H, W).astype(np.float32))
        keys = jax.random.split(jax.random.PRNGKey(7), ITERS)
        nframes = ITERS
        metric = "rgbd_segmentation_fps_640x480"

    _bc("compile+warm")
    np.asarray(run_frames(variables, bgr, depth, intr, keys))  # warm + sync
    _bc("measure")
    t0 = time.perf_counter()
    np.asarray(run_frames(variables, bgr, depth, intr, keys))
    dt = time.perf_counter() - t0
    fps = nframes / dt
    _bc("done")

    print(json.dumps({
        "metric": metric,
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / TARGET_FPS, 3),
    }))


if __name__ == "__main__":
    main()
