#!/usr/bin/env python3
"""Per-stage device-time breakdown of the stage-1 pipeline at 640x480.

Each variant scan-chains ITERS frames (frame i+1 depends on frame i's
output) and is timed with one host fetch — the same methodology as
bench.py, so the full variant reproduces its fps.  Successive variants add
one pipeline stage; the deltas attribute ms/frame to each stage:

  pre            on-device preprocessing (normalize + backprojection)
  +fwd           ResNet34-8s RGBD-add forward + L2 normalize
  +seed          farthest-point seeding
  +climb         vMF hill climb + connected components + assignment
  +filter        depth validity filter (= bench.py's full stage 1)

--stage2 appends the zoom-in attribution on top of the full stage 1
(the production Segmentor._stage2_impl route bench.py --refine times):

  +relabel       sparse post-filter ids -> dense (_dense_relabel)
  +crop          RoI extraction + resize to crop_size^2 (crop_rois)
  +cropfwd       zoom-in network forward on the padded crop batch
  +cropclust     per-crop mean-shift re-clustering (_cluster_crops)
  +veto          overlap veto + depth ordering (veto_and_order)

Usage: python tools/bench_stages.py [--parity] [--stage2]
           [--crop-size 128] [--crop-net seg_resnet18_8s_embedding]
"""

import argparse
import os
import time

import _init_paths  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

H, W = 480, 640
ITERS = 30

_DISPATCH_MS = None


def _setup_compile_cache() -> None:
    """Same repo-local persistent XLA cache as bench.py."""
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".xla_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def _dispatch_baseline_ms() -> float:
    """Per-call dispatch+fetch overhead through the axon tunnel (~85 ms,
    jittering by tens of ms under host load).  Measured once (min of 5
    calls to a trivial jitted program) and subtracted from every variant:
    round 4 timed each variant with ONE un-baselined call, which is where
    the 10-15% bench_stages-vs-bench.py disagreement (and the implausible
    94%-MFU backbone row in docs/MFU.md) came from."""
    global _DISPATCH_MS
    if _DISPATCH_MS is None:
        f = jax.jit(lambda x: x + 1.0)
        np.asarray(f(jnp.float32(0)))  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(jnp.float32(1)))
            ts.append(time.perf_counter() - t0)
        _DISPATCH_MS = min(ts) * 1e3
    return _DISPATCH_MS


def _measure_ms(run, run_args, iters: int, reps: int = 3) -> float:
    """ms/frame: warm once, min of `reps` timed calls, minus the dispatch
    baseline, per chained frame."""
    np.asarray(run(*run_args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(*run_args))
        ts.append(time.perf_counter() - t0)
    return (min(ts) * 1e3 - _dispatch_baseline_ms()) / iters


def main():
    _setup_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true",
                    help="fp32 + stride-1 seeding (reference-exact)")
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--stage2", action="store_true",
                    help="attribute the zoom-in stages on top of stage 1")
    ap.add_argument("--crop-size", type=int, default=224)
    ap.add_argument("--crop-net", default="seg_resnet34_8s_embedding")
    ap.add_argument("--network", default="seg_resnet34_8s_embedding",
                    help="stage-1 network factory name (e.g. the "
                         "seg_resnet18_8s_embedding frontier variant)")
    ap.add_argument("--max-instances", type=int, default=8)
    ap.add_argument("--pretrained", default=None,
                    help="orbax dir / torch .pth for the stage-1 net — a "
                         "trained net predicts a realistic instance count "
                         "on the rendered scene, so _cluster_crops' "
                         "cond-skip workload matches production (random "
                         "init leaves most crop slots invalid)")
    ap.add_argument("--pretrained-crop", default=None,
                    help="weights for the zoom-in net")
    ap.add_argument("--flops", action="store_true",
                    help="per-stage FLOPs/bytes from XLA cost analysis "
                         "instead of timings (run under JAX_PLATFORMS=cpu: "
                         "the math is backend-independent and the CPU "
                         "lowering keeps every op visible to the analyzer "
                         "— Pallas custom calls report 0)")
    args = ap.parse_args()
    global H, W
    if args.height:
        H = args.height
    if args.width:
        W = args.width
    fast = not args.parity
    if args.flops:
        # force the CPU platform BEFORE the first jax op: under the axon
        # sitecustomize the JAX_PLATFORMS env alone does not stick
        # (CLAUDE.md), the TPU backend wins, use_pallas flips on, and the
        # hill climb disappears into an uncountable pallas_call
        jax.config.update("jax_platforms", "cpu")

    from unseenobjectclustering_tpu.config import FAST_CLUSTER, Config
    from unseenobjectclustering_tpu.models import get_network
    from unseenobjectclustering_tpu.ops.mean_shift import (
        MeanShiftResult, mean_shift_smart_init, select_seeds_dispatch)
    from unseenobjectclustering_tpu.ops.preprocess import preprocess_rgbd

    cfg = Config.default()
    on_tpu = jax.default_backend() == "tpu"
    model_dtype = jnp.bfloat16 if (fast and on_tpu) else jnp.float32
    model = get_network(args.network, cfg, dtype=model_dtype)
    zeros = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), zeros, zeros, train=False)
    if args.pretrained:
        from unseenobjectclustering_tpu.engine.builder import (
            load_network_variables)
        variables = load_network_variables(
            cfg, args.network, args.pretrained, H, W)

    num_seeds = int(cfg.CLUSTER.NUM_SEEDS)
    ms_kw = dict(kappa=float(cfg.CLUSTER.KAPPA), num_seeds=num_seeds,
                 max_iters=int(cfg.CLUSTER.MAX_ITERS),
                 epsilon=float(cfg.cluster_epsilon), metric="cosine",
                 use_pallas=on_tpu,
                 seed_subsample=(int(FAST_CLUSTER["SEED_SUBSAMPLE"])
                                 if fast else 1),
                 compute_dtype="bfloat16" if (fast and on_tpu) else "float32")
    pixel_means = jnp.asarray(cfg.pixel_means)
    sub = ms_kw["seed_subsample"]

    # NOTE: the network variables are threaded through as ARGUMENTS, not
    # closure constants — closed-over params get baked into the HLO as
    # literals and the axon remote-compile service rejects the oversized
    # request body (HTTP 413) once both stage nets are embedded.
    def stage_pre(vars_, bgr_i, depth, intr, key):
        fx, fy, px, py = intr
        img, xyz = preprocess_rgbd(bgr_i, depth, pixel_means, fx, fy, px, py,
                                   height=H, width=W)
        return img.sum() + xyz.sum(), None

    def stage_fwd(vars_, bgr_i, depth, intr, key):
        fx, fy, px, py = intr
        img, xyz = preprocess_rgbd(bgr_i, depth, pixel_means, fx, fy, px, py,
                                   height=H, width=W)
        feats = model.apply(vars_, img[None], xyz[None], train=False)
        return feats.sum().astype(jnp.float32), None

    def _feats(vars_, bgr_i, depth, intr):
        fx, fy, px, py = intr
        img, xyz = preprocess_rgbd(bgr_i, depth, pixel_means, fx, fy, px, py,
                                   height=H, width=W)
        feats = model.apply(vars_, img[None], xyz[None], train=False)
        return feats.reshape(H * W, feats.shape[-1]), xyz

    def stage_seed(vars_, bgr_i, depth, intr, key):
        x, _ = _feats(vars_, bgr_i, depth, intr)
        xc = (x.astype(jnp.bfloat16) if ms_kw["compute_dtype"] == "bfloat16"
              else x)
        # single authority for kernel routing — times the production path
        seeds, _ = select_seeds_dispatch(
            xc, ms_kw["num_seeds"], key, metric="cosine", use_pallas=on_tpu,
            seed_subsample=sub)
        return seeds.sum().astype(jnp.float32), None

    def stage_climb(vars_, bgr_i, depth, intr, key):
        x, _ = _feats(vars_, bgr_i, depth, intr)
        res = mean_shift_smart_init(x, key, **ms_kw)
        return res.labels.sum().astype(jnp.float32), None

    def stage_filter(vars_, bgr_i, depth, intr, key):
        x, xyz = _feats(vars_, bgr_i, depth, intr)
        res = mean_shift_smart_init(x, key,
                                    z_valid=(xyz[..., 2] > 0).reshape(H * W),
                                    filter_threshold=0.8, **ms_kw)
        return res.labels.sum().astype(jnp.float32), None

    rng = np.random.RandomState(3)
    bgr = jnp.asarray(rng.randint(0, 255, size=(H, W, 3)), jnp.uint8)
    depth = jnp.asarray(0.5 + rng.rand(H, W).astype(np.float32))
    intr = tuple(jnp.float32(v) for v in (615.0, 615.0, W / 2.0, H / 2.0))
    keys = jax.random.split(jax.random.PRNGKey(7), args.iters)

    def _cost(fn1):
        """MXU GFLOP of one frame by walking the traced jaxpr.

        Counts dot_general + conv_general_dilated only — the systolic-array
        work an MFU number is measured against (VPU elementwise excluded).
        Static-bound fori_loops/lax.map lower to `scan` (counted x length);
        the one data-dependent `while` (the parity path's lazy-bound
        blocked seeding, ops/mean_shift.py:194) is counted for ONE trip —
        an undercount bounded by its trip count, flagged in the output.
        `cond` is counted as max(branches), so the cond-skipped per-crop
        clustering is attributed as if EVERY crop slot executed — the
        +cropclust dGFLOP is an upper bound on production MXU work (the
        opposite bias of the while undercount)."""
        import numpy as _np

        whiles = [0]

        def walk(jaxpr):
            fl = 0.0
            for eqn in jaxpr.eqns:
                prim = eqn.primitive.name
                if prim == "dot_general":
                    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
                    a = eqn.invars[0].aval
                    b = eqn.invars[1].aval
                    batch = _np.prod([a.shape[i] for i in lb]) if lb else 1.0
                    k = _np.prod([a.shape[i] for i in lc]) if lc else 1.0
                    m = _np.prod([a.shape[i] for i in range(a.ndim)
                                  if i not in lc and i not in lb] or [1])
                    n = _np.prod([b.shape[i] for i in range(b.ndim)
                                  if i not in rc and i not in rb] or [1])
                    fl += 2.0 * batch * m * n * k
                elif prim == "conv_general_dilated":
                    out = eqn.outvars[0].aval
                    rhs = eqn.invars[1].aval
                    dn = eqn.params["dimension_numbers"]
                    spatial = [rhs.shape[i] for i in dn.rhs_spec[2:]]
                    cin_g = rhs.shape[dn.rhs_spec[1]]
                    fl += 2.0 * _np.prod(out.shape) * _np.prod(spatial) * cin_g
                elif prim == "scan":
                    fl += eqn.params["length"] * walk(eqn.params["jaxpr"].jaxpr)
                elif prim == "while":
                    whiles[0] += 1
                    fl += walk(eqn.params["body_jaxpr"].jaxpr)
                elif prim == "cond":
                    fl += max(walk(br.jaxpr)
                              for br in eqn.params["branches"])
                else:
                    inner = (eqn.params.get("jaxpr")
                             or eqn.params.get("call_jaxpr"))
                    if inner is not None:
                        fl += walk(getattr(inner, "jaxpr", inner))
            return fl

        closed = jax.make_jaxpr(fn1)(keys[0])
        return walk(closed.jaxpr) / 1e9, whiles[0]

    if args.flops and not args.stage2:
        prev = 0.0
        print(f"{'stage':10s} {'GFLOP':>9s} {'dGFLOP':>9s}  while-loops")
        for name, fn in [("pre", stage_pre), ("+fwd", stage_fwd),
                         ("+seed", stage_seed), ("+climb", stage_climb),
                         ("+filter", stage_filter)]:
            g, nw = _cost(lambda key, fn=fn: fn(variables, bgr, depth, intr, key)[0])
            print(f"{name:10s} {g:9.2f} {g - prev:9.2f}  {nw}")
            prev = g
        return

    results = []
    stage1_variants = [] if args.flops else [
        ("pre", stage_pre), ("+fwd", stage_fwd), ("+seed", stage_seed),
        ("+climb", stage_climb), ("+filter", stage_filter)]
    # flops mode skips ALL timing (CPU executes ~4 s/frame) and falls
    # through to the stage-2 flop table below
    for name, fn in stage1_variants:

        @jax.jit
        def run(variables_, keys_, fn=fn):
            def body(carry, key):
                # chain: frame input depends on the previous frame's output
                bgr_i = bgr + (carry.astype(jnp.int32) % 2).astype(jnp.uint8)
                out, _ = fn(variables_, bgr_i, depth, intr, key)
                return out.astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.float32(0), keys_)
            return c

        ms = _measure_ms(run, (variables, keys), args.iters)
        delta = ms - results[-1][1] if results else ms
        results.append((name, ms))
        print(f"{name:8s} {ms:7.2f} ms/frame  (+{delta:5.2f})", flush=True)

    if results:
        total = results[-1][1]
        print(f"full stage-1: {total:.2f} ms/frame = {1e3 / total:.1f} fps "
              f"({'fast' if fast else 'parity'})")

    if not args.stage2:
        return

    # -- stage-2 attribution (the bench.py --refine route) -------------------
    from unseenobjectclustering_tpu.data.synthetic import (
        SyntheticTabletopDataset)
    from unseenobjectclustering_tpu.engine.pipeline import _cluster_crops
    from unseenobjectclustering_tpu.ops.preprocess import (compute_xyz,
                                                           normalize_bgr)
    from unseenobjectclustering_tpu.ops.roi import crop_rois, veto_and_order
    from unseenobjectclustering_tpu.ops.train_pipeline import _dense_relabel

    crop_size = args.crop_size
    max_instances = args.max_instances
    model_crop = get_network(args.crop_net, cfg, dtype=model_dtype)
    zc = jnp.zeros((1, crop_size, crop_size, 3), jnp.float32)
    variables_crop = model_crop.init(jax.random.PRNGKey(4), zc, zc,
                                     train=False)
    if args.pretrained_crop:
        from unseenobjectclustering_tpu.engine.builder import (
            load_network_variables)
        variables_crop = load_network_variables(
            cfg, args.crop_net, args.pretrained_crop, crop_size, crop_size)

    # one deterministic rendered scene: realistic instance count/extents
    # (random pixels under-populate stage 2; same choice as bench.py)
    ds = SyntheticTabletopDataset("test", cfg, height=H, width=W, size=1)
    sc_bgr, sc_depth, _ = ds.get_scene(0)
    sc_img = normalize_bgr(jnp.asarray(sc_bgr), pixel_means)
    sc_xyz = compute_xyz(jnp.asarray(sc_depth.astype(np.float32) / 1000.0),
                         jnp.float32(ds.f), jnp.float32(ds.f),
                         jnp.float32(ds.cx), jnp.float32(ds.cy),
                         height=H, width=W)

    def s1(vars_, img_i, key):
        feats = model.apply(vars_, img_i[None], sc_xyz[None],
                            train=False)
        res = mean_shift_smart_init(
            feats.reshape(H * W, feats.shape[-1]), key,
            z_valid=(sc_xyz[..., 2] > 0).reshape(H * W),
            filter_threshold=0.8, **ms_kw)
        return img_i, res.labels.reshape(H, W)

    def v_stage1(vars_, varsc_, img_i, key):
        _, labels1 = s1(vars_, img_i, key)
        return labels1.sum().astype(jnp.float32)

    def v_relabel(vars_, varsc_, img_i, key):
        _, labels1 = s1(vars_, img_i, key)
        dense = _dense_relabel(labels1, max_id=num_seeds)
        return dense.sum().astype(jnp.float32)

    def _to_crops(vars_, img_i, key):
        img_i, labels1 = s1(vars_, img_i, key)
        dense = _dense_relabel(labels1, max_id=num_seeds)
        return labels1, crop_rois(img_i, dense, sc_xyz,
                                  max_instances=max_instances,
                                  crop_size=crop_size)

    def v_crop(vars_, varsc_, img_i, key):
        labels1, crops = _to_crops(vars_, img_i, key)
        return (labels1.sum() + crops.rgb_crops.sum().astype(jnp.int32)
                ).astype(jnp.float32)

    def v_cropfwd(vars_, varsc_, img_i, key):
        labels1, crops = _to_crops(vars_, img_i, key)
        feats_c = model_crop.apply(varsc_, crops.rgb_crops,
                                   crops.depth_crops, train=False)
        return (labels1.sum().astype(jnp.float32) + feats_c.sum()
                .astype(jnp.float32))

    def _to_labels_crop(vars_, varsc_, img_i, key):
        labels1, crops = _to_crops(vars_, img_i, key)
        feats_c = model_crop.apply(varsc_, crops.rgb_crops,
                                   crops.depth_crops, train=False)
        keys_c = jax.random.split(key, max_instances)
        return labels1, crops, _cluster_crops(feats_c, crops.valid, keys_c,
                                              **ms_kw)

    def v_cropclust(vars_, varsc_, img_i, key):
        labels1, _, labels_crop = _to_labels_crop(vars_, varsc_, img_i, key)
        return (labels1.sum() + labels_crop.sum()).astype(jnp.float32)

    def v_veto(vars_, varsc_, img_i, key):
        labels1, crops, labels_crop = _to_labels_crop(vars_, varsc_, img_i,
                                                      key)
        labels_veto, order_key = veto_and_order(
            labels_crop, crops.mask_crops, crops.depth_crops[..., 2],
            crops.valid, max_labels=num_seeds + 1)
        return (labels1.sum() + labels_veto.sum()
                + order_key.sum().astype(jnp.int32)).astype(jnp.float32)

    s2_variants = [("stage1*", v_stage1), ("+relabel", v_relabel),
                   ("+crop", v_crop), ("+cropfwd", v_cropfwd),
                   ("+cropclust", v_cropclust), ("+veto", v_veto)]

    if args.flops:
        prev = 0.0
        print(f"{'stage':10s} {'GFLOP':>9s} {'dGFLOP':>9s}  while-loops")
        for name, fn in s2_variants:
            g, nw = _cost(lambda key, fn=fn: fn(variables, variables_crop, sc_img, key))
            print(f"{name:10s} {g:9.2f} {g - prev:9.2f}  {nw}")
            prev = g
        return

    s2_results = []
    for name, fn in s2_variants:

        @jax.jit
        def run(variables_, variables_crop_, keys_, fn=fn):
            def body(carry, key):
                img_i = sc_img + carry * 1e-12  # serialize frames
                return fn(variables_, variables_crop_, img_i, key), ()
            c, _ = jax.lax.scan(body, jnp.float32(0), keys_)
            return c

        ms = _measure_ms(run, (variables, variables_crop, keys), args.iters)
        delta = ms - s2_results[-1][1] if s2_results else 0.0
        s2_results.append((name, ms))
        print(f"{name:10s} {ms:7.2f} ms/frame  (+{delta:5.2f})", flush=True)

    total2 = s2_results[-1][1]
    print(f"two-stage: {total2:.2f} ms/frame = {1e3 / total2:.1f} fps "
          f"(crop {crop_size}^2 {args.crop_net}, "
          f"{'fast' if fast else 'parity'}; "
          "stage1* re-times stage 1 on the rendered scene — deltas below "
          "it attribute the zoom-in)")


if __name__ == "__main__":
    main()
