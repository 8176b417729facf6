#!/usr/bin/env python3
"""Controlled phase breakdown of the stage-2 per-crop clustering.

Workload-independent companion to tools/bench_stages.py --stage2: the
crop-clustering cost there depends on how many crop slots a trained
stage-1 net leaves valid (VERDICT r4: random init makes most slots
invalid and the cond-skip reads 0.6 ms instead of the real ~9 ms).  Here
all M slots are forced valid with synthetic unit-norm embeddings — matmul
and seeding cost is data-independent — so the phase attribution is exact
and reproducible with no checkpoint.

Methodology: every phase is scan-chained (round i+1 depends on round i)
and timed at two chain lengths; the reported ms/frame is the MARGINAL
slope (t2 - t1) / (k2 - k1), which cancels both the ~85 ms tunnel
dispatch and the one-off host fetch (CLAUDE.md).  All arrays are threaded
as jit ARGUMENTS — a closure-captured device array becomes a jaxpr
constant, which the axon tunnel re-materializes per call (measured 7.7 s
for a 100 MB constant at 20 rounds vs 0.35 s as an argument).

Phases:

  seed     farthest-point seeding, M crops (select_seeds_dispatch route)
  climb    10-iteration vMF hill climb, M crops
  cc       connected components over converged seeds, M crops
  assign   pixel->seed assignment + histograms + bg swap, M crops
  full     _cluster_crops (the production lax.map+cond composite)

Usage: python tools/bench_crop_cluster.py [--parity] [--crop-size 224]
           [--m 8] [--iters 16]
"""

import argparse
import os
import time

import _init_paths  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

# repo-local persistent XLA cache (same dir as bench.py)
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".xla_cache")
try:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass


def _marginal_ms(make_run, args, k1: int, k2: int, reps: int = 3) -> float:
    """ms/round from the slope between chain lengths k1 and k2.

    min-of-reps per length: the ~85 ms tunnel dispatch jitters by tens of
    ms under host load, so a single pair of calls can even go negative.
    """
    run1, run2 = make_run(k1), make_run(k2)
    run1(*args), run2(*args)  # compile + warm both lengths

    def best(run):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(*args))  # host fetch = the only reliable sync
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(run2) - best(run1)) / (k2 - k1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true",
                    help="fp32 + stride-1 seeding (reference-exact)")
    ap.add_argument("--crop-size", type=int, default=224)
    ap.add_argument("--m", type=int, default=8, help="crop slots")
    ap.add_argument("--iters", type=int, default=16,
                    help="short chain length (long = 2x)")
    ap.add_argument("--d", type=int, default=64)
    args = ap.parse_args()

    from unseenobjectclustering_tpu.config import Config
    from unseenobjectclustering_tpu.engine.pipeline import _cluster_crops
    from unseenobjectclustering_tpu.ops.mean_shift import (
        connected_components, select_seeds_dispatch)

    cfg = Config.default()
    on_tpu = jax.default_backend() == "tpu"
    fast = not args.parity
    s, m_crops, d = args.crop_size, args.m, args.d
    n = s * s
    num_seeds = int(cfg.CLUSTER.NUM_SEEDS)
    kappa = float(cfg.CLUSTER.KAPPA)
    max_iters = int(cfg.CLUSTER.MAX_ITERS)
    epsilon = float(cfg.cluster_epsilon)
    ms_kw = dict(kappa=kappa, num_seeds=num_seeds, max_iters=max_iters,
                 epsilon=epsilon, metric="cosine", use_pallas=on_tpu,
                 seed_subsample=8 if fast else 1,
                 compute_dtype="bfloat16" if (fast and on_tpu)
                 else "float32")
    cdtype = jnp.bfloat16 if (fast and on_tpu) else jnp.float32

    # synthetic unit-norm embeddings, mildly clustered (8 blobs) so the
    # hill climb sees realistic weight mass rather than uniform noise
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(8, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = (centers[rng.integers(0, 8, size=(m_crops, n))]
         + 0.05 * rng.normal(size=(m_crops, n, d)))
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    feats = jnp.asarray(x.reshape(m_crops, s, s, d), jnp.float32)
    xc = jnp.asarray(x, cdtype)  # [M, n, d]
    valid = jnp.ones((m_crops,), bool)
    keys = jax.random.split(jax.random.PRNGKey(0), m_crops)
    # converged-ish seeds for the climb/cc/assign phases
    seeds0 = xc[:, :: n // num_seeds][:, :num_seeds]  # [M, m, d]
    sub = int(ms_kw["seed_subsample"])

    def chained(one_round):
        """make_run(iters) building a jitted scan chain of one_round.

        one_round(xc, seeds0, eps) -> f32 scalar; eps (a traced scalar
        derived from the carry) serializes the rounds.
        """
        def make(iters):
            @jax.jit
            def run(xc, seeds0):
                def body(c, _):
                    return one_round(xc, seeds0, c * 1e-12), ()
                c, _ = jax.lax.scan(body, jnp.float32(0),
                                    jnp.arange(iters))
                return c
            return run
        return make

    def seed_round(xc, seeds0, eps):
        def one(a):
            xi, k = a
            seeds, idx = select_seeds_dispatch(
                xi + eps.astype(xi.dtype), num_seeds, k, metric="cosine",
                use_pallas=on_tpu, seed_subsample=sub)
            return (seeds.astype(jnp.float32).sum()
                    + idx.astype(jnp.float32).sum())
        return jax.lax.map(one, (xc, keys)).sum()

    def climb_round(xc, seeds0, eps):
        if on_tpu:
            from unseenobjectclustering_tpu.ops.pallas_mean_shift import (
                hill_climb_pallas)
            climb = lambda xi, z0: hill_climb_pallas(  # noqa: E731
                xi, z0, kappa=kappa, max_iters=max_iters)
        else:
            from unseenobjectclustering_tpu.ops.mean_shift import (
                hill_climb_xla)
            climb = lambda xi, z0: hill_climb_xla(  # noqa: E731
                xi, z0, kappa, max_iters)

        def one(a):
            xi, z0 = a
            return climb(xi + eps.astype(xi.dtype),
                         z0).astype(jnp.float32).sum()
        return jax.lax.map(one, (xc, seeds0)).sum()

    def cc_round(xc, seeds0, eps):
        if on_tpu:
            from unseenobjectclustering_tpu.ops.pallas_mean_shift import (
                connected_components_pallas)
            cc = lambda z: connected_components_pallas(z, epsilon)  # noqa
        else:
            cc = lambda z: connected_components(z, epsilon)  # noqa: E731

        def one(z0):
            return cc(z0.astype(jnp.float32) + eps).sum().astype(jnp.float32)
        return jax.lax.map(one, seeds0).sum()

    def assign_round(xc, seeds0, eps):
        sl = jnp.arange(num_seeds, dtype=jnp.int32) % 8
        if on_tpu:
            from unseenobjectclustering_tpu.ops.pallas_mean_shift import (
                assign_labels_pallas)
            def one(a):
                xi, z0 = a
                labels, counts, _ = assign_labels_pallas(
                    xi + eps.astype(xi.dtype), z0, sl)
                return labels.sum().astype(jnp.float32) + counts.sum()
        else:
            from unseenobjectclustering_tpu.ops.mean_shift import (
                assign_and_swap_background)
            def one(a):
                xi, z0 = a
                return assign_and_swap_background(
                    xi + eps.astype(xi.dtype), z0, sl
                ).sum().astype(jnp.float32)
        return jax.lax.map(one, (xc, seeds0)).sum()

    def full_round(xc, seeds0, eps):
        f = (xc + eps.astype(xc.dtype)).reshape(m_crops, s, s, d)
        lab = _cluster_crops(f.astype(jnp.float32), valid, keys, **ms_kw)
        return lab.sum().astype(jnp.float32)

    mode = "parity" if args.parity else "fast"
    k1, k2 = 4, 4 + args.iters * 4
    print(f"# crop_cluster phase bench: {mode} S={s} M={m_crops} "
          f"d={d} seeds={num_seeds} sub={sub} backend="
          f"{jax.default_backend()} chains={k1}/{k2}", flush=True)
    rows = {}
    for name, fn in [("seed", seed_round), ("climb", climb_round),
                     ("cc", cc_round), ("assign", assign_round),
                     ("full", full_round)]:
        dt = _marginal_ms(chained(fn), (xc, seeds0), k1, k2)
        rows[name] = dt
        print(f"{name:8s} {dt:8.3f} ms/frame ({m_crops} crops)", flush=True)
    overhead = rows["full"] - (rows["seed"] + rows["climb"] + rows["cc"]
                               + rows["assign"])
    print(f"{'residual':8s} {overhead:8.3f} ms/frame "
          f"(full - sum of phases)", flush=True)


if __name__ == "__main__":
    main()
