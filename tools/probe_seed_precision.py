#!/usr/bin/env python3
"""Audit every farthest-point seeding route against a float64 replay.

Round 5 found the fused Pallas seeding kernel's fp32 dots were silently
truncated to one bf16 MXU pass (~2e-4 distance error — far beyond
rounding ties — changing seed picks; fixed with Precision.HIGHEST).
This tool pins ALL routes, on the REAL backend, against an exact
float64 numpy replay of the reference selection rule
(lib/utils/mean_shift.py:128-189):

  eager   select_smart_seeds        (fori_loop matvecs)
  lazy    select_smart_seeds_lazy   (blocked [nb,d]@[d,m] matmuls — MXU
                                     truncation risk on TPU)
  pallas  select_seeds_pallas       (fused VMEM kernel)

A route PASSES if every divergence from the f64 replay is a genuine
fp32 near-tie (exact-distance gap < 1e-5); a gap >= 1e-5 means the
route's distances are wrong, not merely rounded.

Usage: python tools/probe_seed_precision.py [--n 50176] [--m 100]
"""

import argparse
import os

import _init_paths  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".xla_cache")
try:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

TIE_GAP = 1e-5


def replay_audit(x, idx, first, m):
    """Walk the route's picks through an exact f64 replay.

    At each step the replay takes the ROUTE's pick (so one near-tie does
    not cascade into meaningless comparisons) but records the exact-
    distance gap between the route's pick and the true argmax."""
    x64 = x.astype(np.float64)
    md = 0.5 * (1.0 - x64 @ x64[first])
    worst = 0.0
    n_div = 0
    for k in range(1, m):
        best = int(np.argmax(md))
        got = int(idx[k])
        if got != best:
            n_div += 1
            worst = max(worst, float(md[best] - md[got]))
        md = np.minimum(md, 0.5 * (1.0 - x64 @ x64[got]))
    return n_div, worst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50176)
    ap.add_argument("--m", type=int, default=100)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from unseenobjectclustering_tpu.ops.mean_shift import (
        seeding_kernel_fits_vmem, select_smart_seeds,
        select_smart_seeds_lazy)
    from unseenobjectclustering_tpu.ops.pallas_seeding import (
        select_seeds_pallas)

    rng = np.random.default_rng(args.seed)
    x = rng.normal(size=(args.n, args.d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    xd = jnp.asarray(x)
    first = 5
    print(f"# backend={jax.default_backend()} n={args.n} d={args.d} "
          f"m={args.m} tie-gap<{TIE_GAP}", flush=True)

    routes = {}
    _, routes["eager"] = select_smart_seeds(
        xd, args.m, jax.random.PRNGKey(0), "cosine",
        first_index=jnp.int32(first))
    _, routes["lazy"] = select_smart_seeds_lazy(
        xd, args.m, jax.random.PRNGKey(0), first_index=jnp.int32(first))
    if (jax.default_backend() == "tpu"
            and seeding_kernel_fits_vmem(args.n, args.d, 4)):
        _, routes["pallas"] = select_seeds_pallas(xd, args.m,
                                                  jnp.int32(first))

    ok = True
    for name, idx in routes.items():
        n_div, worst = replay_audit(x, np.asarray(idx), first, args.m)
        verdict = "PASS" if worst < TIE_GAP else "FAIL"
        ok &= worst < TIE_GAP
        print(f"{name:7s} {verdict}: {n_div} divergences from f64 replay, "
              f"worst exact-distance gap {worst:.3e}", flush=True)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
