"""Fused Pallas TPU kernel for farthest-point seed selection.

The XLA fori_loop version (ops/mean_shift.select_smart_seeds) runs the
inherently-sequential m-step loop as m separate device ops; with m = 100 the
per-step launch/HBM overhead dominates (~22 us/step measured on v5e).  Here
the ENTIRE loop runs inside one pallas_call with the (subsampled) pixel
matrix resident in VMEM.

Semantics parity with the reference (lib/utils/mean_shift.py:128-189) and
with select_smart_seeds: cosine distance 0.5 * (1 - X . seed), argmax of the
min-distance vector picks each next seed.

Layout (round 5): X is stored TRANSPOSED in VMEM as [d_sub, n_pad] with
the embedding axis on the SUBLANE dimension, padded only to the sublane
quantum (8 f32 / 16 bf16) instead of the 128-lane quantum.  The per-step
matvec `x_i . X` — the kernel's dominant cost — then contracts over
d_sub=64 instead of d_pad=128.  Measured v5e effects (2026-08-20 probes,
m=100):
  * bf16 paths (FAST_CLUSTER): ~2x per-step work cut straight off.
  * fp32 paths: the r3/r4 kernel's default-precision dots silently
    TRUNCATED fp32 operands to one bf16 pass (~2e-4 distance error,
    changing seed picks far beyond rounding ties); the fp32 route now
    runs Precision.HIGHEST and matches the XLA reference exactly at
    every probed shape — 0.80 ms at n=224^2 (vs 0.575 ms wrong / ~1.7 ms
    projected for the old layout at HIGHEST).
  * the halved footprint newly admits the stride-1 fp32 480x640 frame
    (n=307200: 5.6 ms/frame exact, vs ~7 ms for the HBM lazy-blocked
    fallback it replaces).

VMEM budget: live set ~= X^T + the [8, n_pad] f32 min-distance scratch +
~4 [1, n_pad] f32 step temporaries; ops/mean_shift.seeding_kernel_fits_vmem
gates on that footprint (<= 98 MiB estimate vs the 110 MiB
vmem_limit_bytes this pallas_call requests — Mosaic's own scoped
accounting runs ~1.1x the estimate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unseenobjectclustering_tpu.ops.pallas_mean_shift import _round_up


def _seeding_kernel(xt_ref, first_ref, idx_ref, min_dist, *, num_seeds: int,
                    n: int):
    """xt_ref: [d_sub, n_pad] VMEM (X transposed); first_ref: [1, 1] SMEM
    (first seed index); idx_ref: [8, m_pad] out (row 0 = seed indices);
    min_dist: [8, n_pad] scratch (row 0 live; 8 rows for sublane
    alignment)."""
    n_pad = xt_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    pad_mask = (col >= n)  # padded pixels must never win the argmax

    # fp32 inputs MUST run the multi-pass fp32 MXU decomposition: with the
    # default precision Mosaic truncates fp32 dot operands to one bf16
    # pass, and the resulting ~2e-4 distance error changes farthest-point
    # picks far beyond rounding near-ties (measured on v5e, n=2000:
    # first divergence at step 18 with a 2.4e-4 exact-distance gap —
    # this silently degraded the r3/r4 kernel's "fp32 parity" seeding).
    # HIGHEST restores exact agreement with the XLA select_smart_seeds
    # route at every probed shape; Mosaic rejects Precision.HIGH.
    # bf16 inputs keep the default: one exact-widening pass, bit-matching
    # the XLA reference on identical bf16 operands.
    prec = (jax.lax.Precision.HIGHEST if xt_ref.dtype == jnp.float32
            else None)

    def dist_to(i):
        # cosine distance of every pixel to pixel i: 0.5 * (1 - x_i . X).
        # Column i is read as its ALIGNED 128-lane tile (start asserted
        # via pl.multiple_of — an arbitrary-lane dynamic_slice has no
        # Mosaic lowering) and the column picked out with a tiny
        # [128]-one-hot matvec on the MXU.
        base = pl.multiple_of((i // 128) * 128, 128)
        tile = xt_ref[:, pl.ds(base, 128)]                      # [d_sub, 128]
        col_hot = (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                   == (i - base)).astype(tile.dtype)            # [1, 128]
        xi = jax.lax.dot_general(
            col_hot, tile, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # [1, d_sub]
        sim = jax.lax.dot_general(
            xi.astype(tile.dtype), xt_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # [1, n_pad]
        return 0.5 * (1.0 - sim)

    first = first_ref[0, 0]
    min_dist[0:1, :] = jnp.where(pad_mask, -jnp.inf, dist_to(first))

    # the selected indices accumulate in a loop-carried [1, m_pad] vector
    # via masked selects: Mosaic rejects scalar stores to VMEM and dynamic
    # lane-dimension stores, so the whole row is written once at the end
    m_pad = idx_ref.shape[1]
    seed_col = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1)
    idx0 = jnp.where(seed_col == 0, first, -1)

    def body(k, idx_row):
        sel = jnp.argmax(min_dist[0:1, :], axis=1)[0].astype(jnp.int32)
        idx_row = jnp.where(seed_col == k, sel, idx_row)
        # padded lanes were initialized to -inf and minimum() keeps them
        # there — no per-step re-mask (the extra [1, n] temp it cost was
        # exactly what pushed the full-frame fp32 shape over the scoped
        # VMEM limit: 104.02M vs 110M granted)
        min_dist[0:1, :] = jnp.minimum(min_dist[0:1, :], dist_to(sel))
        return idx_row

    idx_row = jax.lax.fori_loop(1, num_seeds, body, idx0)
    idx_ref[0:1, :] = idx_row


@functools.partial(jax.jit, static_argnames=("num_seeds", "interpret"))
def select_seeds_pallas(x: jax.Array, num_seeds: int, first_index: jax.Array,
                        interpret: bool | None = None
                        ) -> tuple[jax.Array, jax.Array]:
    """Farthest-point seeding fused in one kernel (cosine metric).

    Args:
      x: [n, d] unit vectors (bf16/f32); gate admission via
        ops/mean_shift.seeding_kernel_fits_vmem.
      first_index: scalar int32 index of the random first seed.
    Returns:
      (seeds [m, d] in x.dtype, seed_indices [m] int32).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, d = x.shape
    n_pad = _round_up(n, 128)
    sub = 8 if x.dtype == jnp.float32 else 16
    d_sub = _round_up(d, sub)
    m_pad = _round_up(max(num_seeds, 8), 128)

    # one [n, d] -> [d_sub, n_pad] transpose in HBM (~0.1 ms/frame at
    # 307k x 64 — repaid ~25x by the halved per-step VPU work)
    xt = jnp.zeros((d_sub, n_pad), x.dtype).at[:d, :n].set(x.T)
    first = jnp.asarray(first_index, jnp.int32).reshape(1, 1)

    idx = pl.pallas_call(
        functools.partial(_seeding_kernel, num_seeds=num_seeds, n=n),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((d_sub, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, m_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, m_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, n_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(xt, first)

    seed_indices = idx[0, :num_seeds]
    seeds = x[seed_indices]
    return seeds, seed_indices
