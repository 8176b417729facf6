"""Fused Pallas TPU kernel for farthest-point seed selection.

The XLA fori_loop version (ops/mean_shift.select_smart_seeds) runs the
inherently-sequential m-step loop as m separate device ops; with m = 100 the
per-step launch/HBM overhead dominates (~22 us/step measured on v5e).  Here
the ENTIRE loop runs inside one pallas_call with the (subsampled) pixel
matrix X resident in VMEM — each step is a [n, d] @ [d] matvec on the MXU,
a running-min update, and an argmax reduction, all on-chip.

Semantics parity with the reference (lib/utils/mean_shift.py:128-189) and
with select_smart_seeds: cosine distance 0.5 * (1 - X . seed), argmax of the
min-distance vector picks each next seed.

VMEM budget: the kernel's live set is ~3 X-sized buffers for fp32 (x_ref
block + the materialized x copy + an X-sized f32 temporary across the
dist_to matvecs) plus the [8, n] f32 scratch —
ops/mean_shift.seeding_kernel_fits_vmem gates on that REAL footprint
against a 96 MiB ceiling (measured on v5e: fp32 n=76800 reports
117.19 MiB used vs a 101.5 MiB effective limit and fails; fp32 224^2
crops at 3x = 77 MiB and bf16 n=76800 at 75 MiB both compile).
Admitted shapes: the 224^2 zoom-in crops (bf16 and the reference-exact
fp32) and subsampled full frames; stride-1 480x640 routes to the exact
lazy-bound blocked selection in ops/mean_shift.py instead.  Mosaic's
default per-kernel scoped-vmem limit is 16 MiB, so the pallas_call
raises it explicitly (compiler_params vmem_limit_bytes=64 MiB, granted
as ~101.5 MiB effective) — without it the fp32 224^2 shape is admitted
but fails to compile ("Ran out of memory ... limit 16.00M").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unseenobjectclustering_tpu.ops.pallas_mean_shift import _round_up


def _seeding_kernel(x_ref, first_ref, idx_ref, min_dist, *, num_seeds: int,
                    n: int):
    """x_ref: [n_pad, d_pad] VMEM; first_ref: [1, 1] SMEM (first seed index);
    idx_ref: [8, m_pad] out (row 0 = seed indices); min_dist: [8, n_pad]
    scratch (row 0 live; 8 rows for sublane alignment)."""
    n_pad = x_ref.shape[0]
    x = x_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
    pad_mask = (col >= n)  # padded pixels must never win the argmax

    # sublane tile height: f32 tiles are (8, 128), bf16 (16, 128) — a
    # dynamic read is lowerable iff its start is provably tile-aligned
    sub = 8 if x_ref.dtype == jnp.float32 else 16

    def dist_to(i):
        # cosine distance of every pixel to pixel i: 0.5 * (1 - X @ x_i).
        # Row i is read as its ALIGNED sublane tile (start = i rounded
        # down to the tile height, asserted via pl.multiple_of — an
        # arbitrary-row dynamic_slice has no Mosaic lowering) and the
        # row picked out with a tiny [1, sub] one-hot matvec.  This
        # replaces the old full [1, n] @ [n, d] one-hot extraction,
        # halving the per-step MXU work of the sequential loop.
        base = pl.multiple_of((i // sub) * sub, sub)
        tile = x_ref[pl.ds(base, sub), :]                       # [sub, d]
        row_hot = (jax.lax.broadcasted_iota(jnp.int32, (1, sub), 1)
                   == (i - base)).astype(x.dtype)               # [1, sub]
        xi = jax.lax.dot_general(
            row_hot, tile, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # [1, d]
        sim = jax.lax.dot_general(
            xi.astype(x.dtype), x,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                 # [1, n_pad]
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
        d = jnp.where(pad_mask, -jnp.inf,
                      jnp.minimum(min_dist[0:1, :], dist_to(sel)))
        min_dist[0:1, :] = d
        return idx_row

    idx_row = jax.lax.fori_loop(1, num_seeds, body, idx0)
    idx_ref[0:1, :] = idx_row


@functools.partial(jax.jit, static_argnames=("num_seeds", "interpret"))
def select_seeds_pallas(x: jax.Array, num_seeds: int, first_index: jax.Array,
                        interpret: bool | None = None
                        ) -> tuple[jax.Array, jax.Array]:
    """Farthest-point seeding fused in one kernel (cosine metric).

    Args:
      x: [n, d] unit vectors (bf16/f32); n*d must fit VMEM (~<= 64k x 64).
      first_index: scalar int32 index of the random first seed.
    Returns:
      (seeds [m, d] in x.dtype, seed_indices [m] int32).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, d = x.shape
    n_pad = _round_up(n, 128)
    d_pad = _round_up(d, 128)
    m_pad = _round_up(max(num_seeds, 8), 128)

    xp = jnp.zeros((n_pad, d_pad), x.dtype).at[:n, :d].set(x)
    first = jnp.asarray(first_index, jnp.int32).reshape(1, 1)

    idx = pl.pallas_call(
        functools.partial(_seeding_kernel, num_seeds=num_seeds, n=n),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((n_pad, d_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, m_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, m_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, n_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(xp, first)

    seed_indices = idx[0, :num_seeds]
    seeds = x[seed_indices]
    return seeds, seed_indices
