"""Fused Pallas TPU kernel for vMF mean-shift hill climbing.

The reference materializes the full [m x n] kernel matrix
W = exp(kappa Z X^T) in GPU memory every iteration
(lib/utils/mean_shift.py:95-98).  For n = 480*640 = 307k pixels that is a
~123 MB HBM round-trip per iteration.  This kernel instead runs all
`max_iters` iterations in ONE pallas_call:

  * grid = (max_iters, n_tiles); TPU grid steps run sequentially, so VMEM
    scratch carries the seed state Z across iterations,
  * each step streams one X tile HBM->VMEM, computes the [M x TILE_N]
    similarity block on the MXU, exponentiates on the VPU, and accumulates
    W @ X_tile into a VMEM-resident accumulator — W never touches HBM,
  * at iteration boundaries the accumulator is row-normalized in VMEM
    (the cosine-metric update Z <- normalize(W X), mean_shift.py:106-107).

Padding invariants: zero-padded X rows contribute exp(0)*0 = 0 to the
accumulator; zero-padded Z rows produce garbage rows that are sliced away.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _normalize_rows(v, eps=1e-12):
    norm = jnp.sqrt(jnp.sum(v * v, axis=1, keepdims=True))
    return v / jnp.maximum(norm, eps)


def _hill_climb_kernel(x_ref, z0_ref, out_ref, z_cur, z_acc, *,
                       kappa: float, n_tiles: int, max_iters: int):
    it = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _start_iteration():
        @pl.when(it == 0)
        def _():
            z_cur[:] = z0_ref[:].astype(jnp.float32)

        @pl.when(it != 0)
        def _():
            z_cur[:] = _normalize_rows(z_acc[:])

        z_acc[:] = jnp.zeros_like(z_acc)

    xt = x_ref[:]  # [TILE_N, D] in x dtype
    # similarity block on the MXU: [M, TILE_N]
    s = jax.lax.dot_general(
        z_cur[:].astype(xt.dtype), xt,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    w = jnp.exp(kappa * s)
    # accumulate W @ X_tile : [M, D]
    z_acc[:] += jax.lax.dot_general(
        w.astype(xt.dtype) if xt.dtype != jnp.float32 else w, xt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when((it == max_iters - 1) & (j == n_tiles - 1))
    def _finish():
        out_ref[:] = _normalize_rows(z_acc[:])


@functools.partial(jax.jit, static_argnames=("kappa", "max_iters", "tile_n",
                                             "interpret"))
def hill_climb_pallas(x: jax.Array, z0: jax.Array, *, kappa: float = 20.0,
                      max_iters: int = 10, tile_n: int = 2048,
                      interpret: bool | None = None) -> jax.Array:
    """Run `max_iters` cosine vMF mean-shift updates of seeds z0 over data x.

    Args:
      x: [n, d] unit vectors (float32 or bfloat16).
      z0: [m, d] initial seeds.
    Returns:
      [m, d] float32 converged seeds.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, d = x.shape
    m = z0.shape[0]
    m_pad = _round_up(max(m, 8), 8)
    n_pad = _round_up(n, tile_n)
    d_pad = _round_up(d, 128)

    xp = jnp.zeros((n_pad, d_pad), dtype=x.dtype).at[:n, :d].set(x)
    zp = jnp.zeros((m_pad, d_pad), dtype=jnp.float32).at[:m, :d].set(
        z0.astype(jnp.float32))
    n_tiles = n_pad // tile_n

    out = pl.pallas_call(
        functools.partial(_hill_climb_kernel, kappa=kappa, n_tiles=n_tiles,
                          max_iters=max_iters),
        grid=(max_iters, n_tiles),
        in_specs=[
            pl.BlockSpec((tile_n, d_pad), lambda it, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, d_pad), lambda it, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, d_pad), lambda it, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, d_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m_pad, d_pad), jnp.float32),  # z_cur
            pltpu.VMEM((m_pad, d_pad), jnp.float32),  # z_acc
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * max_iters * n_pad * m_pad * d_pad,
            bytes_accessed=max_iters * n_pad * d_pad * x.dtype.itemsize,
            transcendentals=max_iters * n_pad * m_pad,
        ),
        interpret=interpret,
    )(xp, zp)
    return out[:m, :d]
