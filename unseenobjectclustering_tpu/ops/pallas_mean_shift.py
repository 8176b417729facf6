"""Fused Pallas TPU kernels for vMF mean-shift: hill climbing + assignment.

The reference materializes the full [m x n] kernel matrix
W = exp(kappa Z X^T) in GPU memory every iteration
(lib/utils/mean_shift.py:95-98).  For n = 480*640 = 307k pixels that is a
~123 MB HBM round-trip per iteration.  Here both hot phases stream X through
VMEM in a feature-major [d, n] layout — with d = 64 the tiles are exactly
(64 sublanes x tile_n lanes), so no lane padding doubles the HBM traffic
(the row-major [n, d] layout would pad d 64 -> 128):

  * hill_climb_pallas: all `max_iters` iterations in ONE pallas_call with
    grid (max_iters, n_tiles); VMEM scratch carries the seed state Z across
    iterations; each step computes the [M x TILE_N] similarity block on the
    MXU, exponentiates on the VPU, and accumulates W @ X_tile into a
    VMEM-resident accumulator — W never touches HBM.  At iteration
    boundaries the accumulator is row-normalized in VMEM (the cosine-metric
    update Z <- normalize(W X), mean_shift.py:106-107).

  * assign_labels_pallas: pixel -> nearest-converged-seed assignment
    (mean_shift.py:206-215) fused with the cluster-size histogram the
    background swap needs (:217-227).  One X pass; the [n, m] distance
    matrix and the [n, m] one-hot count matrix never exist in HBM (the XLA
    formulation spends ~3.8 ms/frame on those round-trips; this kernel is
    bound by one 78 MB X read).

Padding invariants: zero-padded X columns produce sim = 0 -> they are
assigned to seed argmax(0 row) deterministically but masked out of the
histogram and sliced off the label output; zero-padded Z rows are masked to
-inf similarity so no pixel selects them.
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


def _hill_climb_kernel(xt_ref, z0_ref, out_ref, z_cur, z_acc, *,
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

    xt = xt_ref[:]  # [D, TILE_N] in x dtype
    # similarity block on the MXU: [M, TILE_N]
    s = jax.lax.dot_general(
        z_cur[:].astype(xt.dtype), xt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    w = jnp.exp(kappa * s)
    # accumulate W @ X_tile^T : [M, D]
    z_acc[:] += jax.lax.dot_general(
        w.astype(xt.dtype) if xt.dtype != jnp.float32 else w, xt,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when((it == max_iters - 1) & (j == n_tiles - 1))
    def _finish():
        out_ref[:] = _normalize_rows(z_acc[:])


@functools.partial(jax.jit, static_argnames=("kappa", "max_iters", "tile_n",
                                             "interpret"))
def hill_climb_pallas(x: jax.Array, z0: jax.Array, *, kappa: float = 20.0,
                      max_iters: int = 10, tile_n: int = 4096,
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
    tile_n = min(tile_n, _round_up(n, 128))
    n_pad = _round_up(n, tile_n)
    d_sub = _round_up(d, 8)

    # feature-major layout: [d, n] tiles are (d sublanes x tile_n lanes) so
    # d = 64 needs no 128-lane padding (XLA CSEs this transpose with the
    # assignment kernel's when both run in one jit program)
    xt = jnp.zeros((d_sub, n_pad), dtype=x.dtype).at[:d, :n].set(x.T)
    zp = jnp.zeros((m_pad, d_sub), dtype=jnp.float32).at[:m, :d].set(
        z0.astype(jnp.float32))
    n_tiles = n_pad // tile_n

    out = pl.pallas_call(
        functools.partial(_hill_climb_kernel, kappa=kappa, n_tiles=n_tiles,
                          max_iters=max_iters),
        grid=(max_iters, n_tiles),
        in_specs=[
            pl.BlockSpec((d_sub, tile_n), lambda it, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, d_sub), lambda it, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, d_sub), lambda it, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, d_sub), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m_pad, d_sub), jnp.float32),  # z_cur
            pltpu.VMEM((m_pad, d_sub), jnp.float32),  # z_acc
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * max_iters * n_pad * m_pad * d_sub,
            bytes_accessed=max_iters * n_pad * d_sub * x.dtype.itemsize,
            transcendentals=max_iters * n_pad * m_pad,
        ),
        interpret=interpret,
    )(xt, zp)
    return out[:m, :d]


def _cc_kernel(z_ref, out_ref, adj_ref, *, m: int, epsilon: float):
    """Sequential seed merging (mean_shift.py:41-76) entirely in VMEM.

    The XLA fori_loop version spends ~15 us of dispatch per seed (~1.5 ms
    for m=100); here the whole loop runs inside one kernel on [1, m_pad]
    vectors and a VMEM-resident [m_pad, m_pad] adjacency.  Same algorithm,
    same mode tie-breaking.  Pallas TPU constraints shape the code: no
    scalar stores (vector selects only), dynamic row reads go through the
    adjacency SCRATCH REF (dynamic_slice of a value has no lowering), and
    the per-iteration row->column transpose of the label vector is an
    identity matmul on the MXU.
    """
    mp = adj_ref.shape[1]
    z = z_ref[:].astype(jnp.float32)                 # [m_pad, d]
    sim = jax.lax.dot_general(z, z,
                              dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dist = 0.5 * (1.0 - sim)                         # [m_pad, m_pad]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, mp), 1)
    real = col < m                                   # padded seeds ignored
    adj_ref[:] = ((dist <= epsilon) & real).astype(jnp.float32)

    row2 = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 0)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 1)
    identity = (row2 == col2).astype(jnp.float32)
    colf = col.astype(jnp.float32)

    labels0 = jnp.where(real, -1, -2)                # [1, m_pad]

    def body(i, carry):
        labels, k = carry
        li = jnp.sum(jnp.where(col == i, labels, 0))
        do = li == -1
        neigh = adj_ref[pl.ds(i, 1), :] > 0.0        # [1, m_pad]
        labeled_neigh = neigh & (labels >= 0)
        has_labeled = jnp.any(labeled_neigh)
        # mode of labels among labeled neighbors, smallest label on ties
        # (get_label_mode, mean_shift.py:30-38): counts[j] = sum_s
        # labeled_neigh[s] * (labels[s] == j).  labels_col = I @ labels^T
        # (identity matmul = transpose the MXU supports).
        labels_f = labels.astype(jnp.float32)
        labels_col = jax.lax.dot_general(
            identity, labels_f,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [m_pad, 1]
        eq = (labels_col == colf).astype(jnp.float32)   # [m_pad, m_pad]
        counts = jax.lax.dot_general(
            labeled_neigh.astype(jnp.float32), eq,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [1, m_pad]
        mode = jnp.argmax(counts, axis=1)[0].astype(jnp.int32)
        new_label = jnp.where(has_labeled, mode, k)
        labels = jnp.where((neigh & do), new_label, labels)
        k = k + jnp.where(do & ~has_labeled, 1, 0)
        return labels, k

    labels, _ = jax.lax.fori_loop(0, m, body, (labels0, jnp.int32(0)))
    out_ref[:] = labels


@functools.partial(jax.jit, static_argnames=("epsilon", "interpret"))
def connected_components_pallas(z: jax.Array, epsilon: float,
                                interpret: bool | None = None) -> jax.Array:
    """Fused connected components over converged seeds (cosine metric).

    Exact semantics of ops.mean_shift.connected_components (which holds the
    oracle parity); this version runs the m sequential steps inside one
    pallas_call.  Returns [m] int32 labels.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, d = z.shape
    m_pad = _round_up(max(m, 8), 128)
    d_sub = _round_up(d, 8)
    zp = jnp.zeros((m_pad, d_sub), jnp.float32).at[:m, :d].set(
        z.astype(jnp.float32))
    out = pl.pallas_call(
        functools.partial(_cc_kernel, m=m, epsilon=float(epsilon)),
        grid=(1,),
        in_specs=[pl.BlockSpec((m_pad, d_sub), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, m_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((m_pad, m_pad), jnp.float32)],
        interpret=interpret,
    )(zp)
    return out[0, :m]


def _assign_kernel(xt_ref, z_ref, slab_ref, zv_ref, lab_ref, cnt_ref,
                   cnt_acc, *, m: int, n: int, n_tiles: int):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        cnt_acc[:] = jnp.zeros_like(cnt_acc)

    xt = xt_ref[:]                      # [D, TILE_N]
    tile_n = xt.shape[1]
    # similarity on the MXU; argmin(dist) == argmax(sim) with identical
    # first-occurrence tie-breaking (dist = 0.5 * (1 - sim) is monotone)
    s = jax.lax.dot_general(
        z_ref[:].astype(xt.dtype), xt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [M_pad, TILE_N]
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(row < m, s, -jnp.inf)              # padded seeds never win
    closest = jnp.argmax(s, axis=0).astype(jnp.int32)            # [TILE_N]

    # cluster label via one-hot matmul (per-lane gather is not a TPU-friendly
    # primitive; seed_labels . onehot is exact for labels < 2^24)
    onehot = (row == closest[None, :]).astype(jnp.float32)       # [M_pad, T]
    clab = jax.lax.dot_general(
        slab_ref[:].astype(jnp.float32), onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                      # [1, T]
    clab_i = clab.astype(jnp.int32)
    lab_ref[:] = clab_i

    # histograms of cluster labels over in-range pixels: column 0 = pixel
    # count per cluster id, column 1 = valid-depth pixel count (fuses the
    # depth filter's 62 MB one-hot pass into this same X sweep,
    # test_dataset.py:183-198)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
    valid = (j * tile_n + col) < n                               # [1, T]
    hot = ((row == clab_i) & valid).astype(jnp.float32)          # [M_pad, T]
    cnt_acc[:, 0:1] += jnp.sum(hot, axis=1, keepdims=True)
    cnt_acc[:, 1:2] += jnp.sum(hot * zv_ref[:], axis=1, keepdims=True)

    @pl.when(j == n_tiles - 1)
    def _finish():
        cnt_ref[:] = cnt_acc[:]


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def assign_labels_pallas(x: jax.Array, seeds: jax.Array,
                         seed_labels: jax.Array,
                         z_valid: jax.Array | None = None,
                         tile_n: int = 8192,
                         interpret: bool | None = None
                         ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused nearest-seed assignment + cluster histograms (cosine metric).

    Args:
      x: [n, d] unit vectors.
      seeds: [m, d] converged seeds.
      seed_labels: [m] int32 cluster ids from connected components.
      z_valid: optional [n] float32 validity mask (e.g. depth z > 0);
        its per-cluster sum comes out in the same X sweep, so the depth
        filter needs no separate one-hot pass.
    Returns:
      (labels [n] int32 cluster ids (pre-background-swap),
       counts [m] float32 cluster-id histogram over the n pixels,
       valid_counts [m] float32 histogram of z_valid (== counts when
       z_valid is None)).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, d = x.shape
    m = seeds.shape[0]
    m_pad = _round_up(max(m, 8), 128)
    tile_n = min(tile_n, _round_up(n, 128))
    n_pad = _round_up(n, tile_n)
    d_sub = _round_up(d, 8)

    xt = jnp.zeros((d_sub, n_pad), dtype=x.dtype).at[:d, :n].set(x.T)
    zp = jnp.zeros((m_pad, d_sub), jnp.float32).at[:m, :d].set(
        seeds.astype(jnp.float32))
    slab = jnp.zeros((1, m_pad), jnp.int32).at[0, :m].set(
        seed_labels.astype(jnp.int32))
    if z_valid is None:
        zv = jnp.ones((1, n_pad), jnp.float32)
    else:
        zv = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(
            z_valid.astype(jnp.float32))
    n_tiles = n_pad // tile_n

    labels, counts = pl.pallas_call(
        functools.partial(_assign_kernel, m=m, n=n, n_tiles=n_tiles),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((d_sub, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, d_sub), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 128), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((m_pad, 128), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((m_pad, 128), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * d_sub + 4 * n_pad * m_pad,
            bytes_accessed=(n_pad * d_sub * x.dtype.itemsize + 4 * n_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xt, zp, slab, zv)
    return labels[0, :n], counts[:m, 0], counts[:m, 1]
