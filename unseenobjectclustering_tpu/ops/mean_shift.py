"""von Mises-Fisher mean-shift clustering over unit-norm pixel embeddings.

TPU-native re-design of the reference's clustering stack
(lib/utils/mean_shift.py):

  phase 1 — farthest-point seeding (select_smart_seeds :128-189): inherently
            sequential; implemented as a lax.fori_loop carrying a running
            min-distance vector instead of the reference's [n x m] distance
            matrix (same argmax semantics, O(n) state instead of O(nm)).
  phase 2 — vMF hill climbing (seed_hill_climbing_ball :79-109): 10 fixed
            iterations of Z <- normalize(exp(kappa Z X^T) X).  The hot path is
            a fused Pallas kernel (ops/pallas_mean_shift.py) that streams X
            tiles through VMEM and never materializes the [m x n] kernel
            matrix in HBM; a pure-XLA fallback covers CPU tests and the
            euclidean metric.
  phase 3 — connected components over converged seeds (:41-76): the
            sequential label-propagation with mode tie-breaking is replicated
            exactly as a fori_loop over the (tiny) m seeds, on device.
  phase 4 — pixel-to-seed assignment + largest-cluster-to-background swap
            (:206-227).

Everything is jittable with static (num_seeds, max_iters) — matching the
reference's own fixed iteration counts.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class MeanShiftResult(NamedTuple):
    labels: jax.Array            # [n] int32 cluster ids (0 = background)
    seed_indices: jax.Array      # [m] int32 pixel indices chosen as seeds
    seeds: jax.Array             # [m, d] converged seeds
    seed_labels: jax.Array       # [m] int32 per-seed cluster ids


def _cosine_dist_to_point(x: jax.Array, v: jax.Array) -> jax.Array:
    """0.5 * (1 - X . v) for unit vectors; [n], float32.

    The matvec accumulates in f32 even for bf16 inputs so the min-distance
    state (and thus argmax selection) matches the Pallas and lazy-blocked
    seeding routes — carrying distances in bf16 quantizes near-0.5 cosine
    distances to ~2e-3 steps, mass-tying the argmax toward low indices.
    """
    dots = jax.lax.dot_general(x, v, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return 0.5 * (1.0 - dots)


def _euclidean_dist_to_point(x: jax.Array, v: jax.Array) -> jax.Array:
    diff = (x - v[None, :]).astype(jnp.float32)
    return jnp.sqrt(jnp.sum(diff * diff, axis=1))


def select_smart_seeds(x: jax.Array, num_seeds: int, key: jax.Array,
                       metric: str = "cosine",
                       first_index: Optional[jax.Array] = None,
                       subsample: int = 1) -> tuple[jax.Array, jax.Array]:
    """Farthest-point seed selection (mean_shift.py:128-189).

    Args:
      x: [n, d] unit vectors.
      num_seeds: static seed count m.
      key: PRNG key for the random first seed (reference: np.random.randint,
        mean_shift.py:155).
      first_index: optional override of the first seed index (for oracle
        tests / deterministic replay).
      subsample: static pixel stride for the seeding phase only (1 = parity
        with the reference, which scans all n pixels every step).  Farthest-
        point seeding is the only O(num_seeds * n) sequential phase; seeding
        from every `subsample`-th pixel keeps seed coverage (seeds are
        starting points that hill-climb to the same modes) while cutting its
        HBM traffic by the same factor.  Returned indices are in the original
        pixel indexing.
    Returns:
      (seeds [m, d], seed_indices [m]).
    """
    if subsample > 1:
        seeds, idxs = select_smart_seeds(x[::subsample], num_seeds, key,
                                         metric, first_index)
        return seeds, idxs * subsample
    n, d = x.shape
    dist_fn = (_cosine_dist_to_point if metric == "cosine"
               else _euclidean_dist_to_point)

    if first_index is None:
        first_index = jax.random.randint(key, (), 0, n)
    first_index = jnp.asarray(first_index, jnp.int32)  # plain ints welcome

    seeds0 = jnp.zeros((num_seeds, d), dtype=x.dtype)
    idxs0 = jnp.full((num_seeds,), -1, dtype=jnp.int32)
    first_seed = x[first_index]
    seeds0 = seeds0.at[0].set(first_seed)
    idxs0 = idxs0.at[0].set(first_index)
    min_dist0 = dist_fn(x, first_seed)

    def body(i, carry):
        min_dist, seeds, idxs = carry
        sel = jnp.argmax(min_dist).astype(jnp.int32)
        seed = x[sel]
        seeds = seeds.at[i].set(seed)
        idxs = idxs.at[i].set(sel)
        min_dist = jnp.minimum(min_dist, dist_fn(x, seed))
        return min_dist, seeds, idxs

    _, seeds, idxs = jax.lax.fori_loop(1, num_seeds, body,
                                       (min_dist0, seeds0, idxs0))
    return seeds, idxs


def select_smart_seeds_lazy(x: jax.Array, num_seeds: int, key: jax.Array,
                            first_index: Optional[jax.Array] = None,
                            block: int = 16384
                            ) -> tuple[jax.Array, jax.Array]:
    """Exact farthest-point seeding with lazy per-block bound refresh
    (cosine metric).

    Same selection as select_smart_seeds / the reference
    (lib/utils/mean_shift.py:128-189): each step picks the pixel with the
    largest min-distance-to-chosen-seeds.  The naive loop reads the whole
    [n, d] matrix every step (100 x 78 MB of HBM traffic at 480x640 fp32 —
    ~23 ms/frame measured on v5e).  Here pixels are grouped into blocks and
    each block carries a STALE upper bound on its max-min-distance:
    min-distances only shrink as seeds are added, so a bound computed at an
    older seed count is always >= the true value.  Each step refreshes only
    blocks whose stale bound beats the current best — the classic lazy-max
    trick — which is mathematically guaranteed to pick the same argmax while
    touching a small fraction of the blocks per step.

    Returns (seeds [m, d], seed_indices [m] int32).
    """
    n, d = x.shape
    nb = min(block, n)
    num_blocks = (n + nb - 1) // nb
    n_pad = num_blocks * nb
    xp = jnp.zeros((n_pad, d), x.dtype).at[:n].set(x)
    xb = xp.reshape(num_blocks, nb, d)
    # global pixel index per (block, slot); padded slots masked to -inf below
    gidx = (jnp.arange(num_blocks, dtype=jnp.int32)[:, None] * nb
            + jnp.arange(nb, dtype=jnp.int32)[None, :])
    pad = gidx >= n

    if first_index is None:
        first_index = jax.random.randint(key, (), 0, n)
    first_index = jnp.asarray(first_index, jnp.int32)  # plain ints welcome
    first_seed = xp[first_index]

    # full pass vs seed 0 (every block must be scored once anyway before the
    # first argmax); per-pixel min-distances are NOT stored — a lazy refresh
    # recomputes them from the chosen seeds, so the only carried state is
    # three [B] vectors
    # HIGHEST: at DEFAULT precision the TPU MXU truncates fp32 operands to
    # one bf16 pass — tools/probe_seed_precision.py measured a 2.6e-4
    # exact-distance error flipping farthest-point picks on this route
    # (the same bug fixed in the fused kernel this round)
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
    sim0 = jax.lax.dot_general(xb, first_seed,
                               dimension_numbers=(((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)
    md0 = jnp.where(pad, -jnp.inf, 0.5 * (1.0 - sim0))        # [B, nb]
    bound = jnp.max(md0, axis=1)                              # [B]
    arg = jnp.argmax(md0, axis=1).astype(jnp.int32)           # [B]
    last_k = jnp.ones((num_blocks,), jnp.int32)

    seeds = jnp.zeros((num_seeds, d), x.dtype).at[0].set(first_seed)
    idxs = jnp.full((num_seeds,), -1, jnp.int32).at[0].set(first_index)
    seed_col = jnp.arange(num_seeds, dtype=jnp.int32)

    def refresh(state, k):
        bound, arg, last_k, seeds = state
        b = jnp.argmax(bound).astype(jnp.int32)
        xb_b = jax.lax.dynamic_index_in_dim(xb, b, axis=0, keepdims=False)
        # distance to ALL chosen seeds (columns >= k masked out); identical
        # to incrementally min-ing against the new seeds since the min is
        # exact, and one [nb, m] matmul is cheaper than bookkeeping
        sim = jax.lax.dot_general(xb_b, seeds,
                                  dimension_numbers=(((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
        dist = jnp.where(seed_col[None, :] < k, 0.5 * (1.0 - sim), jnp.inf)
        md = jnp.min(dist, axis=1)
        md = jnp.where(pad[b], -jnp.inf, md)
        bound = bound.at[b].set(jnp.max(md))
        arg = arg.at[b].set(jnp.argmax(md).astype(jnp.int32))
        last_k = last_k.at[b].set(k)
        return bound, arg, last_k, seeds

    def step(k, carry):
        bound, arg, last_k, seeds, idxs = carry

        def stale(state):
            b = jnp.argmax(state[0]).astype(jnp.int32)
            return state[2][b] < k

        state = jax.lax.while_loop(
            stale, lambda s: refresh(s, k), (bound, arg, last_k, seeds))
        bound, arg, last_k, seeds = state
        b = jnp.argmax(bound).astype(jnp.int32)
        sel = (b * nb + arg[b]).astype(jnp.int32)
        seed = xp[sel]
        seeds = seeds.at[k].set(seed)
        idxs = idxs.at[k].set(sel)
        return bound, arg, last_k, seeds, idxs

    _, _, _, seeds, idxs = jax.lax.fori_loop(
        1, num_seeds, step, (bound, arg, last_k, seeds, idxs))
    return seeds, idxs


def hill_climb_xla(x: jax.Array, z: jax.Array, kappa: float, max_iters: int,
                   metric: str = "cosine") -> jax.Array:
    """Pure-XLA mean-shift hill climbing (mean_shift.py:79-109)."""
    xf = x.astype(jnp.float32)

    def cosine_step(_, z):
        w = jnp.exp(kappa * (z @ xf.T))          # [m, n]
        z_new = w @ xf                           # [m, d]
        norm = jnp.linalg.norm(z_new, axis=1, keepdims=True)
        return z_new / jnp.maximum(norm, 1e-12)

    def euclidean_step(_, z):
        # |z - x|^2 = |z|^2 + |x|^2 - 2 z.x  (never materialize [m, n, d])
        sq = (jnp.sum(z * z, axis=1, keepdims=True)
              + jnp.sum(xf * xf, axis=1)[None, :] - 2.0 * (z @ xf.T))
        w = jnp.exp(-kappa * jnp.maximum(sq, 0.0))
        z_new = w @ xf
        denom = jnp.clip(jnp.sum(w, axis=1, keepdims=True), min=1.0)
        return z_new / denom

    step = cosine_step if metric == "cosine" else euclidean_step
    return jax.lax.fori_loop(0, max_iters, step, z.astype(jnp.float32))


def connected_components(z: jax.Array, epsilon: float,
                         metric: str = "cosine") -> jax.Array:
    """Order-dependent seed merging with mode tie-breaking
    (mean_shift.py:41-76), replicated exactly as a fori_loop over seeds.

    Args:
      z: [m, d] converged seeds.
    Returns:
      [m] int32 cluster labels.
    """
    m = z.shape[0]
    if metric == "cosine":
        dist = 0.5 * (1.0 - z @ z.T)
    else:
        dist = jnp.linalg.norm(z[:, None, :] - z[None, :, :], axis=2)
    adj = dist <= epsilon  # [m, m] bool; row i = i's epsilon-ball

    labels0 = jnp.full((m,), -1, dtype=jnp.int32)

    def body(i, carry):
        labels, k = carry
        do = labels[i] == -1
        neigh = adj[i]
        labeled_neigh = neigh & (labels >= 0)
        has_labeled = jnp.any(labeled_neigh)
        # mode of labels among labeled neighbors; ties -> smallest label
        # (get_label_mode, mean_shift.py:30-38)
        onehot = jax.nn.one_hot(labels, m, dtype=jnp.int32)  # [-1 -> zeros]
        counts = jnp.sum(onehot * labeled_neigh[:, None].astype(jnp.int32),
                         axis=0)
        mode = jnp.argmax(counts).astype(jnp.int32)
        new_label = jnp.where(has_labeled, mode, k)
        labels = jnp.where(do & neigh, new_label, labels)
        k = k + jnp.where(do & ~has_labeled, 1, 0)
        return labels, k

    labels, _ = jax.lax.fori_loop(0, m, body, (labels0, jnp.int32(0)))
    return labels


def swap_background(labels: jax.Array, counts: jax.Array
                    ) -> tuple[jax.Array, jax.Array]:
    """Relabel so the largest cluster is background 0 (mean_shift.py:
    217-227).  Returns (labels, label_max) — label_max lets callers
    permute per-cluster side data (e.g. the fused depth-filter's keep
    mask) through the same swap.  Single authority: the XLA and Pallas
    routes must apply identical swap semantics."""
    label_max = jnp.argmax(counts).astype(jnp.int32)
    swapped = jnp.where(labels == 0, label_max,
                        jnp.where(labels == label_max, 0, labels))
    return jnp.where(label_max != 0, swapped, labels), label_max


def assign_and_swap_background(x: jax.Array, seeds: jax.Array,
                               seed_labels: jax.Array,
                               metric: str = "cosine") -> jax.Array:
    """Assign each pixel to its nearest converged seed, then relabel so the
    largest cluster is background 0 (mean_shift.py:206-227)."""
    m = seeds.shape[0]
    if metric == "cosine":
        # keep the big [n, m] matmul in x's dtype (bf16-capable), accumulate
        # fp32 on the MXU
        sim = jax.lax.dot_general(
            x, seeds.astype(x.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dist = 0.5 * (1.0 - sim)  # [n, m]
    else:
        xf32 = x.astype(jnp.float32)
        sq = (jnp.sum(xf32 * xf32, axis=1, keepdims=True)
              + jnp.sum(seeds * seeds, axis=1)[None, :]
              - 2.0 * (xf32 @ seeds.T))
        dist = jnp.sqrt(jnp.maximum(sq, 0.0))  # [n, m]
    closest = jnp.argmin(dist, axis=1)
    # seed_labels[closest] as a [n] gather costs ~2.7 ms/frame on v5e; one
    # one-hot serves both the label lookup (matvec) and the per-label
    # histogram (matmul, fp32 accumulation).  bf16 is exact for label
    # values <= 256; fall back to f32 one-hot beyond that.
    oh_dtype = jnp.bfloat16 if m <= 256 else jnp.float32
    onehot = (closest[:, None] == jnp.arange(m)[None, :]).astype(oh_dtype)
    labels = jnp.einsum("nm,m->n", onehot, seed_labels.astype(oh_dtype),
                        preferred_element_type=jnp.float32).astype(jnp.int32)
    # per-label histogram via per-seed counts (tiny [m] -> [m] matvec
    # against the seed->label one-hot; exact: counts < 2^24 in fp32)
    per_seed = jnp.einsum("nm->m", onehot,
                          preferred_element_type=jnp.float32)
    seed_oh = (seed_labels[:, None] ==
               jnp.arange(m)[None, :]).astype(jnp.float32)  # [m(seed), m(lab)]
    counts = (per_seed @ seed_oh).astype(jnp.int32)
    labels, _ = swap_background(labels, counts)
    return labels


def seeding_kernel_fits_vmem(n: int, d: int, itemsize: int) -> bool:
    """True if the fused seeding kernel's scoped-VMEM footprint fits.

    The round-5 kernel stores X TRANSPOSED as [d_sub, n_pad] (embedding
    axis on the sublane dimension: d pads to 8 f32 / 16 bf16 instead of
    the 128-lane quantum), so its live set is X^T + the [8, n_pad] f32
    min-distance scratch + ~4 [1, n_pad] f32 step temporaries:

        est = n_pad * (d_sub * itemsize + 48) bytes

    Mosaic's own scoped accounting runs ~1.1x this estimate (measured on
    v5e: fp32 n=307200 d=64 -> est 93.4 MiB, compiler reports 104.02 MiB
    with one extra per-step temp, and the kernel compiles under the
    110 MiB vmem_limit_bytes it requests), so the gate admits est <=
    98 MiB.  Boundary cases measured 2026-08-20: fp32 n=307200 d=64
    (stride-1 480x640 parity — newly admitted by the transposed layout)
    compiles and runs 5.6 ms; fp32 n=345600 est 105 MiB would exceed the
    limit -> rejected to the lazy-blocked route.
    """
    sub = 8 if itemsize == 4 else 16
    d_sub = ((d + sub - 1) // sub) * sub
    n_pad = ((n + 127) // 128) * 128
    est = n_pad * (d_sub * itemsize + 48)
    return est <= 98 * 2 ** 20


def select_seeds_dispatch(xc: jax.Array, num_seeds: int, key: jax.Array, *,
                          metric: str = "cosine", use_pallas: bool = True,
                          first_index: Optional[jax.Array] = None,
                          seed_subsample: int = 1
                          ) -> tuple[jax.Array, jax.Array]:
    """Route farthest-point seeding to the right implementation.

    One authority for the kernel choice (also used by tools/bench_stages.py,
    so the benchmark times exactly the production route):
      * kernel footprint fits VMEM (seeding_kernel_fits_vmem: transposed
        X^T + scratch, ~98 MiB ceiling — includes stride-1 fp32 480x640
        since round 5) -> fully fused Pallas kernel
      * too big but n > 65536      -> exact lazy-bound blocked selection
      * otherwise                  -> plain select_smart_seeds
    All three implement the reference's selection rule (mean_shift.py:
    128-189) with f32 distances and lowest-index argmax tie-break; they
    can still disagree on fp-rounding near-ties (~1e-6 cosine-distance
    gaps) because the lazy route recomputes min-distances blockwise while
    the eager route mins incrementally — evaluate cross-route parity on
    metrics, not per-seed indices (SURVEY.md §7 hard-part #4).
    """
    x_seed = xc[::seed_subsample] if seed_subsample > 1 else xc
    n_seed, d_seed = x_seed.shape
    if (metric == "cosine" and use_pallas
            and seeding_kernel_fits_vmem(n_seed, d_seed,
                                         x_seed.dtype.itemsize)):
        # whole farthest-point loop fused in one kernel, X resident in VMEM
        from unseenobjectclustering_tpu.ops.pallas_seeding import (
            select_seeds_pallas)
        if first_index is None:
            first_index = jax.random.randint(key, (), 0, x_seed.shape[0])
        seeds, seed_indices = select_seeds_pallas(
            x_seed, num_seeds, jnp.asarray(first_index, jnp.int32))
        return seeds, seed_indices * seed_subsample
    if metric == "cosine" and x_seed.shape[0] > 65536:
        # full-resolution (stride-1) seeding: X cannot be VMEM-resident, so
        # use the exact lazy-bound blocked selection — identical argmax
        # semantics, a fraction of the HBM traffic (23 -> ~7 ms/frame on
        # v5e at 307k pixels)
        seeds, seed_indices = select_smart_seeds_lazy(x_seed, num_seeds, key,
                                                      first_index)
        return seeds, seed_indices * seed_subsample
    return select_smart_seeds(xc, num_seeds, key, metric, first_index,
                              seed_subsample)


@functools.partial(jax.jit, static_argnames=(
    "kappa", "num_seeds", "max_iters", "epsilon", "metric", "use_pallas",
    "seed_subsample", "compute_dtype", "filter_threshold"))
def mean_shift_smart_init(x: jax.Array, key: jax.Array, *, kappa: float = 20.0,
                          num_seeds: int = 100, max_iters: int = 10,
                          epsilon: float = 0.04, metric: str = "cosine",
                          use_pallas: bool = True,
                          first_index: Optional[jax.Array] = None,
                          seed_subsample: int = 1,
                          compute_dtype: str = "float32",
                          z_valid: Optional[jax.Array] = None,
                          filter_threshold: float = 0.0
                          ) -> MeanShiftResult:
    """Full mean-shift pipeline (mean_shift.py:192-229), jit-compiled.

    Args:
      x: [n, d] unit-norm pixel embeddings.
      key: PRNG key (first-seed randomness).
      epsilon: seed-merge radius (2 * EMBEDDING_ALPHA in the reference,
        mean_shift.py:123).
      use_pallas: route hill climbing through the fused TPU kernel.
      seed_subsample: pixel stride for the farthest-point seeding phase
        (cfg.CLUSTER.SEED_SUBSAMPLE; 1 = reference parity).
      compute_dtype: dtype for the similarity matmuls ('float32' or
        'bfloat16'); seed merging and normalization stay float32.
      z_valid + filter_threshold: fused depth-validity filter
        (test_dataset.py:183-198): drop clusters whose fraction of
        z_valid pixels is below the threshold, without the separate
        one-hot histogram pass of ops.roi.filter_labels_depth — the
        per-cluster validity counts ride the assignment kernel's X sweep.
    """
    xc = x.astype(jnp.bfloat16) if compute_dtype == "bfloat16" else x
    seeds, seed_indices = select_seeds_dispatch(
        xc, num_seeds, key, metric=metric, use_pallas=use_pallas,
        first_index=first_index, seed_subsample=seed_subsample)
    if metric == "cosine" and use_pallas:
        from unseenobjectclustering_tpu.ops.pallas_mean_shift import (
            assign_labels_pallas, connected_components_pallas,
            hill_climb_pallas)
        z = hill_climb_pallas(xc, seeds, kappa=kappa, max_iters=max_iters)
        seed_labels = connected_components_pallas(z, epsilon)
        # fused assignment + histograms (one X pass), then the
        # largest-cluster -> background relabel (mean_shift.py:217-227)
        labels, counts, valid_counts = assign_labels_pallas(
            xc, z, seed_labels, z_valid=z_valid)
        labels, label_max = swap_background(labels, counts)
        if z_valid is not None and filter_threshold > 0:
            # per-cluster validity fraction is relabel-invariant; permute
            # the keep mask through the background swap and zero the rest
            keep = (valid_counts / jnp.maximum(counts, 1.0)
                    >= filter_threshold)
            keep = jnp.where(label_max != 0,
                             keep.at[label_max].set(keep[0]), keep)
            keep = keep.at[0].set(True)  # background always kept
            # keep[labels] as a [n] gather costs ~2.7 ms/frame on v5e;
            # the same lookup as a bf16 one-hot matvec is ~0.05 ms
            onehot = (labels[:, None] ==
                      jnp.arange(keep.shape[0])[None, :]).astype(jnp.bfloat16)
            hit = jnp.einsum("nk,k->n", onehot, keep.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            labels = jnp.where(hit > 0.5, labels, 0)
    else:
        z = hill_climb_xla(xc, seeds, kappa, max_iters, metric)
        seed_labels = connected_components(z, epsilon, metric)
        labels = assign_and_swap_background(xc, z, seed_labels, metric)
        if z_valid is not None and filter_threshold > 0:
            from unseenobjectclustering_tpu.ops.roi import (
                filter_labels_depth)
            hw = labels.shape[0]
            lab2d = labels.reshape(hw, 1)
            xyz2d = jnp.stack([jnp.zeros((hw, 1)), jnp.zeros((hw, 1)),
                               z_valid.reshape(hw, 1).astype(jnp.float32)],
                              axis=-1)
            labels = filter_labels_depth(lab2d, xyz2d, filter_threshold,
                                         max_labels=num_seeds + 1
                                         ).reshape(hw)
    return MeanShiftResult(labels=labels, seed_indices=seed_indices, seeds=z,
                           seed_labels=seed_labels)
