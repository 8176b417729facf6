"""Metric-learning embedding loss, TPU-native.

Re-implements the semantics of the reference EmbeddingLoss
(lib/networks/embedding.py:57-133) as a pure jittable function:

  * spherical cluster means: masked sum / count (+1e-10), L2-normalized
    (embedding.py:23-54)
  * intra loss: cosine distance 0.5*(1 - x . mu) of each labeled pixel to its
    own cluster mean, with hard-negative-mined per-pixel weights
    max(N_k, 50) * K, squared, summed, / batch (embedding.py:93-117)
  * inter loss: pairwise distances between cluster means, hinge
    max(0, delta - d)^2 off-diagonal, / (K(K-1)/2 * B) (embedding.py:120-128)
  * label -1 = unlabeled (sampled-pixel training) is ignored (embedding.py:90)

The reference's K-loops over Python range(K) become one-hot matmuls over a
static MAX_K (XLA needs static shapes); the dynamic K = max(label)+1 enters
only as a traced scalar in the weighting/normalization arithmetic, exactly as
in the reference.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class EmbeddingLossOut(NamedTuple):
    loss: jax.Array
    intra: jax.Array
    inter: jax.Array


def _safe_norm(v: jax.Array, axis: int = -1, keepdims: bool = False,
               eps: float = 1e-24) -> jax.Array:
    """L2 norm with a finite gradient at 0 (jnp.linalg.norm NaNs there)."""
    sq = jnp.sum(v * v, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps))


def l2_normalize(x: jax.Array, axis: int = -1,
                 eps: float = 1e-12) -> jax.Array:
    """L2-normalize with fp32 accumulation and a finite gradient at 0;
    zero vectors stay zero (torch F.normalize semantics).  The single
    authority for feature/mean normalization — SEGNET's output normalize
    (SEG.py:112-114) uses this same function so network and loss can never
    drift numerically."""
    xf = x.astype(jnp.float32)
    norm = _safe_norm(xf, axis=axis, keepdims=True)
    return (x / jnp.maximum(norm, eps)).astype(x.dtype)


# internal alias used by the loss terms (fp32 inputs: cast-back is identity)
_safe_normalize = l2_normalize


def compute_cluster_means(x: jax.Array, labels: jax.Array, max_k: int,
                          normalize: bool = True) -> tuple[jax.Array, jax.Array]:
    """Spherical means of pixel embeddings per GT cluster.

    Args:
      x: [B, H, W, C] embeddings (NHWC).
      labels: [B, H, W] int cluster ids in {-1, 0..K-1}; -1 ignored.
      max_k: static upper bound on clusters.
    Returns:
      (means [B, max_k, C], counts [B, max_k]).
    """
    b, h, w, c = x.shape
    xf = x.reshape(b, h * w, c).astype(jnp.float32)
    lab = labels.reshape(b, h * w)
    # one_hot of -1 is all-zeros, so unlabeled pixels drop out naturally
    onehot = jax.nn.one_hot(lab, max_k, dtype=jnp.float32)  # [B, HW, K]
    sums = jnp.einsum("bpk,bpc->bkc", onehot, xf)  # MXU matmul
    counts = jnp.sum(onehot, axis=1)  # [B, K]
    means = sums / (counts[..., None] + 1e-10)
    if normalize:
        means = _safe_normalize(means, axis=-1)
    return means, counts


@functools.partial(jax.jit, static_argnames=(
    "max_k", "metric", "normalize"))
def embedding_loss(x: jax.Array, labels: jax.Array, *, alpha: float,
                   delta: float, lambda_intra: float, lambda_inter: float,
                   max_k: int = 32, metric: str = "cosine",
                   normalize: bool = True) -> EmbeddingLossOut:
    """Total = intra + inter metric-learning loss.

    Args:
      x: [B, H, W, C] (unit-norm when normalize=True upstream).
      labels: [B, H, W] int32 in {-1, 0..K-1}.
    """
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    lab = labels.astype(jnp.int32)
    # labels beyond the static cluster budget are treated as unlabeled
    # (= the -1 ignore convention): their one-hot would be all-zeros, which
    # silently injected a constant 0.5 cosine distance into the intra term
    # and inflated the inter normalization through k_dyn
    lab = jnp.where(lab >= max_k, -1, lab)

    # dynamic K = max(labels)+1 across the batch (embedding.py:76)
    k_dyn = jnp.max(lab) + 1  # traced scalar
    k_f = k_dyn.astype(jnp.float32)

    means, _ = compute_cluster_means(xf, lab, max_k, normalize)  # [B,K,C]

    # --- intra loss ---------------------------------------------------------
    # All per-pixel gathers are phrased as one-hot matmuls: gathers lower to
    # scatter-adds in the backward pass (~1s/step on [16, 50k] at 224^2),
    # while these einsums run forward AND backward on the MXU.
    labeled = (lab >= 0).astype(jnp.float32)  # [B,H,W]
    # one_hot of -1 is all-zeros, so unlabeled pixels drop out naturally
    onehot = jax.nn.one_hot(lab.reshape(b, h * w), max_k, dtype=jnp.float32)
    # cluster mean per pixel: [B, HW, C] on the MXU
    mean_per_pixel = jnp.einsum("bpk,bkc->bpc", onehot, means)
    mean_per_pixel = mean_per_pixel.reshape(b, h, w, c)

    if metric == "cosine":
        d_intra = labeled * (0.5 * (1.0 - jnp.sum(xf * mean_per_pixel,
                                                  axis=-1)))
    else:  # euclidean
        d_intra = labeled * _safe_norm(xf - mean_per_pixel, axis=-1)

    hard = (d_intra - alpha) > 0  # [B,H,W]
    any_hard = jnp.sum(hard.astype(jnp.float32)) > 0

    # N_k = #pixels of cluster k with distance > alpha, per sample
    over = (d_intra > alpha).astype(jnp.float32) * labeled  # [B,H,W]
    n_k = jnp.einsum("bpk,bp->bk", onehot, over.reshape(b, h * w))  # [B,K]
    # per-pixel weight = N_{k(pixel)} (0 for unlabeled), then max(.,50) * K
    w_pix = jnp.einsum("bpk,bk->bp", onehot, n_k)
    w_pix = w_pix * (labeled.reshape(b, h * w))
    w_pix = jnp.maximum(w_pix, 50.0) * k_f
    # w_pix is 0 only when the batch holds no labels at all (k_f = 0);
    # guard the division so that case is 0/eps = 0 rather than 0/0 = NaN —
    # the forward is masked by any_hard below, but jax.grad would still
    # backpropagate NaN through the untaken where-branch
    intra_sum = jnp.sum((d_intra.reshape(b, h * w) ** 2)
                        / jnp.maximum(w_pix, 1e-12)) / b
    intra = jnp.where(any_hard, intra_sum, 0.0) * lambda_intra

    # --- inter loss ---------------------------------------------------------
    if metric == "cosine":
        d_inter = 0.5 * (1.0 - jnp.einsum("bkc,blc->bkl", means, means))
    else:
        diff = means[:, :, None, :] - means[:, None, :, :]
        d_inter = _safe_norm(diff, axis=-1)
    ks = jnp.arange(max_k)
    valid_pair = ((ks[None, :, None] < k_dyn) & (ks[None, None, :] < k_dyn)
                  & (ks[:, None] != ks[None, :])[None])
    hinge = jnp.maximum(delta - d_inter, 0.0) * valid_pair.astype(jnp.float32)
    inter_sum = jnp.sum(hinge ** 2) / jnp.maximum(k_f * (k_f - 1.0) / 2.0 * b, 1.0)
    inter = jnp.where(k_dyn > 1, inter_sum, 0.0) * lambda_inter

    return EmbeddingLossOut(loss=intra + inter, intra=intra, inter=inter)
