"""Embedding-loss golden tests: a numpy oracle re-deriving the reference's
loss semantics (lib/networks/embedding.py:57-133) vs the jitted JAX version."""

import jax.numpy as jnp
import numpy as np
import pytest

from unseenobjectclustering_tpu.models.losses import (compute_cluster_means,
                                                      embedding_loss)


def _unit(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


def oracle_loss(x, labels, alpha, delta, li, le, normalize=True):
    """Reference loss semantics in numpy; x [B,H,W,C], labels [B,H,W]."""
    b, h, w, c = x.shape
    K = int(labels.max()) + 1
    # cluster means
    means = np.zeros((b, K, c), np.float64)
    for k in range(K):
        mask = (labels == k).astype(np.float64)[..., None]
        means[:, k] = (x * mask).sum((1, 2)) / (mask.sum((1, 2)) + 1e-10)
    if normalize:
        norms = np.linalg.norm(means, axis=-1, keepdims=True)
        means = np.divide(means, norms, out=np.zeros_like(means),
                          where=norms > 1e-12)
    # tiled means per pixel
    tiled = np.zeros_like(x, dtype=np.float64)
    for k in range(K):
        mask = (labels == k).astype(np.float64)[..., None]
        tiled += mask * means[:, k][:, None, None, :]
    labeled = (labels >= 0).astype(np.float64)
    d = labeled * (0.5 * (1 - (x * tiled).sum(-1)))
    hard = (d - alpha) > 0
    if hard.sum() > 0:
        weights = np.zeros((b, h, w))
        for k in range(K):
            mask = (labels == k).astype(np.float64)
            n_k = ((d > alpha) * mask).sum((1, 2), keepdims=True)
            weights += mask * n_k
        weights = np.maximum(weights, 50.0) * K
        intra = (d ** 2 / weights).sum() / b
    else:
        intra = 0.0
    intra *= li
    if K > 1:
        dist = 0.5 * (1 - np.einsum("bkc,blc->bkl", means, means))
        hinge = np.maximum(delta - dist, 0.0)
        hinge *= 1 - np.eye(K)[None]
        inter = (hinge ** 2).sum() / (K * (K - 1) / 2 * b) * le
    else:
        inter = 0.0
    return intra + inter, intra, inter


def make_case(rng, b=2, h=12, w=16, c=8, k=3, with_ignore=True):
    labels = rng.randint(0, k, size=(b, h, w)).astype(np.int32)
    if with_ignore:
        drop = rng.rand(b, h, w) < 0.2
        labels[drop] = -1
    # embeddings loosely clustered around per-label directions
    dirs = _unit(rng.randn(k, c))
    x = np.zeros((b, h, w, c), np.float32)
    for kk in range(k):
        noise = 0.3 * rng.randn(b, h, w, c)
        x += ((labels == kk)[..., None] *
              _unit(dirs[kk][None, None, None] + noise)).astype(np.float32)
    x[labels == -1] = _unit(rng.randn((labels == -1).sum(), c))
    return x.astype(np.float32), labels


def test_cluster_means_match_oracle(rng):
    x, labels = make_case(rng)
    means, counts = compute_cluster_means(jnp.asarray(x), jnp.asarray(labels),
                                          max_k=8)
    K = labels.max() + 1
    for k in range(K):
        mask = (labels == k)[..., None]
        want = (x * mask).sum((1, 2)) / (mask.sum((1, 2)) + 1e-10)
        want = np.divide(want, np.linalg.norm(want, axis=-1, keepdims=True))
        np.testing.assert_allclose(np.asarray(means)[:, k], want, rtol=1e-4,
                                   atol=1e-5)
    # empty padded clusters have zero mean and zero count
    np.testing.assert_array_equal(np.asarray(counts)[:, K:], 0)
    np.testing.assert_array_equal(np.asarray(means)[:, K:], 0)


@pytest.mark.parametrize("with_ignore", [False, True])
@pytest.mark.parametrize("k", [1, 3, 5])
def test_loss_matches_oracle(rng, k, with_ignore):
    x, labels = make_case(rng, k=k, with_ignore=with_ignore)
    out = embedding_loss(jnp.asarray(x), jnp.asarray(labels), alpha=0.02,
                         delta=0.5, lambda_intra=10.0, lambda_inter=10.0,
                         max_k=8)
    want_total, want_intra, want_inter = oracle_loss(
        x.astype(np.float64), labels, 0.02, 0.5, 10.0, 10.0)
    np.testing.assert_allclose(float(out.intra), want_intra, rtol=1e-4)
    np.testing.assert_allclose(float(out.inter), want_inter, rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(float(out.loss), want_total, rtol=1e-4)


def test_loss_no_hard_negatives(rng):
    # perfectly tight clusters -> all intra distances < alpha -> intra = 0
    b, h, w, c, k = 1, 8, 8, 4, 2
    labels = (np.arange(h * w).reshape(1, h, w) % k).astype(np.int32)
    dirs = _unit(np.eye(c)[:k])
    x = dirs[labels]
    out = embedding_loss(jnp.asarray(x.astype(np.float32)),
                         jnp.asarray(labels), alpha=0.02, delta=0.5,
                         lambda_intra=10.0, lambda_inter=10.0, max_k=4)
    assert float(out.intra) == 0.0
    # orthogonal means: distance 0.5 == delta -> hinge 0
    assert float(out.inter) == pytest.approx(0.0, abs=1e-6)


def test_loss_is_differentiable(rng):
    import jax

    x, labels = make_case(rng, b=1, h=6, w=6, c=4, k=2)

    def f(xx):
        return embedding_loss(xx, jnp.asarray(labels), alpha=0.02, delta=0.5,
                              lambda_intra=10.0, lambda_inter=10.0,
                              max_k=4).loss

    g = jax.grad(f)(jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_loss_all_unlabeled_has_finite_grad(rng):
    """A batch with labels all -1 (k_dyn = 0) must give loss 0 AND finite
    gradients — the unguarded 0/0 in the intra weighting produced NaN
    through the untaken jnp.where branch (the classic where/NaN-grad
    pitfall)."""
    import jax

    x, _ = make_case(rng, b=1, h=6, w=6, c=4, k=2)
    labels = np.full((1, 6, 6), -1, np.int32)

    def f(xx):
        return embedding_loss(xx, jnp.asarray(labels), alpha=0.02, delta=0.5,
                              lambda_intra=10.0, lambda_inter=10.0,
                              max_k=4).loss

    assert float(f(jnp.asarray(x))) == 0.0
    g = jax.grad(f)(jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()


def test_loss_labels_beyond_max_k_are_ignored(rng):
    """Labels >= max_k are treated as unlabeled (-1): their all-zero
    one-hot would otherwise inject a constant 0.5 cosine distance into the
    intra term and inflate k_dyn past the cluster budget."""
    x, labels = make_case(rng, b=1, h=6, w=6, c=4, k=2)
    capped = embedding_loss(x, jnp.asarray(labels), alpha=0.02, delta=0.5,
                            lambda_intra=10.0, lambda_inter=10.0, max_k=4)
    overflow = np.array(labels)
    overflow[overflow == 1] = 7          # beyond max_k=4
    masked = np.array(labels)
    masked[masked == 1] = -1             # explicit ignore
    out_overflow = embedding_loss(x, jnp.asarray(overflow), alpha=0.02,
                                  delta=0.5, lambda_intra=10.0,
                                  lambda_inter=10.0, max_k=4)
    out_masked = embedding_loss(x, jnp.asarray(masked), alpha=0.02,
                                delta=0.5, lambda_intra=10.0,
                                lambda_inter=10.0, max_k=4)
    np.testing.assert_allclose(float(out_overflow.loss),
                               float(out_masked.loss), rtol=1e-6)
    assert float(out_overflow.loss) != float(capped.loss)
