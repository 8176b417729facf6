"""Euclidean-metric paths (EMBEDDING_METRIC='euclidean' — the reference's
default config value, lib/fcn/config.py:260; shipped recipes use cosine)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unseenobjectclustering_tpu.models.losses import embedding_loss
from unseenobjectclustering_tpu.ops.mean_shift import mean_shift_smart_init
from unseenobjectclustering_tpu.utils.evaluation import multilabel_metrics


def numpy_euclidean_loss(x, labels, alpha, delta, li, le):
    """Direct oracle of EmbeddingLoss euclidean semantics
    (embedding.py:68-133 with metric='euclidean', normalization on)."""
    b, h, w, c = x.shape
    total_intra = 0.0
    total_inter = 0.0
    K = labels.max() + 1
    for bi in range(b):
        xs = x[bi].reshape(-1, c)
        ls = labels[bi].reshape(-1)
        means = []
        for k in range(K):
            m = xs[ls == k].sum(0) / ((ls == k).sum() + 1e-10)
            m = m / max(np.linalg.norm(m), 1e-12)
            means.append(m)
        means = np.stack(means)
        d = np.linalg.norm(xs - means[np.clip(ls, 0, K - 1)], axis=1)
        d = np.where(ls >= 0, d, 0.0)
        if not (d - alpha > 0).any():
            intra = 0.0
        else:
            nk = np.array([((d > alpha) & (ls == k)).sum() for k in range(K)])
            wpix = np.maximum(nk[np.clip(ls, 0, K - 1)] * (ls >= 0), 50) * K
            intra = (d ** 2 / wpix).sum()
        total_intra += intra
        dm = np.linalg.norm(means[:, None] - means[None, :], axis=2)
        hinge = np.maximum(delta - dm, 0) ** 2
        np.fill_diagonal(hinge, 0)
        total_inter += hinge.sum()
    intra = li * total_intra / b
    inter = le * (total_inter / (K * (K - 1) / 2 * b)) if K > 1 else 0.0
    return intra, inter


def test_euclidean_loss_matches_oracle():
    rng = np.random.RandomState(0)
    b, h, w, c = 2, 8, 8, 4
    x = rng.randn(b, h, w, c).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    labels = rng.randint(0, 3, size=(b, h, w)).astype(np.int32)
    out = embedding_loss(jnp.asarray(x), jnp.asarray(labels), alpha=0.05,
                         delta=0.5, lambda_intra=2.0, lambda_inter=3.0,
                         max_k=3, metric="euclidean")
    want_intra, want_inter = numpy_euclidean_loss(x, labels, 0.05, 0.5,
                                                  2.0, 3.0)
    np.testing.assert_allclose(float(out.intra), want_intra, rtol=1e-4)
    np.testing.assert_allclose(float(out.inter), want_inter, rtol=1e-4)


def test_euclidean_mean_shift_clusters():
    """Euclidean mean shift must separate well-spaced blobs in R^d."""
    rng = np.random.RandomState(1)
    h, w, d = 32, 48, 8
    centers = rng.randn(3, d) * 4.0
    labels_gt = np.zeros((h, w), np.int32)
    labels_gt[4:14, 4:20] = 1
    labels_gt[18:30, 24:44] = 2
    x = centers[labels_gt.reshape(-1)] + 0.05 * rng.randn(h * w, d)
    res = mean_shift_smart_init(
        jnp.asarray(x, jnp.float32), jax.random.PRNGKey(2), kappa=2.0,
        num_seeds=16, max_iters=10, epsilon=0.3, metric="euclidean",
        use_pallas=False)
    pred = np.asarray(res.labels).reshape(h, w)
    m = multilabel_metrics(pred, labels_gt)
    assert m["Objects F-measure"] > 0.95
