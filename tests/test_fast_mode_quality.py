"""Fast-mode (bfloat16 + seeding subsample) clustering quality vs parity.

Synthetic vMF-distributed unit embeddings with known cluster structure:
the fast configuration must recover the same instances (Objects F-measure
within a point of the float32 full-seeding path).  This bounds the quality
cost of the production-fast settings used by bench.py and --fast.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unseenobjectclustering_tpu.ops.mean_shift import mean_shift_smart_init
from unseenobjectclustering_tpu.utils.evaluation import multilabel_metrics

pytestmark = pytest.mark.slow  # multi-minute: full CI tier only (pytest --runslow)


def synthetic_scene(rng, h=96, w=128, k=4, d=16, kappa_data=60.0):
    """Label image with k blob instances + background; embeddings are
    vMF-ish samples around per-instance mean directions."""
    labels = np.zeros((h, w), np.int32)
    # non-overlapping blobs on a 2x2 grid (overlap would merge GT instances)
    cells = [(h // 4, w // 4), (h // 4, 3 * w // 4),
             (3 * h // 4, w // 4), (3 * h // 4, 3 * w // 4)]
    for i in range(1, k + 1):
        cy, cx = cells[(i - 1) % 4]
        cy += rng.randint(-4, 5)
        cx += rng.randint(-4, 5)
        r = rng.randint(6, 12)
        y, x = np.mgrid[:h, :w]
        labels[(y - cy) ** 2 + (x - cx) ** 2 <= r * r] = i

    means = rng.randn(k + 1, d)
    means /= np.linalg.norm(means, axis=1, keepdims=True)
    x = means[labels.reshape(-1)] + rng.randn(h * w, d) / np.sqrt(kappa_data)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32), labels


def run_cluster(x, h, w, **kw):
    res = mean_shift_smart_init(
        jnp.asarray(x), jax.random.PRNGKey(5), kappa=20.0, num_seeds=32,
        max_iters=10, epsilon=0.04, metric="cosine", use_pallas=False, **kw)
    return np.asarray(res.labels).reshape(h, w)


@pytest.mark.parametrize("seed", [0, 1])
def test_fast_settings_match_parity_quality(seed):
    rng = np.random.RandomState(seed)
    x, gt = synthetic_scene(rng)
    h, w = gt.shape

    parity = run_cluster(x, h, w)
    fast = run_cluster(x, h, w, seed_subsample=4, compute_dtype="bfloat16")

    m_parity = multilabel_metrics(parity, gt)
    m_fast = multilabel_metrics(fast, gt)

    # both must essentially solve the synthetic scene...
    assert m_parity["Objects F-measure"] > 0.95
    # ...and fast mode must not lose quality
    assert (m_fast["Objects F-measure"]
            >= m_parity["Objects F-measure"] - 0.01)
