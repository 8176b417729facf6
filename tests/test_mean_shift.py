"""Mean-shift clustering tests: numpy oracles re-deriving the reference
semantics (lib/utils/mean_shift.py) plus Pallas/XLA cross-checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unseenobjectclustering_tpu.ops.mean_shift import (
    assign_and_swap_background, connected_components, hill_climb_xla,
    mean_shift_smart_init, select_smart_seeds, select_smart_seeds_lazy)
from unseenobjectclustering_tpu.ops.pallas_mean_shift import hill_climb_pallas


def _unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def make_clustered_data(rng, n_per=200, d=16, k=3, spread=0.05):
    """k tight vMF-ish clusters on the unit sphere; cluster 0 is largest."""
    centers = _unit(rng.randn(k, d))
    xs, labels = [], []
    for i in range(k):
        cnt = n_per * (3 if i == 0 else 1)  # make cluster 0 the biggest
        pts = _unit(centers[i][None] + spread * rng.randn(cnt, d))
        xs.append(pts)
        labels.append(np.full(cnt, i))
    return (np.concatenate(xs).astype(np.float32), np.concatenate(labels),
            centers)


# ---------------------------------------------------------------------------
# numpy oracles (independent implementations of the reference algorithms)
# ---------------------------------------------------------------------------

def oracle_select_seeds(x, m, first):
    n, d = x.shape
    seeds = np.zeros((m, d), np.float32)
    idxs = np.zeros(m, np.int64)
    seeds[0] = x[first]
    idxs[0] = first
    dmin = 0.5 * (1 - x @ x[first])
    for i in range(1, m):
        sel = int(np.argmax(dmin))
        seeds[i] = x[sel]
        idxs[i] = sel
        dmin = np.minimum(dmin, 0.5 * (1 - x @ x[sel]))
    return seeds, idxs


def oracle_hill_climb(x, z, kappa, iters):
    z = z.copy()
    for _ in range(iters):
        w = np.exp(kappa * (z @ x.T))
        z = w @ x
        z = z / np.maximum(np.linalg.norm(z, axis=1, keepdims=True), 1e-12)
    return z


def oracle_connected_components(z, eps):
    """Sequential label propagation with mode tie-break
    (mean_shift.py:41-76)."""
    m = z.shape[0]
    labels = -np.ones(m, np.int64)
    k = 0
    for i in range(m):
        if labels[i] != -1:
            continue
        dist = 0.5 * (1 - z @ z[i])
        comp = dist <= eps
        neigh_labels = labels[comp]
        neigh_labels = neigh_labels[neigh_labels != -1]
        if neigh_labels.size > 0:
            uniq, cnt = np.unique(neigh_labels, return_counts=True)
            label = uniq[np.argmax(cnt)]
        else:
            label = k
            k += 1
        labels[comp] = label
    return labels


# ---------------------------------------------------------------------------

def test_select_seeds_matches_oracle(rng):
    x, _, _ = make_clustered_data(rng, n_per=50, d=8)
    m = 10
    seeds, idxs = select_smart_seeds(
        jnp.asarray(x), m, jax.random.key(0),
        first_index=jnp.int32(7))
    oseeds, oidxs = oracle_select_seeds(x, m, 7)
    np.testing.assert_array_equal(np.asarray(idxs), oidxs)
    np.testing.assert_allclose(np.asarray(seeds), oseeds, atol=1e-6)


def test_lazy_seeding_matches_oracle_exactly(rng):
    """The lazy blocked farthest-point selection is mathematically exact:
    stale per-block bounds are true upper bounds, so the argmax is
    unchanged.  In float64 (no near-tie rounding noise between the matvec
    and matmul formulations) every seed index must match the oracle."""
    x, _, _ = make_clustered_data(rng, n_per=400, d=16, k=5)
    with jax.enable_x64(True):
        # asarray must happen INSIDE enable_x64 or it silently truncates
        # to float32 and the exactness property is not actually exercised
        x64 = jnp.asarray(x.astype(np.float64), jnp.float64)
        seeds, idxs = select_smart_seeds_lazy(
            x64, 20, jax.random.key(0), first_index=jnp.int32(7), block=256)
    _, oidxs = oracle_select_seeds(x.astype(np.float64), 20, 7)
    np.testing.assert_array_equal(np.asarray(idxs), oidxs)


def test_lazy_seeding_fp32_near_parity(rng):
    """fp32 picks can swap on numeric near-ties (measured gaps ~3e-6); the
    chosen seed must still be a farthest-point-quality pick: its true
    min-distance must be within tolerance of the eager pick's at each
    step."""
    x, _, _ = make_clustered_data(rng, n_per=300, d=16, k=4)
    xj = jnp.asarray(x)
    _, ie = select_smart_seeds(xj, 15, jax.random.key(0),
                               first_index=jnp.int32(3))
    _, il = select_smart_seeds_lazy(xj, 15, jax.random.key(0),
                                    first_index=jnp.int32(3), block=256)
    ie, il = np.asarray(ie), np.asarray(il)
    xd = x.astype(np.float64)
    md_e = 0.5 * (1 - xd @ xd[ie[0]])
    md_l = md_e.copy()
    for k in range(1, 15):
        # the lazy pick's min-distance equals the eager pick's up to fp32
        # rounding noise at every step
        assert abs(md_l[il[k]] - md_e[ie[k]]) < 1e-4
        md_e = np.minimum(md_e, 0.5 * (1 - xd @ xd[ie[k]]))
        md_l = np.minimum(md_l, 0.5 * (1 - xd @ xd[il[k]]))


def test_lazy_seeding_block_not_dividing_n(rng):
    x, _, _ = make_clustered_data(rng, n_per=37, d=8, k=3)  # n = 185
    with jax.enable_x64(True):
        _, idxs = select_smart_seeds_lazy(
            jnp.asarray(x, jnp.float64), 12, jax.random.key(1),
            first_index=jnp.int32(0), block=64)
    _, oidxs = oracle_select_seeds(x.astype(np.float64), 12, 0)
    np.testing.assert_array_equal(np.asarray(idxs), oidxs)
    assert (np.asarray(idxs) < x.shape[0]).all()


def test_hill_climb_xla_matches_oracle(rng):
    x, _, _ = make_clustered_data(rng, n_per=40, d=8)
    z0 = x[:5].copy()
    got = np.asarray(hill_climb_xla(jnp.asarray(x), jnp.asarray(z0), 20.0, 10))
    want = oracle_hill_climb(x, z0, 20.0, 10)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_hill_climb_pallas_matches_xla(rng):
    x, _, _ = make_clustered_data(rng, n_per=100, d=16)
    z0 = x[:7].copy()
    want = np.asarray(hill_climb_xla(jnp.asarray(x), jnp.asarray(z0), 20.0, 10))
    got = np.asarray(hill_climb_pallas(jnp.asarray(x), jnp.asarray(z0),
                                       kappa=20.0, max_iters=10, tile_n=128))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_assign_pallas_matches_xla(rng):
    """Fused assignment+histogram kernel == the XLA formulation, including
    the first-occurrence tie-breaking and the background swap."""
    from unseenobjectclustering_tpu.ops.pallas_mean_shift import (
        assign_labels_pallas)
    x, _, centers = make_clustered_data(rng, n_per=130, d=16, k=4)
    seeds = jnp.asarray(_unit(np.repeat(centers, 3, axis=0)
                              + 0.01 * rng.randn(12, 16)).astype(np.float32))
    seed_labels = jnp.asarray(np.array([0, 0, 1, 1, 1, 2, 2, 0, 3, 3, 2, 1],
                                       np.int32))
    want = np.asarray(assign_and_swap_background(jnp.asarray(x), seeds,
                                                 seed_labels))
    zv = (rng.rand(x.shape[0]) > 0.4).astype(np.float32)
    labels, counts, valid_counts = assign_labels_pallas(
        jnp.asarray(x), seeds, seed_labels, z_valid=jnp.asarray(zv),
        tile_n=128)
    label_max = jnp.argmax(counts).astype(jnp.int32)
    got = jnp.where(labels == 0, label_max,
                    jnp.where(labels == label_max, 0, labels))
    got = np.asarray(jnp.where(label_max != 0, got, labels))
    np.testing.assert_array_equal(got, want)
    # histograms match direct bincounts of the pre-swap labels
    pre = np.asarray(labels)
    np.testing.assert_array_equal(np.asarray(counts).astype(np.int64),
                                  np.bincount(pre, minlength=12))
    np.testing.assert_allclose(
        np.asarray(valid_counts),
        np.bincount(pre, weights=zv, minlength=12), atol=1e-3)


def test_connected_components_matches_oracle(rng):
    # seeds drawn near 3 centers -> some merge, order-dependent
    x, _, centers = make_clustered_data(rng, n_per=30, d=8, spread=0.02)
    z = _unit(np.repeat(centers, 4, axis=0) +
              0.01 * rng.randn(12, 8)).astype(np.float32)
    got = np.asarray(connected_components(jnp.asarray(z), 0.04))
    want = oracle_connected_components(z, 0.04)
    np.testing.assert_array_equal(got, want)


def test_connected_components_pallas_matches_xla(rng):
    from unseenobjectclustering_tpu.ops.pallas_mean_shift import (
        connected_components_pallas)
    x, _, centers = make_clustered_data(rng, n_per=30, d=16, k=4,
                                        spread=0.02)
    z = _unit(np.repeat(centers, 5, axis=0)
              + 0.01 * rng.randn(20, 16)).astype(np.float32)
    want = np.asarray(connected_components(jnp.asarray(z), 0.04))
    got = np.asarray(connected_components_pallas(jnp.asarray(z), 0.04))
    np.testing.assert_array_equal(got, want)


def test_assignment_and_background_swap(rng):
    x, gt, centers = make_clustered_data(rng, n_per=100, d=8, spread=0.02)
    seeds = jnp.asarray(_unit(centers).astype(np.float32))
    seed_labels = jnp.arange(3, dtype=jnp.int32)
    labels = np.asarray(assign_and_swap_background(jnp.asarray(x), seeds,
                                                   seed_labels))
    # cluster 0 (gt) is the largest -> must still be label 0
    assert np.all(labels[gt == 0] == 0)
    # all clusters recovered exactly (well separated)
    for g in range(3):
        vals = np.unique(labels[gt == g])
        assert vals.size == 1


def test_full_pipeline_recovers_clusters(rng):
    x, gt, _ = make_clustered_data(rng, n_per=150, d=16, spread=0.03)
    res = mean_shift_smart_init(
        jnp.asarray(x), jax.random.key(1), kappa=20.0, num_seeds=20,
        max_iters=10, epsilon=0.04, use_pallas=False)
    labels = np.asarray(res.labels)
    # 3 clusters discovered, each gt cluster maps to exactly one label
    assert np.unique(labels).size == 3
    for g in range(3):
        assert np.unique(labels[gt == g]).size == 1
    # biggest cluster is background 0
    assert np.all(labels[gt == 0] == 0)


def test_full_pipeline_pallas_agrees(rng):
    x, gt, _ = make_clustered_data(rng, n_per=150, d=16, spread=0.03)
    r1 = mean_shift_smart_init(jnp.asarray(x), jax.random.key(1), kappa=20.0,
                               num_seeds=20, max_iters=10, epsilon=0.04,
                               use_pallas=False)
    r2 = mean_shift_smart_init(jnp.asarray(x), jax.random.key(1), kappa=20.0,
                               num_seeds=20, max_iters=10, epsilon=0.04,
                               use_pallas=True)
    np.testing.assert_array_equal(np.asarray(r1.labels), np.asarray(r2.labels))


def test_full_pipeline_cat_fusion_dim(rng):
    """d=128 embeddings (RGBD-cat doubles the unit count, SEG.py:109-110)
    cluster correctly through both the XLA and Pallas paths."""
    x, gt, _ = make_clustered_data(rng, n_per=120, d=128, spread=0.03)
    r1 = mean_shift_smart_init(jnp.asarray(x), jax.random.key(1), kappa=20.0,
                               num_seeds=20, max_iters=10, epsilon=0.04,
                               use_pallas=False)
    labels = np.asarray(r1.labels)
    assert np.unique(labels).size == 3
    for g in range(3):
        assert np.unique(labels[gt == g]).size == 1
    r2 = mean_shift_smart_init(jnp.asarray(x), jax.random.key(1), kappa=20.0,
                               num_seeds=20, max_iters=10, epsilon=0.04,
                               use_pallas=True)
    np.testing.assert_array_equal(labels, np.asarray(r2.labels))


def test_fused_depth_filter_matches_unfused(rng):
    """mean_shift_smart_init(z_valid, filter_threshold) == clustering then
    ops.roi.filter_labels_depth, on both the Pallas and XLA routes."""
    from unseenobjectclustering_tpu.ops.roi import filter_labels_depth

    x, _, _ = make_clustered_data(rng, n_per=150, d=16, spread=0.03)
    n = x.shape[0]
    zv = (rng.rand(n) > 0.45).astype(np.float32)
    xyz = np.zeros((n, 1, 3), np.float32)
    xyz[:, 0, 2] = zv
    for use_pallas in (False, True):
        base = mean_shift_smart_init(
            jnp.asarray(x), jax.random.key(1), kappa=20.0, num_seeds=20,
            max_iters=10, epsilon=0.04, use_pallas=use_pallas)
        want = np.asarray(filter_labels_depth(
            base.labels.reshape(n, 1), jnp.asarray(xyz), 0.6,
            max_labels=21)).reshape(n)
        fused = mean_shift_smart_init(
            jnp.asarray(x), jax.random.key(1), kappa=20.0, num_seeds=20,
            max_iters=10, epsilon=0.04, use_pallas=use_pallas,
            z_valid=jnp.asarray(zv), filter_threshold=0.6)
        np.testing.assert_array_equal(np.asarray(fused.labels), want,
                                      err_msg=f"pallas={use_pallas}")
