"""Fused seeding kernel vs the XLA farthest-point reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unseenobjectclustering_tpu.ops.mean_shift import select_smart_seeds
from unseenobjectclustering_tpu.ops.pallas_seeding import select_seeds_pallas


@pytest.mark.parametrize("n,d,m", [(500, 16, 10), (501, 16, 10),
                                   (2000, 64, 32)])
def test_pallas_seeding_matches_xla(n, d, m):
    # 501 leaves the last sublane tile partially padded — exercises the
    # aligned dynamic tile read (dist_to) against rows near the pad edge
    rng = np.random.RandomState(0)
    x = rng.randn(n, d).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    first = jnp.int32(7)

    want_seeds, want_idx = select_smart_seeds(
        jnp.asarray(x), m, jax.random.PRNGKey(0), "cosine",
        first_index=first)
    got_seeds, got_idx = select_seeds_pallas(jnp.asarray(x), m, first)

    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))
    np.testing.assert_allclose(np.asarray(got_seeds),
                               np.asarray(want_seeds), atol=1e-6)


def test_pallas_seeding_bf16_matches_xla():
    """bf16 inputs (16-sublane tiles: the stage-1 fast path's dtype) —
    distances accumulate in f32 from identical bf16 operands in both
    stacks, so seed indices must agree exactly."""
    rng = np.random.RandomState(2)
    x = rng.randn(500, 32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    xb = jnp.asarray(x, jnp.bfloat16)
    first = jnp.int32(11)

    _, want_idx = select_smart_seeds(xb, 12, jax.random.PRNGKey(0),
                                     "cosine", first_index=first)
    _, got_idx = select_seeds_pallas(xb, 12, first)
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))


def test_pallas_seeding_covers_clusters():
    """Seeds must land in every well-separated cluster."""
    rng = np.random.RandomState(1)
    centers = rng.randn(5, 32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, 5, size=1000)
    x = centers[assign] + 0.01 * rng.randn(1000, 32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    _, idx = select_seeds_pallas(jnp.asarray(x, jnp.float32), 16,
                                 jnp.int32(0))
    seeded_clusters = set(assign[np.asarray(idx)])
    assert seeded_clusters == set(range(5))


def test_seeding_under_map_and_cond(rng):
    """The crop path runs the kernel inside lax.map + lax.cond; keep that
    composition working (it exposed Mosaic lowering limits: scalar/dynamic
    lane stores and value dynamic_slice have no TPU lowering — the kernel
    now uses ref reads + masked-select accumulation)."""
    import jax

    from unseenobjectclustering_tpu.ops.mean_shift import select_smart_seeds

    x = rng.randn(4, 300, 16).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    xj = jnp.asarray(x)
    valid = jnp.asarray([True, True, False, True])

    @jax.jit
    def f(xj, valid):
        def one(args):
            xi, ok = args
            def run(_):
                _, idxs = select_seeds_pallas(xi, 8, jnp.int32(3))
                return idxs
            return jax.lax.cond(ok, run,
                                lambda _: jnp.zeros((8,), jnp.int32), None)
        return jax.lax.map(one, (xj, valid))

    got = np.asarray(f(xj, valid))
    for i, ok in enumerate([True, True, False, True]):
        if not ok:
            assert (got[i] == 0).all()
            continue
        _, want = select_smart_seeds(xj[i], 8, jax.random.key(0), "cosine",
                                     jnp.int32(3))
        np.testing.assert_array_equal(got[i], np.asarray(want))
