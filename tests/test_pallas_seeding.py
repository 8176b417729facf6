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


def test_vmem_gate_boundary_shapes():
    """The dispatch gate models the round-5 TRANSPOSED kernel's scoped
    footprint (X^T [d_sub, n_pad] + [8, n] f32 scratch + step temps):
    the boundary shapes below were compile-probed on v5e 2026-08-20.
    History: round 4's 1x-X/40 MiB gate admitted fp32 n=76800 into a
    measured on-chip compile OOM (ADVICE r4 medium); the transposed
    layout halves the footprint and admits every production shape
    including the stride-1 fp32 frame."""
    from unseenobjectclustering_tpu.ops.mean_shift import (
        seeding_kernel_fits_vmem)

    # fp32 stride-1 480x640 (reference-exact parity stage 1): the
    # transposed layout's headline admission — 93.4 MiB est, compiles
    # under the 110 MiB limit, 5.6 ms/frame measured
    assert seeding_kernel_fits_vmem(307200, 64, 4)
    # fp32 480x640 subsample-4 (compile-OOMed the r4 layout): now fits
    assert seeding_kernel_fits_vmem(76800, 64, 4)
    # fp32 224^2 crops (reference-exact zoom-in): admitted
    assert seeding_kernel_fits_vmem(50176, 64, 4)
    # bf16 full frame stride-1 and stride-8 (FAST_CLUSTER): admitted
    assert seeding_kernel_fits_vmem(307200, 64, 2)
    assert seeding_kernel_fits_vmem(38400, 64, 2)
    # beyond the limit: 720x540 fp32 est ~105 MiB -> lazy-blocked route
    assert not seeding_kernel_fits_vmem(345600, 64, 4)
    # wider embeddings push fp32 frames out again
    assert not seeding_kernel_fits_vmem(307200, 128, 4)


def test_dispatch_rejects_oom_shape(rng):
    """A shape beyond the VMEM gate (fp32 d=128 full frame) must route to
    the lazy-blocked selection (same argmax semantics), not the fused
    kernel.  Uses n=131072 > 65536 so the lazy branch (not the plain
    eager loop) is the expected fallback."""
    from unseenobjectclustering_tpu.ops import mean_shift as ms

    assert not ms.seeding_kernel_fits_vmem(131072, 320, 4)
    called = {}
    orig = ms.select_smart_seeds_lazy

    def spy(*a, **k):
        called["lazy"] = True
        return orig(*a, **k)

    x = jnp.asarray(rng.randn(131072, 320).astype(np.float32))
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    old = ms.select_smart_seeds_lazy
    ms.select_smart_seeds_lazy = spy
    try:
        seeds, idxs = ms.select_seeds_dispatch(
            x, 8, jax.random.PRNGKey(0), use_pallas=True)
    finally:
        ms.select_smart_seeds_lazy = old
    assert called.get("lazy"), "over-gate shape must take the lazy route"
    assert seeds.shape == (8, 320) and idxs.shape == (8,)
