"""Training-engine tests: optimizer parity vs torch, DP sharding, loss step.

The optimizer oracle is torch (CPU) — the reference trains with
torch.optim.Adam/SGD + L2 weight decay in the gradient
(tools/train_net.py:135-142); our optax chains must match update-for-update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.engine.train import (create_train_state,
                                                     make_optimizer,
                                                     make_train_step,
                                                     multistep_schedule)
from unseenobjectclustering_tpu.parallel import (make_mesh, replicate,
                                                 shard_batch)


def small_cfg(metric="cosine"):
    return Config.from_dict({
        "INPUT": "RGBD",
        "TRAIN": {"EMBEDDING_METRIC": metric, "NUM_UNITS": 4,
                  "EMBEDDING_ALPHA": 0.02, "EMBEDDING_DELTA": 0.5,
                  "EMBEDDING_LAMBDA_INTRA": 1.0,
                  "EMBEDDING_LAMBDA_INTER": 1.0,
                  "LEARNING_RATE": 1e-3, "WEIGHT_DECAY": 1e-4},
    })


def _batch(rng, b=2, h=32, w=32):
    img = rng.rand(b, h, w, 3).astype(np.float32)
    xyz = rng.rand(b, h, w, 3).astype(np.float32)
    label = rng.randint(0, 3, size=(b, h, w)).astype(np.int32)
    return img, xyz, label


def test_train_step_decreases_loss():
    cfg = small_cfg()
    state = create_train_state(cfg, network_name="seg_resnet34_8s_embedding",
                               height=32, width=32)
    step = make_train_step(cfg, max_k=8)
    rng = np.random.RandomState(0)
    img, xyz, label = _batch(rng)
    losses = []
    for _ in range(5):
        state, metrics = step(state, img, xyz, label)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_train_step_data_parallel_matches_single_device():
    """DP over the 8-device CPU mesh must match single-device numerics."""
    cfg = small_cfg()
    mesh = make_mesh()
    # two identical states (init is deterministic); train_step donates its
    # input state, so each run needs its own
    state = create_train_state(cfg, network_name="seg_resnet34_8s_embedding",
                               height=32, width=32)
    state_dp = replicate(
        create_train_state(cfg, network_name="seg_resnet34_8s_embedding",
                           height=32, width=32), mesh)
    step = make_train_step(cfg, max_k=8)
    rng = np.random.RandomState(1)
    img, xyz, label = _batch(rng, b=8)

    img_s, xyz_s, label_s = shard_batch((img, xyz, label), mesh)
    state1, m1 = step(state, img, xyz, label)
    state2, m2 = step(state_dp, img_s, xyz_s, label_s)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_adam_matches_torch():
    torch = pytest.importorskip("torch")
    cfg = small_cfg()
    tx, _ = make_optimizer(cfg, "adam")

    w0 = np.random.RandomState(0).randn(5, 3).astype(np.float32)
    g = np.random.RandomState(1).randn(5, 3).astype(np.float32)

    # torch oracle
    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([wt], lr=cfg.TRAIN.LEARNING_RATE,
                           betas=(cfg.TRAIN.MOMENTUM, cfg.TRAIN.BETA),
                           weight_decay=cfg.TRAIN.WEIGHT_DECAY)
    for _ in range(3):
        opt.zero_grad()
        wt.grad = torch.tensor(g.copy())
        opt.step()

    # optax
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for _ in range(3):
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state,
                                       params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               wt.detach().numpy(), atol=1e-5)


def test_sgd_matches_torch():
    torch = pytest.importorskip("torch")
    cfg = small_cfg()
    tx, _ = make_optimizer(cfg, "sgd", steps_per_epoch=1)

    w0 = np.random.RandomState(2).randn(4, 2).astype(np.float32)
    g = np.random.RandomState(3).randn(4, 2).astype(np.float32)

    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.SGD([wt], lr=cfg.TRAIN.LEARNING_RATE,
                          momentum=cfg.TRAIN.MOMENTUM,
                          weight_decay=cfg.TRAIN.WEIGHT_DECAY)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for _ in range(3):
        opt.zero_grad()
        wt.grad = torch.tensor(g.copy())
        opt.step()
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state,
                                       params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               wt.detach().numpy(), atol=1e-6)


def test_multistep_schedule():
    sched = multistep_schedule(1.0, milestones=(2, 4), gamma=0.1,
                               steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(19)) == pytest.approx(1.0)
    assert float(sched(20)) == pytest.approx(0.1)
    assert float(sched(40)) == pytest.approx(0.01)
    # resume from epoch 3: only milestone 4 remains, at relative epoch 1
    sched2 = multistep_schedule(1.0, milestones=(2, 4), gamma=0.1,
                                steps_per_epoch=10, start_epoch=3)
    assert float(sched2(5)) == pytest.approx(1.0)
    assert float(sched2(10)) == pytest.approx(0.1)


def test_state_schedule_is_the_applied_schedule():
    """TrainState.schedule is the exact schedule baked into state.tx, so
    the train loops log the lr the optimizer applies.  Convention check:
    for an exact resume (absolute optimizer count), milestones built with
    start_epoch=0 decay at the ABSOLUTE milestone step — previously the
    loops rebuilt a schedule from a shifted start_epoch and logged decays
    the optimizer was not applying (or vice versa)."""
    cfg = small_cfg().replace(
        TRAIN={**small_cfg().TRAIN.to_dict(), "MILESTONES": [2],
               "GAMMA": 0.1})
    spe = 10
    state = create_train_state(cfg, network_name="seg_resnet34_8s_embedding",
                               solver="sgd", steps_per_epoch=spe,
                               start_epoch=0, height=16, width=16)
    assert state.schedule is not None
    lr = float(cfg.TRAIN.LEARNING_RATE)
    # decay boundary at absolute step 2*spe
    np.testing.assert_allclose(float(state.schedule(2 * spe - 1)), lr)
    np.testing.assert_allclose(float(state.schedule(2 * spe + 1)), lr * 0.1)
    # reference-style fresh-optimizer continue (--startepoch 1, count 0):
    # milestone shifts to (2-1)*spe, matching the reference's
    # [m - startepoch] arithmetic (tools/train_net.py:142)
    state2 = create_train_state(cfg, network_name="seg_resnet34_8s_embedding",
                                solver="sgd", steps_per_epoch=spe,
                                start_epoch=1, height=16, width=16)
    np.testing.assert_allclose(float(state2.schedule(spe + 1)), lr * 0.1)
