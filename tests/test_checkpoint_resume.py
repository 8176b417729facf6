"""Exact-resume: snapshot mid-training, restore, and continue — parameters
must match an uninterrupted run bit-for-bit (optimizer state included;
the reference can only restart from bare weights, SURVEY.md §5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.engine.train import (create_train_state,
                                                     make_train_step)
from unseenobjectclustering_tpu.utils.checkpoint import (restore_checkpoint,
                                                         save_checkpoint)


def small_cfg():
    return Config.from_dict({
        "INPUT": "RGBD",
        "TRAIN": {"NUM_UNITS": 4, "LEARNING_RATE": 1e-3,
                  "WEIGHT_DECAY": 1e-4},
    })


def _batch(seed, b=1, h=16, w=16):
    rng = np.random.RandomState(seed)
    return (rng.rand(b, h, w, 3).astype(np.float32),
            rng.rand(b, h, w, 3).astype(np.float32),
            rng.randint(0, 3, size=(b, h, w)).astype(np.int32))


def test_exact_resume(tmp_path):
    cfg = small_cfg()
    step = make_train_step(cfg, max_k=8)

    # uninterrupted: 4 steps
    state = create_train_state(cfg, network_name="seg_resnet34_8s_embedding",
                               height=16, width=16)
    for i in range(4):
        state, _ = step(state, *_batch(i))
    want = jax.tree_util.tree_leaves(state.params)

    # interrupted: 2 steps, snapshot, restore into a FRESH state, 2 more
    state2 = create_train_state(cfg, network_name="seg_resnet34_8s_embedding",
                                height=16, width=16)
    for i in range(2):
        state2, _ = step(state2, *_batch(i))
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, 1, state2)

    fresh = create_train_state(cfg, network_name="seg_resnet34_8s_embedding",
                               height=16, width=16, seed=99)  # different init
    restored, ck = restore_checkpoint(
        ckpt_dir, target={"step": fresh.step, "params": fresh.params,
                          "batch_stats": fresh.batch_stats,
                          "opt_state": fresh.opt_state})
    assert ck == 1
    state3 = fresh.replace(step=restored["step"], params=restored["params"],
                           batch_stats=restored["batch_stats"],
                           opt_state=restored["opt_state"])
    for i in range(2, 4):
        state3, _ = step(state3, *_batch(i))

    got = jax.tree_util.tree_leaves(state3.params)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state3.step) == 4


def test_epoch_addressable_checkpoint(tmp_path):
    """load_network_variables('dir/N') restores epoch N, not latest."""
    from unseenobjectclustering_tpu.engine.builder import (
        load_network_variables)

    cfg = small_cfg()
    step = make_train_step(cfg, max_k=8)
    state = create_train_state(cfg, network_name="seg_resnet34_8s_embedding",
                               height=16, width=16)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, 1, state)
    # materialize: the train step donates the state, deleting these buffers
    params_e1 = [np.asarray(x)
                 for x in jax.tree_util.tree_leaves(state.params)]
    state, _ = step(state, *_batch(0))
    save_checkpoint(ckpt_dir, 2, state)

    v1 = load_network_variables(cfg, "seg_resnet34_8s_embedding",
                                f"{ckpt_dir}/1", 16, 16)
    for a, b in zip(jax.tree_util.tree_leaves(v1["params"]), params_e1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # bare dir restores latest (epoch 2 != epoch 1 after a step)
    v2 = load_network_variables(cfg, "seg_resnet34_8s_embedding",
                                ckpt_dir, 16, 16)
    same = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(v2["params"]), params_e1))
    assert not same


def test_restore_checkpoint_epoch_addressed_dir(tmp_path):
    """restore_checkpoint('mgr_dir/N') == restore_checkpoint(mgr_dir, N) —
    the form tools/train_net.py --resume receives when a user points at a
    snapshot path printed by training."""
    from unseenobjectclustering_tpu.utils.checkpoint import (
        restore_checkpoint, save_checkpoint)

    cfg = small_cfg()
    step = make_train_step(cfg, max_k=8)
    state = create_train_state(cfg, network_name="seg_resnet34_8s_embedding",
                               height=16, width=16)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, 1, state)
    params_e1 = [np.asarray(x)
                 for x in jax.tree_util.tree_leaves(state.params)]
    state, _ = step(state, *_batch(0))
    save_checkpoint(ckpt_dir, 2, state)

    restored, got_step = restore_checkpoint(f"{ckpt_dir}/1")
    assert got_step == 1
    for a, b in zip(jax.tree_util.tree_leaves(restored["params"]),
                    params_e1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    _, latest = restore_checkpoint(ckpt_dir)
    assert latest == 2

def test_restore_empty_digit_named_run_dir(tmp_path):
    """A run dir the user NAMED '16' with no snapshots yet must fail with
    'no checkpoints under .../16', not be reinterpreted as step 16 of the
    parent (ADVICE r2: digit-dir heuristic needs the orbax step marker)."""
    import pytest

    from unseenobjectclustering_tpu.utils.checkpoint import (
        restore_checkpoint, resolve_step_dir, save_checkpoint)

    run = tmp_path / "16"
    run.mkdir()
    mgr_dir, step = resolve_step_dir(str(run))
    assert step is None and mgr_dir == str(run)
    with pytest.raises(FileNotFoundError, match="no checkpoints"):
        restore_checkpoint(str(run))

    # ... and a REAL step dir (carries _CHECKPOINT_METADATA) still resolves
    cfg = small_cfg()
    state = create_train_state(cfg, network_name="seg_resnet34_8s_embedding",
                               height=16, width=16)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, 16, state)
    mgr_dir, step = resolve_step_dir(f"{ckpt_dir}/16")
    assert step == 16 and mgr_dir == ckpt_dir
