"""Training engine: optimizer construction, train state, DP train step.

Capability parity with the reference recipe (tools/train_net.py:130-160,
lib/fcn/train.py:37-76):

  * Adam(lr, betas=(MOMENTUM, BETA)) or SGD(momentum) with L2 weight decay
    added to the gradient (torch semantics — both reference param groups use
    the same WEIGHT_DECAY, tools/train_net.py:133-134).
  * MultiStepLR for the SGD path: lr * GAMMA^(#milestones passed), stepped per
    epoch (tools/train_net.py:142).
  * the loss is models.losses.embedding_loss on the embedding features
    (the reference computes it inside the module only as a DataParallel
    artifact, SEG.py:115-117).

TPU-native departures (SURVEY.md §2.6):
  * data parallelism is a 1-D jax Mesh with the batch axis sharded via
    NamedSharding; jax.jit compiles the gradient all-reduce over ICI —
    replacing torch.nn.DataParallel.
  * BatchNorm statistics are updated per-step with a cross-replica
    axis-mean compiled by XLA (flax mutable batch_stats).
  * optimizer state is checkpointed (the reference drops it,
    SURVEY.md §5) via utils.checkpoint / orbax.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.models import get_network
from unseenobjectclustering_tpu.models.losses import embedding_loss


@flax.struct.dataclass
class TrainState:
    step: jax.Array                  # int32 global step
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    # the lr schedule baked into tx, kept so the train loops log the lr the
    # optimizer actually applies (rebuilding it from possibly-different
    # start_epoch/steps_per_epoch arguments caused logged != applied drift)
    schedule: Optional[Callable] = flax.struct.field(pytree_node=False,
                                                     default=None)


def multistep_schedule(base_lr: float, milestones: Sequence[int], gamma: float,
                       steps_per_epoch: int, start_epoch: int = 0
                       ) -> optax.Schedule:
    """MultiStepLR: lr * gamma^(#epoch-milestones passed).

    Milestones are epoch indices relative to start_epoch, matching the
    reference's resume arithmetic (tools/train_net.py:142:
    ``milestones=[m - startepoch for m in MILESTONES]``).
    """
    boundaries = {}
    for m in milestones:
        rel = (m - start_epoch) * steps_per_epoch
        if rel > 0:
            boundaries[rel] = gamma
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(cfg: Config, solver: str = "adam",
                   steps_per_epoch: int = 1, start_epoch: int = 0
                   ) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """Build the reference-equivalent optimizer (tools/train_net.py:135-142).

    Returns (transformation, lr_schedule) — the schedule is also returned
    standalone so the train loop can log the current lr like the reference
    does (lib/fcn/train.py:74).
    """
    if solver not in ("adam", "sgd"):
        raise ValueError(f"solver must be adam|sgd, got {solver!r}")
    lr = float(cfg.TRAIN.LEARNING_RATE)
    wd = float(cfg.TRAIN.WEIGHT_DECAY)
    if solver == "adam":
        schedule = optax.constant_schedule(lr)
        tx = optax.chain(
            optax.add_decayed_weights(wd),   # torch Adam: wd into the grad
            optax.scale_by_adam(b1=float(cfg.TRAIN.MOMENTUM),
                                b2=float(cfg.TRAIN.BETA)),
            optax.scale_by_learning_rate(schedule),
        )
    else:
        schedule = multistep_schedule(
            lr, cfg.TRAIN.MILESTONES, float(cfg.TRAIN.GAMMA),
            steps_per_epoch, start_epoch)
        tx = optax.chain(
            optax.add_decayed_weights(wd),
            optax.trace(decay=float(cfg.TRAIN.MOMENTUM)),
            optax.scale_by_learning_rate(schedule),
        )
    return tx, schedule


def create_train_state(cfg: Config, *, network_name: str,
                       solver: str = "adam", steps_per_epoch: int = 1,
                       start_epoch: int = 0, height: int = 480,
                       width: int = 640, seed: int = 3,
                       variables: Optional[Any] = None,
                       model_dtype: Any = None) -> TrainState:
    """Initialize (or adopt pretrained) variables and wrap them in a state.

    model_dtype=jnp.bfloat16 runs the conv stack in bf16 (params, optimizer
    state, loss, and the final normalize stay float32 — mixed precision).
    """
    model = get_network(network_name, cfg, dtype=model_dtype)
    if variables is None:
        key = jax.random.PRNGKey(seed)
        img = (jnp.zeros((1, height, width, 3), jnp.float32)
               if cfg.INPUT != "DEPTH" else None)
        xyz = (jnp.zeros((1, height, width, 3), jnp.float32)
               if cfg.INPUT != "COLOR" else None)
        variables = model.init(key, img, xyz, train=False)
    tx, schedule = make_optimizer(cfg, solver, steps_per_epoch, start_epoch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params),
                      tx=tx, apply_fn=model.apply, schedule=schedule)


def loss_fn(params, batch_stats, apply_fn, img, xyz, label, *,
            alpha: float, delta: float, lambda_intra: float,
            lambda_inter: float, max_k: int, metric: str, rng=None):
    """Forward + embedding loss; returns (loss, (aux, new_batch_stats)).

    rng drives stochastic layers in train mode (the VGG decoder's
    Dropout(0.2), reference lib/networks/unets.py:124); ResNet/U-Net
    backbones have none and ignore it.
    """
    variables = {"params": params, "batch_stats": batch_stats}
    features, mutated = apply_fn(variables, img, xyz, train=True,
                                 mutable=["batch_stats"],
                                 rngs=(None if rng is None
                                       else {"dropout": rng}))
    out = embedding_loss(features, label, alpha=alpha, delta=delta,
                         lambda_intra=lambda_intra,
                         lambda_inter=lambda_inter, max_k=max_k,
                         metric=metric)
    return out.loss, (out, mutated["batch_stats"])


def _train_step_body(state: TrainState, img, xyz, label, *, alpha: float,
                     delta: float, lambda_intra: float, lambda_inter: float,
                     max_k: int, metric: str, rng=None):
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (loss, (out, new_bs)), grads = grad_fn(
        state.params, state.batch_stats, state.apply_fn, img, xyz, label,
        alpha=alpha, delta=delta, lambda_intra=lambda_intra,
        lambda_inter=lambda_inter, max_k=max_k, metric=metric, rng=rng)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_bs, opt_state=new_opt)
    metrics = {"loss": loss, "intra": out.intra, "inter": out.inter}
    return new_state, metrics


@functools.partial(jax.jit, static_argnames=("max_k", "metric"),
                   donate_argnums=(0,))
def train_step(state: TrainState, img, xyz, label, rng=None, *,
               alpha: float, delta: float, lambda_intra: float,
               lambda_inter: float, max_k: int = 32,
               metric: str = "cosine"):
    """One optimization step.

    When the batch arrays carry a NamedSharding over a 'data' mesh axis and
    the state is replicated, XLA turns the implicit gradient mean into an
    ICI all-reduce — the TPU-native DataParallel (SURVEY.md §2.6).

    Returns (new_state, metrics dict of scalars).
    """
    return _train_step_body(state, img, xyz, label, alpha=alpha, delta=delta,
                            lambda_intra=lambda_intra,
                            lambda_inter=lambda_inter, max_k=max_k,
                            metric=metric, rng=rng)


def train_epochs(cfg: Config, state: TrainState, dataloader, *,
                 epochs: int, start_epoch: int = 0,
                 solver: str = "adam", output_dir: Optional[str] = None,
                 mesh=None, max_k: int = 32, log_every: int = 20,
                 snapshot_epochs: Optional[int] = None,
                 intrinsics: Optional[tuple] = None,
                 seed: int = 3, keep: int = 4) -> TrainState:
    """Epoch loop with per-iteration logging and orbax snapshots.

    Mirrors tools/train_net.py:146-160 + lib/fcn/train.py:37-76: per-iter
    loss/intra/inter/lr line, snapshot every SNAPSHOT_EPOCHS.  Data
    parallelism: pass a Mesh and the batch is sharded over it (state must
    already be replicated).

    Batches may be pre-augmented sample dicts ('image_color'/'depth'/'label')
    or RAW scene dicts ('bgr'/'depth_mm'/'label_raw', see dataset raw mode) —
    raw batches run the fused on-device augmentation step
    (make_train_step_raw; requires `intrinsics` (fx, fy, px, py)).
    """
    import time as _time

    from unseenobjectclustering_tpu.parallel import shard_batch

    step_fn = make_train_step(cfg, max_k=max_k)
    step_fn_raw = None
    # log the lr the optimizer actually applies (state.schedule is evaluated
    # at the absolute state.step, same as optax does inside tx)
    schedule = state.schedule or make_optimizer(
        cfg, solver, max(len(dataloader), 1), start_epoch)[1]
    snapshot_epochs = snapshot_epochs or int(cfg.TRAIN.SNAPSHOT_EPOCHS)

    for epoch in range(start_epoch, epochs):
        if hasattr(dataloader, "set_epoch"):
            # keep data order + augmentation on the ABSOLUTE epoch so a
            # resumed run doesn't replay epoch-0 shuffles/draws
            dataloader.set_epoch(epoch)
        epoch_size = len(dataloader)
        t_last = _time.time()
        for i, batch in enumerate(dataloader):
            if "bgr" in batch:
                if step_fn_raw is None:
                    assert intrinsics is not None, (
                        "raw batches need intrinsics=(fx, fy, px, py)")
                    fx, fy, px, py = intrinsics
                    step_fn_raw = make_train_step_raw(
                        cfg, fx=fx, fy=fy, px=px, py=py, max_k=max_k)
                bgr, depth_mm, label = (batch["bgr"], batch["depth_mm"],
                                        batch["label_raw"])
                if mesh is not None:
                    bgr, depth_mm, label = shard_batch(
                        (bgr, depth_mm, label), mesh)
                # fresh augmentation stream per (seed, epoch, step)
                key = jax.random.PRNGKey(
                    (seed * 1_000_003 + epoch * 97_003 + i) % (2 ** 31 - 1))
                state, metrics = step_fn_raw(state, bgr, depth_mm, label,
                                             key)
            else:
                img = batch.get("image_color")
                xyz = batch.get("depth")
                label = batch["label"]
                if mesh is not None:
                    img, xyz, label = shard_batch((img, xyz, label), mesh)
                # dropout stream for stochastic decoders (VGG); same
                # (seed, epoch, step) determinism as the raw-path key
                rng = jax.random.PRNGKey(
                    (seed * 1_000_003 + epoch * 97_003 + i) % (2 ** 31 - 1))
                state, metrics = step_fn(state, img, xyz, label, rng)
            if i % log_every == 0:
                loss = float(metrics["loss"])
                lr = float(schedule(int(state.step)))
                dt = _time.time() - t_last
                t_last = _time.time()
                print("[%d/%d][%d/%d], loss %.4f, loss intra: %.4f, "
                      "loss_inter %.4f, lr %.6f, time %.2f"
                      % (epoch, epochs, i, epoch_size, loss,
                         float(metrics["intra"]), float(metrics["inter"]),
                         lr, dt))
        if output_dir and ((epoch + 1) % snapshot_epochs == 0
                           or epoch == epochs - 1):
            from unseenobjectclustering_tpu.utils.checkpoint import (
                save_checkpoint)
            # keep=4 by default: ~0.5 GB/snapshot at flagship size — the
            # disk budget (CLAUDE.md) allows hoarding only for the flagship
            path = save_checkpoint(output_dir, epoch + 1, state, keep=keep)
            print(f"snapshot: {path}")
    return state


def make_train_step(cfg: Config, max_k: int = 32):
    """Bind the config's loss hyperparameters into a step function."""
    kw = dict(alpha=float(cfg.TRAIN.EMBEDDING_ALPHA),
              delta=float(cfg.TRAIN.EMBEDDING_DELTA),
              lambda_intra=float(cfg.TRAIN.EMBEDDING_LAMBDA_INTRA),
              lambda_inter=float(cfg.TRAIN.EMBEDDING_LAMBDA_INTER),
              max_k=max_k, metric=str(cfg.TRAIN.EMBEDDING_METRIC))

    def step(state, img, xyz, label, rng=None):
        return train_step(state, img, xyz, label, rng, **kw)

    return step


def make_train_step_resident(cfg: Config, *, fx: float, fy: float,
                             px: float, py: float, max_k: int = 32,
                             crop: bool = False):
    """Fused gather + augmentation + optimization step for a DEVICE-RESIDENT
    dataset (data.resident.load_resident_scenes).

    step(state, bgr_all [N,H,W,3] u8, depth_all [N,H,W] u16,
         label_all [N,H,W] u8, idx [B] i32, key) -> (new_state, metrics)

    The scene tensors live in HBM for the whole run; each step's host->device
    traffic is just `idx` + `key` (~100 B), versus ~16.5 MB/step for host
    streaming — which both leaks host RSS through the experimental tunnel
    client and pays its ~85 ms dispatch latency.  Given identical gathered
    batches and keys this is bit-identical to make_train_step_raw (tested).

    crop=True runs the object-centric crop-training augmentation
    (cfg.TRAIN.SYN_CROP; ops.train_pipeline.make_device_augment_crop) —
    the zoom-in network's recipe — instead of the full-image stack.
    """
    from unseenobjectclustering_tpu.ops.train_pipeline import (
        make_device_augment, make_device_augment_crop)

    # the resident step IS the raw step behind an index gather — one body,
    # so the tested raw<->resident bit-identity can't silently drift
    inner = make_train_step_raw(cfg, fx=fx, fy=fy, px=px, py=py,
                                max_k=max_k, crop=crop, _jit=False)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, bgr_all, depth_all, label_all, idx, key):
        bgr = jnp.take(bgr_all, idx, axis=0)
        depth_mm = jnp.take(depth_all, idx, axis=0)
        label_u8 = jnp.take(label_all, idx, axis=0)
        return inner(state, bgr, depth_mm, label_u8, key)

    return step


def train_epochs_resident(cfg: Config, state: TrainState, scenes, *,
                          epochs: int, batch_size: int, start_epoch: int = 0,
                          solver: str = "adam",
                          output_dir: Optional[str] = None, mesh=None,
                          max_k: int = 32, log_every: int = 20,
                          snapshot_epochs: Optional[int] = None,
                          intrinsics: tuple = None,
                          seed: int = 3, crop: bool = False,
                          keep: int = 4) -> TrainState:
    """Epoch loop over a device-resident dataset.

    Scene order and augmentation streams match train_epochs + DataLoader
    exactly: indices are shuffled with RandomState(seed + epoch) and the
    per-step key is PRNGKey(f(seed, epoch, i)) — so a streaming run can be
    resumed resident (and vice versa) without a data-order discontinuity.
    """
    import time as _time

    from unseenobjectclustering_tpu.parallel import shard_batch

    bgr_all, depth_all, label_all = scenes
    n = int(bgr_all.shape[0])
    steps = n // batch_size
    assert steps > 0, (
        f"{n} resident scenes < batch size {batch_size}: every epoch would "
        "run zero steps (while still writing unchanged snapshots); lower "
        "--batch_size or raise --resident-limit")
    assert intrinsics is not None, (
        "train_epochs_resident needs intrinsics=(fx, fy, px, py) for the "
        "on-device depth backprojection")
    fx, fy, px, py = intrinsics
    step_fn = make_train_step_resident(cfg, fx=fx, fy=fy, px=px, py=py,
                                       max_k=max_k, crop=crop)
    schedule = state.schedule or make_optimizer(
        cfg, solver, max(steps, 1), start_epoch)[1]
    snapshot_epochs = snapshot_epochs or int(cfg.TRAIN.SNAPSHOT_EPOCHS)

    for epoch in range(start_epoch, epochs):
        order = np.arange(n)
        np.random.RandomState(seed + epoch).shuffle(order)
        t_last = _time.time()
        for i in range(steps):
            idx = order[i * batch_size:(i + 1) * batch_size].astype(np.int32)
            if mesh is not None:
                idx = shard_batch(idx, mesh)
            key = jax.random.PRNGKey(
                (seed * 1_000_003 + epoch * 97_003 + i) % (2 ** 31 - 1))
            state, metrics = step_fn(state, bgr_all, depth_all, label_all,
                                     idx, key)
            if i % log_every == 0:
                loss = float(metrics["loss"])   # host fetch = device sync
                lr = float(schedule(int(state.step)))
                dt = _time.time() - t_last
                t_last = _time.time()
                print("[%d/%d][%d/%d], loss %.4f, loss intra: %.4f, "
                      "loss_inter %.4f, lr %.6f, time %.2f"
                      % (epoch, epochs, i, steps, loss,
                         float(metrics["intra"]), float(metrics["inter"]),
                         lr, dt), flush=True)
        if output_dir and ((epoch + 1) % snapshot_epochs == 0
                           or epoch == epochs - 1):
            from unseenobjectclustering_tpu.utils.checkpoint import (
                save_checkpoint)
            path = save_checkpoint(output_dir, epoch + 1, state, keep=keep)
            print(f"snapshot: {path}", flush=True)
    return state


def make_train_step_raw(cfg: Config, *, fx: float, fy: float, px: float,
                        py: float, max_k: int = 32, crop: bool = False,
                        _jit: bool = True):
    """Fused augmentation + optimization step for RAW scene batches.

    The loader emits cached uint8/uint16 scenes untouched (the 1-core host
    does no augmentation work); the returned step runs the whole
    ops.train_pipeline augmentation stack AND the forward/backward/update in
    ONE XLA program — one dispatch per step matters here because per-call
    dispatch through the axon tunnel costs ~85 ms.

    step(state, bgr_u8 [B,H,W,3], depth_mm_u16 [B,H,W], label_u8 [B,H,W],
         key) -> (new_state, metrics)
    """
    from unseenobjectclustering_tpu.ops.train_pipeline import (
        make_device_augment, make_device_augment_crop)

    build = make_device_augment_crop if crop else make_device_augment
    augment = build(cfg, fx=fx, fy=fy, px=px, py=py)
    kw = dict(alpha=float(cfg.TRAIN.EMBEDDING_ALPHA),
              delta=float(cfg.TRAIN.EMBEDDING_DELTA),
              lambda_intra=float(cfg.TRAIN.EMBEDDING_LAMBDA_INTRA),
              lambda_inter=float(cfg.TRAIN.EMBEDDING_LAMBDA_INTER),
              max_k=max_k, metric=str(cfg.TRAIN.EMBEDDING_METRIC))

    def step(state, bgr, depth_mm, label_u8, key):
        img, xyz, label = augment(bgr, depth_mm, label_u8, key)
        # fold_in (not split) keeps the augmentation stream bit-identical
        # to runs that predate the dropout rng
        return _train_step_body(state, img, xyz, label,
                                rng=jax.random.fold_in(key, 1), **kw)

    if _jit:
        return functools.partial(jax.jit, donate_argnums=(0,))(step)
    return step
