"""Checkpoint IO: PyTorch release-checkpoint conversion + orbax snapshots.

The reference ships `.pth` state_dicts for the full-image and crop networks
(README.md:31-38) saved as either raw state_dicts or {'model': ...} wrappers
(tools/train_net.py:115-117).  `convert_torch_checkpoint` maps them onto this
framework's flax variable tree:

  torch key layout (lib/networks/SEG.py + resnet_dilated.py + resnet.py):
    [module.]fcn.resnet{34,50}_8s.conv1.weight
    [module.]fcn.resnet34_8s.bn1.{weight,bias,running_mean,running_var}
    [module.]fcn.resnet34_8s.layer<L>.<i>.conv<j>.weight
    [module.]fcn.resnet34_8s.layer<L>.<i>.bn<j>.*
    [module.]fcn.resnet34_8s.layer<L>.<i>.downsample.{0,1}.*
    [module.]fcn.resnet34_8s.fc.{weight,bias}
    [module.]fcn_depth.resnet34_8s.*          (fusion add/cat second tower)

  flax layout (models/resnet.py):
    params/fcn/conv1/kernel                  [kh,kw,in,out] (torch: [out,in,kh,kw])
    params/fcn/bn1/{scale,bias}; batch_stats/fcn/bn1/{mean,var}
    params/fcn/layer<L>_<i>/{conv1,conv2,conv3,downsample_conv}/kernel
    params/fcn/layer<L>_<i>/{bn1,bn2,bn3,downsample_bn}/...
    params/fcn/fc/{kernel,bias}

Key-remap leniency matches the reference's update_model (SEG.py:130-159):
'module.' prefixes are stripped, legacy 'decoder.features.' keys are
re-rooted, and mismatched shapes are skipped with a warning rather than
raised.

Orbax helpers snapshot the full TrainState (params + batch_stats + optimizer
state + step) — an improvement over the reference, which drops optimizer
state (SURVEY.md §5).
"""

from __future__ import annotations

import os
import re
import warnings
from typing import Any, Mapping, Optional

import numpy as np


# ---------------------------------------------------------------------------
# torch -> flax conversion
# ---------------------------------------------------------------------------

def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def normalize_torch_keys(state_dict: Mapping[str, Any]) -> dict[str, Any]:
    """Strip DataParallel 'module.' prefixes and re-root legacy
    'decoder.features.' keys (SEG.py:141-152); unwrap {'model': ...}."""
    if "model" in state_dict and isinstance(state_dict["model"], Mapping):
        state_dict = state_dict["model"]
    out = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[7:]
        if "decoder.features." in k:
            k = "decoder." + k.split("decoder.features.", 1)[1]
        out[k] = v
    return out


_TOWER_RE = re.compile(r"^(fcn|fcn_depth)\.resnet\d+_8s\.(.*)$")
_LAYER_RE = re.compile(r"^layer(\d)\.(\d+)\.(.*)$")


def _convert_resnet_param(rest: str, value: np.ndarray
                          ) -> Optional[tuple[str, list[str], np.ndarray]]:
    """Map one tower-relative torch key to (collection, path, array)."""
    m = _LAYER_RE.match(rest)
    if m:
        layer, block, tail = int(m.group(1)), int(m.group(2)), m.group(3)
        prefix = [f"layer{layer}_{block}"]
        tail = tail.replace("downsample.0", "downsample_conv").replace(
            "downsample.1", "downsample_bn")
        parts = tail.split(".")
        mod, leaf = ".".join(parts[:-1]), parts[-1]
        return _convert_module_param(prefix + [mod], leaf, value)
    parts = rest.split(".")
    mod, leaf = ".".join(parts[:-1]), parts[-1]
    return _convert_module_param([mod], leaf, value)


def _convert_module_param(path: list[str], leaf: str, value: np.ndarray
                          ) -> Optional[tuple[str, list[str], np.ndarray]]:
    mod = path[-1]
    is_bn = mod.startswith("bn") or mod.endswith("_bn")
    if is_bn:
        if leaf == "weight":
            return "params", path + ["scale"], value
        if leaf == "bias":
            return "params", path + ["bias"], value
        if leaf == "running_mean":
            return "batch_stats", path + ["mean"], value
        if leaf == "running_var":
            return "batch_stats", path + ["var"], value
        return None  # num_batches_tracked
    # conv / fc
    if leaf == "weight":
        if value.ndim == 4:  # [out,in,kh,kw] -> [kh,kw,in,out]
            return "params", path + ["kernel"], value.transpose(2, 3, 1, 0)
        return "params", path + ["kernel"], value.T
    if leaf == "bias":
        return "params", path + ["bias"], value
    return None


def convert_torch_checkpoint(state_dict: Mapping[str, Any],
                             expected: Optional[Any] = None) -> dict:
    """Convert a reference SEGNET state_dict to flax variables.

    Args:
      state_dict: torch state_dict (tensors or numpy arrays), possibly
        DataParallel-prefixed or {'model': ...}-wrapped.
      expected: optional flax variables (from model.init) to validate
        against — keys present in `expected` but missing from the checkpoint
        raise; shape mismatches are skipped with a warning (the reference's
        lenient partial load, SEG.py:152-159).
    Returns:
      {'params': ..., 'batch_stats': ...} nested dict of numpy arrays.
    """
    state_dict = normalize_torch_keys(state_dict)
    params: dict = {}
    batch_stats: dict = {}
    for key, v in state_dict.items():
        m = _TOWER_RE.match(key)
        if not m:
            continue  # loss buffers / unrelated heads
        tower, rest = m.group(1), m.group(2)
        conv = _convert_resnet_param(rest, _to_numpy(v))
        if conv is None:
            continue
        coll, path, arr = conv
        _set(params if coll == "params" else batch_stats,
             [tower] + path, arr)

    variables = {"params": params, "batch_stats": batch_stats}
    if expected is not None:
        variables = _validate_against(variables, expected)
    return variables


def _validate_against(variables: dict, expected: Any) -> dict:
    """Check converted tree against a model-init tree: every expected leaf
    must exist with the right shape (mismatches keep the init value with a
    warning, matching the reference's name+shape partial load)."""
    import jax

    flat_exp = _flatten(expected)
    flat_got = _flatten(variables)
    out = {}
    missing = []
    for path, exp_leaf in flat_exp.items():
        got = flat_got.get(path)
        if got is None:
            missing.append("/".join(path))
            out[path] = np.asarray(exp_leaf)
        elif tuple(got.shape) != tuple(np.shape(exp_leaf)):
            warnings.warn(
                f"checkpoint shape mismatch at {'/'.join(path)}: "
                f"{got.shape} vs expected {np.shape(exp_leaf)}; keeping init")
            out[path] = np.asarray(exp_leaf)
        else:
            out[path] = got
    if missing:
        raise KeyError(f"checkpoint is missing {len(missing)} expected "
                       f"parameters, e.g. {missing[:5]}")
    extra = set(flat_got) - set(flat_exp)
    if extra:
        warnings.warn(f"checkpoint has {len(extra)} unused converted leaves")
    return _unflatten(out)


def _flatten(tree: Any, prefix: tuple = ()) -> dict[tuple, Any]:
    if isinstance(tree, Mapping):
        out = {}
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
        return out
    return {prefix: tree}


def _unflatten(flat: dict[tuple, Any]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        _set(tree, list(path), v)
    return tree


def convert_imagenet_checkpoint(state_dict: Mapping[str, Any],
                                expected: Any) -> dict:
    """Partial-load a raw torchvision resnet34/50 ImageNet state_dict into
    every backbone tower.

    Replicates the reference's EMBEDDING_PRETRAIN initialization
    (lib/networks/resnet.py:293-317 update_model + resnet_dilated.py:287-299):
    each tower is built with `pretrained=True`, and `update_model` keeps the
    keys that match the model by NAME and SIZE — so the trunk
    (conv1/bn1/layer1..4) loads, the torchvision `fc` (a Linear) never
    matches the 1x1 scoring conv, and with early fusion (6-channel input)
    conv1 is skipped by size too.  Everything not loaded keeps its init
    value from `expected`.

    Args:
      state_dict: raw torchvision resnet state_dict (keys like
        'conv1.weight', 'layer1.0.conv1.weight', 'fc.weight').
      expected: flax variables from model.init — REQUIRED, it supplies the
        tower names and the init values for unloaded leaves.
    Returns:
      {'params': ..., 'batch_stats': ...} with ImageNet trunks in every
      tower.
    """
    state_dict = normalize_torch_keys(state_dict)
    flat_exp = _flatten(expected)
    towers = sorted({path[1] for path in flat_exp
                     if path[0] == "params" and path[1].startswith("fcn")})
    if not towers:
        raise KeyError("expected variables contain no backbone towers")

    out = {path: np.asarray(leaf) for path, leaf in flat_exp.items()}
    loaded, skipped = 0, []
    for key, v in state_dict.items():
        conv = _convert_resnet_param(key, _to_numpy(v))
        if conv is None:
            continue
        coll, path, arr = conv
        for tower in towers:
            full = (coll, tower) + tuple(path)
            exp_leaf = flat_exp.get(full)
            if exp_leaf is None:
                skipped.append("/".join(full))
                continue
            if tuple(np.shape(exp_leaf)) != tuple(arr.shape):
                # name+size partial load: early-fusion conv1 / fc head
                skipped.append("/".join(full))
                continue
            out[full] = arr
            loaded += 1
    if loaded == 0:
        raise KeyError("no ImageNet parameters matched the model "
                       f"(first skips: {skipped[:5]})")
    return _unflatten(out)


def export_torch_state_dict(variables: Mapping[str, Any],
                            arch: str = "resnet34_8s") -> dict[str, Any]:
    """Export flax variables to a reference-layout torch state_dict
    (the exact inverse of convert_torch_checkpoint): keys like
    `fcn.resnet34_8s.layer2.1.conv1.weight`, kernels transposed back to
    [out, in, kh, kw], BN stats to running_mean/running_var.

    Lets models trained in this framework be consumed by the reference
    ecosystem (torch .pth checkpoints, lib/networks/SEG.py update_model) and
    powers the trained-weight cross-stack parity oracle
    (tools/parity_oracle.py).  Values are numpy arrays — call
    torch.tensor() downstream if needed.
    """
    out: dict[str, Any] = {}
    for path, leaf in _flatten(variables).items():
        coll, tower, rest = path[0], path[1], list(path[2:])
        arr = np.asarray(leaf)
        m = re.match(r"^layer(\d)_(\d+)$", rest[0]) if rest else None
        if m:
            mod = f"layer{m.group(1)}.{m.group(2)}"
            rest = rest[1:]
        else:
            mod = ""
        sub = rest[:-1]
        leaf_name = rest[-1]
        sub = [s.replace("downsample_conv", "downsample.0")
               .replace("downsample_bn", "downsample.1") for s in sub]
        prefix = ".".join(p for p in ([tower, arch, mod] + sub) if p)
        if coll == "batch_stats":
            name = {"mean": "running_mean", "var": "running_var"}[leaf_name]
            out[f"{prefix}.{name}"] = arr
        elif leaf_name == "scale":
            out[f"{prefix}.weight"] = arr
        elif leaf_name == "kernel":
            if arr.ndim == 4:  # [kh,kw,in,out] -> [out,in,kh,kw]
                out[f"{prefix}.weight"] = arr.transpose(3, 2, 0, 1)
            else:
                out[f"{prefix}.weight"] = arr.T
        else:  # bias
            out[f"{prefix}.{leaf_name}"] = arr
    return out


def _looks_like_torchvision(state_dict: Mapping[str, Any]) -> bool:
    """Raw torchvision resnet dicts have a bare trunk and no tower prefix."""
    keys = set(state_dict)
    return ("conv1.weight" in keys
            and not any(_TOWER_RE.match(k) for k in keys))


def load_torch_checkpoint(path: str | os.PathLike,
                          expected: Optional[Any] = None) -> dict:
    """Load a `.pth` checkpoint and convert it (torch CPU).

    Accepts both reference SEGNET release checkpoints and raw torchvision
    ImageNet resnet34/50 state_dicts (auto-detected; the latter requires
    `expected` and performs the EMBEDDING_PRETRAIN partial load)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "model" in data and isinstance(
            data["model"], dict):
        data = data["model"]  # tools/train_net.py:115-117
    normalized = normalize_torch_keys(data)
    if _looks_like_torchvision(normalized):
        if expected is None:
            raise ValueError("ImageNet checkpoints need `expected` variables")
        return convert_imagenet_checkpoint(normalized, expected)
    return convert_torch_checkpoint(data, expected)


# ---------------------------------------------------------------------------
# orbax snapshots (native checkpointing)
# ---------------------------------------------------------------------------

def save_checkpoint(directory: str | os.PathLike, step: int, state: Any,
                    keep: int = 16) -> str:
    """Snapshot a TrainState pytree with orbax.

    Unlike the reference's per-epoch torch.save of bare weights
    (tools/train_net.py:153-160), this persists optimizer state and
    batch stats, so --startepoch resume is exact.
    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    with ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep)) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(_arrays_only(state)))
        mgr.wait_until_finished()
    return os.path.join(directory, str(step))


def resolve_step_dir(directory: str | os.PathLike) -> tuple[str, Optional[int]]:
    """Split an epoch-addressed step dir ``mgr_dir/N`` into (mgr_dir, N).

    A digit-named directory is reinterpreted as a step reference into its
    parent only when it actually IS an orbax step dir (it carries the
    ``_CHECKPOINT_METADATA`` marker orbax writes on commit).  Both a run
    the user named e.g. "16" that holds digit step dirs and an EMPTY
    digit-named manager dir (a run with no snapshots yet) stay manager
    dirs, so the latter fails with "no checkpoints under .../16" instead
    of a confusing "step 16 not found" in the parent.  Shared by
    restore_checkpoint and engine/builder.load_network_variables.
    """
    directory = os.path.abspath(os.fspath(directory))
    base = os.path.basename(os.path.normpath(directory))
    if (base.isdigit() and os.path.isdir(directory)
            and os.path.exists(
                os.path.join(directory, "_CHECKPOINT_METADATA"))):
        return os.path.dirname(os.path.normpath(directory)), int(base)
    return directory, None


def restore_checkpoint(directory: str | os.PathLike,
                       step: Optional[int] = None,
                       target: Optional[Any] = None) -> Any:
    """Restore the latest (or given) step; `target` provides the tree
    structure/shardings (a template TrainState).

    `directory` may also be an epoch-addressed step dir `mgr_dir/N` (the
    form save_checkpoint returns and load_network_variables accepts) —
    equivalent to (mgr_dir, step=N).
    """
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    if step is None:
        directory, step = resolve_step_dir(directory)
    with ocp.CheckpointManager(directory) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
        if target is not None:
            restored = mgr.restore(
                step,
                args=ocp.args.StandardRestore(_arrays_only(target)))
        else:
            restored = mgr.restore(step)
    return restored, step


def _arrays_only(state: Any) -> Any:
    """Project a TrainState-like object to its checkpointable pytree."""
    if hasattr(state, "params"):
        return {"step": state.step, "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state}
    return state
