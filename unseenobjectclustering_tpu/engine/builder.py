"""High-level constructors wiring config + networks + checkpoints together.

This is the layer the CLI tools (tools/*.py) and serving wrappers call —
equivalent to the model-preparation blocks of the reference's entry points
(tools/test_net.py:109-128, tools/test_images.py:189-209).
"""

from __future__ import annotations

import os
import sys
from typing import Any, Optional

import jax
import jax.numpy as jnp

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.engine.pipeline import Segmentor
from unseenobjectclustering_tpu.models import get_network


def init_variables(cfg: Config, network_name: str, height: int = 480,
                   width: int = 640, num_units: Optional[int] = None,
                   seed: int = 3, dtype=None) -> Any:
    """Deterministically initialize a network's flax variables."""
    model = get_network(network_name, cfg, num_units=num_units, dtype=dtype)
    img = (jnp.zeros((1, height, width, 3), jnp.float32)
           if cfg.INPUT != "DEPTH" else None)
    xyz = (jnp.zeros((1, height, width, 3), jnp.float32)
           if cfg.INPUT != "COLOR" else None)
    return model.init(jax.random.PRNGKey(seed), img, xyz, train=False)


def load_network_variables(cfg: Config, network_name: str,
                           pretrained: Optional[str], height: int = 480,
                           width: int = 640,
                           num_units: Optional[int] = None) -> Any:
    """Init variables and overlay a checkpoint if given.

    `pretrained` may be a reference `.pth` file (torch; converted on the
    fly) or an orbax checkpoint directory produced by engine.train.
    """
    variables = init_variables(cfg, network_name, height, width, num_units)
    if not pretrained:
        return variables
    if os.path.isdir(pretrained):
        from unseenobjectclustering_tpu.utils.checkpoint import (
            restore_checkpoint, resolve_step_dir)
        # `dir/12` selects epoch 12 from the manager dir `dir` (only when
        # `12` carries orbax's step marker); a bare manager dir restores
        # its latest snapshot
        mgr_dir, step = resolve_step_dir(pretrained)
        restored, step = restore_checkpoint(mgr_dir, step=step)
        print(f"=> restored orbax checkpoint step {step} from {pretrained}",
              file=sys.stderr)
        return {"params": restored["params"],
                "batch_stats": restored["batch_stats"]}
    from unseenobjectclustering_tpu.utils.checkpoint import (
        load_torch_checkpoint)
    variables = load_torch_checkpoint(pretrained, expected=variables)
    print(f"=> converted torch checkpoint {pretrained}", file=sys.stderr)
    return variables


def build_segmentor(cfg: Config, network_name: str,
                    pretrained: Optional[str] = None,
                    pretrained_crop: Optional[str] = None,
                    height: int = 480, width: int = 640,
                    depth_threshold: Optional[float] = 0.8,
                    model_dtype=None,
                    crop_network_name: Optional[str] = None) -> Segmentor:
    """Build the two-stage Segmentor from checkpoint paths (the reference's
    main+crop network pair, tools/test_net.py:109-128).

    crop_network_name lets the zoom-in stage use a lighter backbone than
    the main stage (e.g. seg_resnet18_8s_embedding); the reference always
    reuses the main factory for both.
    """
    variables = load_network_variables(cfg, network_name, pretrained,
                                       height, width)
    variables_crop = None
    if pretrained_crop:
        s = int(cfg.TRAIN.SYN_CROP_SIZE)
        variables_crop = load_network_variables(
            cfg, crop_network_name or network_name, pretrained_crop, s, s)
    return Segmentor(cfg, variables, variables_crop=variables_crop,
                     network_name=network_name,
                     crop_network_name=crop_network_name,
                     depth_threshold=depth_threshold,
                     model_dtype=model_dtype)
