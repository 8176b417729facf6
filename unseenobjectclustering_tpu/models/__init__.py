"""Model factory registry.

Mirrors the reference's ``networks.__dict__[name](num_classes, num_units,
data)`` factory surface (lib/networks/SEG.py:163-186): the same five public
network names build an equivalently-configured SEGNET here.  Checkpoint data
loading is handled separately by utils.checkpoint (the reference threads a
torch state_dict through the factory; we keep construction pure).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from unseenobjectclustering_tpu.config import Config
from unseenobjectclustering_tpu.models.segnet import SEGNET
from unseenobjectclustering_tpu.models.losses import (EmbeddingLossOut,
                                                      embedding_loss)
from unseenobjectclustering_tpu.models.resnet import (ResNetFCN, resnet34_8s,
                                                      resnet50_8s)

__all__ = [
    "SEGNET", "ResNetFCN", "resnet34_8s", "resnet50_8s", "embedding_loss",
    "EmbeddingLossOut", "get_network", "NETWORK_FACTORIES",
]


def _segnet(network_name: str, cfg: Config, num_units: int,
            fusion_override: Optional[str] = None, dtype=None) -> SEGNET:
    dtype = dtype or jnp.float32
    return SEGNET(
        network_name=network_name,
        input_type=cfg.INPUT,
        fusion_type=fusion_override or cfg.TRAIN.FUSION_TYPE,
        num_units=num_units,
        normalize=bool(cfg.TRAIN.EMBEDDING_NORMALIZATION),
        batch_norm=bool(cfg.TRAIN.VGG_BATCH_NORM),
        dtype=dtype,
    )


def seg_resnet34_8s_embedding(cfg: Config, num_units: int = 64, dtype=None) -> SEGNET:
    """SEG.py:173-176 equivalent (3-channel towers)."""
    return _segnet("resnet34_8s", cfg, num_units, dtype=dtype)


def seg_resnet34_8s_embedding_early(cfg: Config, num_units: int = 64, dtype=None) -> SEGNET:
    """SEG.py:178-181 equivalent (6-channel early-fusion tower)."""
    return _segnet("resnet34_8s", cfg, num_units, fusion_override="early",
                   dtype=dtype)


def seg_resnet50_8s_embedding(cfg: Config, num_units: int = 64, dtype=None) -> SEGNET:
    """SEG.py:183-186 equivalent."""
    return _segnet("resnet50_8s", cfg, num_units, dtype=dtype)


def seg_resnet18_8s_embedding(cfg: Config, num_units: int = 64, dtype=None) -> SEGNET:
    """Extension: the reference defines Resnet18_8s
    (resnet_dilated.py:90-107) but never exposes it through a SEG factory.
    Half the layers of resnet34 (2-2-2-2 BasicBlocks) — the natural
    lighter zoom-in (crop) backbone for the fast two-stage mode."""
    return _segnet("resnet18_8s", cfg, num_units, dtype=dtype)


def seg_vgg_embedding(cfg: Config, num_units: int = 64, dtype=None) -> SEGNET:
    """SEG.py:163-166 equivalent."""
    return _segnet("vgg", cfg, num_units, dtype=dtype)


def seg_unet_embedding(cfg: Config, num_units: int = 64, dtype=None) -> SEGNET:
    """SEG.py:168-171 equivalent."""
    return _segnet("unet", cfg, num_units, dtype=dtype)


NETWORK_FACTORIES = {
    "seg_resnet18_8s_embedding": seg_resnet18_8s_embedding,
    "seg_resnet34_8s_embedding": seg_resnet34_8s_embedding,
    "seg_resnet34_8s_embedding_early": seg_resnet34_8s_embedding_early,
    "seg_resnet50_8s_embedding": seg_resnet50_8s_embedding,
    "seg_vgg_embedding": seg_vgg_embedding,
    "seg_unet_embedding": seg_unet_embedding,
}


def get_network(name: str, cfg: Config, num_units: Optional[int] = None,
                dtype=None) -> SEGNET:
    """Build a network by its reference-compatible factory name."""
    if name not in NETWORK_FACTORIES:
        raise KeyError(f"unknown network {name!r}; available: "
                       f"{sorted(NETWORK_FACTORIES)}")
    units = num_units if num_units is not None else int(cfg.TRAIN.NUM_UNITS)
    return NETWORK_FACTORIES[name](cfg, units, dtype=dtype)
