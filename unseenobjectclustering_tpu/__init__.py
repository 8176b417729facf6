"""unseenobjectclustering_tpu — a TPU-native (JAX/XLA/Pallas) framework for
unseen-object instance segmentation, with capability parity to
NVlabs/UnseenObjectClustering ("Learning RGB-D Feature Embeddings for Unseen
Object Instance Segmentation", CoRL 2020).

Subpackages:
  config    — frozen config objects, YAML-compatible with the reference cfgs
  models    — SEGNET embedding networks (dilated-ResNet FCN / UNet / VGG)
  ops       — jitted compute: preprocessing, mean-shift clustering (Pallas),
              RoI cropping, resizes
  engine    — inference pipeline (two-stage), training step, evaluation
  data      — TOD / OCID / OSD dataset loaders, augmentation, PCD reader
  parallel  — device-mesh construction and sharding for pjit data-parallel
  utils     — metrics, checkpoint IO + torch converter, visualization, masks
"""

__version__ = "0.1.0"

from unseenobjectclustering_tpu.config import Config

__all__ = ["Config", "__version__"]
