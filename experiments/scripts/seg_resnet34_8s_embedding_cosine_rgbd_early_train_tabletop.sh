#!/bin/bash
# Train the rgbd_early full-image embedding network on TOD (16 epochs).
set -ex
python tools/train_net.py \
  --network seg_resnet34_8s_embedding_early \
  --dataset tabletop_object_train \
  --cfg experiments/cfgs/seg_resnet34_8s_embedding_cosine_rgbd_early_tabletop.yml \
  --solver adam \
  --epochs 16
