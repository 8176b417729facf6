#!/bin/bash
# Train the color full-image embedding network on TOD (16 epochs).
set -ex
python tools/train_net.py \
  --network seg_resnet34_8s_embedding \
  --dataset tabletop_object_train \
  --cfg experiments/cfgs/seg_resnet34_8s_embedding_cosine_color_tabletop.yml \
  --solver adam \
  --epochs 16
