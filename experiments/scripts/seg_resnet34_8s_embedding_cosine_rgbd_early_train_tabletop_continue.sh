#!/bin/bash
# Resume rgbd_early training from an epoch snapshot ($1 = checkpoint, $2 = start epoch).
set -ex
python tools/train_net.py \
  --network seg_resnet34_8s_embedding_early \
  --dataset tabletop_object_train \
  --cfg experiments/cfgs/seg_resnet34_8s_embedding_cosine_rgbd_early_tabletop.yml \
  --solver adam \
  --epochs 16 \
  --pretrained "$1" \
  --startepoch "$2"
