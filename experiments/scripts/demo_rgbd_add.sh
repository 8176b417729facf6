#!/bin/bash
# Demo: segment data/demo with the flagship RGBD-add networks
# ($1 = checkpoint, $2 = optional crop checkpoint).
set -ex
python tools/test_images.py \
  --network seg_resnet34_8s_embedding \
  --cfg experiments/cfgs/seg_resnet34_8s_embedding_cosine_rgbd_add_tabletop.yml \
  --imgdir data/demo \
  --pretrained "$1" \
  ${2:+--pretrained_crop "$2"} \
  --vis
