#!/bin/bash
# Evaluate the rgbd_cat networks on TABLETOP ($1 = checkpoint, $2 = optional crop checkpoint).
set -ex
python tools/test_net.py \
  --network seg_resnet34_8s_embedding \
  --dataset tabletop_object_test \
  --cfg experiments/cfgs/seg_resnet34_8s_embedding_cosine_rgbd_cat_tabletop.yml \
  --pretrained "$1" \
  ${2:+--pretrained_crop "$2"}
