#!/bin/bash
# Evaluate the rgbd_early networks on OSD ($1 = checkpoint, $2 = optional crop checkpoint).
set -ex
python tools/test_net.py \
  --network seg_resnet34_8s_embedding_early \
  --dataset osd_object_test \
  --cfg experiments/cfgs/seg_resnet34_8s_embedding_cosine_rgbd_early_tabletop.yml \
  --pretrained "$1" \
  ${2:+--pretrained_crop "$2"}
