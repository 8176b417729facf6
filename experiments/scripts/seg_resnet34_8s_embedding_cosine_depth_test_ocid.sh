#!/bin/bash
# Evaluate the depth networks on OCID ($1 = checkpoint, $2 = optional crop checkpoint).
set -ex
python tools/test_net.py \
  --network seg_resnet34_8s_embedding \
  --dataset ocid_object_test \
  --cfg experiments/cfgs/seg_resnet34_8s_embedding_cosine_depth_tabletop.yml \
  --pretrained "$1" \
  ${2:+--pretrained_crop "$2"}
