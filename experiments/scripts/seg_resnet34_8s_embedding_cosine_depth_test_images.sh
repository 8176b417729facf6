#!/bin/bash
# Segment a directory of RGB-D images ($1 = imgdir, $2 = checkpoint, $3 = optional crop checkpoint).
set -ex
python tools/test_images.py \
  --network seg_resnet34_8s_embedding \
  --cfg experiments/cfgs/seg_resnet34_8s_embedding_cosine_depth_tabletop.yml \
  --imgdir "$1" \
  --pretrained "$2" \
  ${3:+--pretrained_crop "$3"} \
  --vis
