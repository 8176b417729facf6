#!/bin/bash
# Segment .npy RGB-D dumps ($1 = imgdir, $2 = checkpoint).
set -ex
python tools/test_npy.py \
  --network seg_resnet34_8s_embedding \
  --cfg experiments/cfgs/seg_resnet34_8s_embedding_cosine_rgbd_add_tabletop.yml \
  --imgdir "$1" \
  --pretrained "$2"
