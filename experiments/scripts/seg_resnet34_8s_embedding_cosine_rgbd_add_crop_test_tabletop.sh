#!/bin/bash
# Evaluate the SYN_CROP-trained rgbd_add network on TABLETOP with the crop
# recipe ($1 = checkpoint path; reference analog evaluates the crop-trained
# model under the crop config).
set -ex
python tools/test_net.py \
  --network seg_resnet34_8s_embedding \
  --dataset tabletop_object_test \
  --cfg experiments/cfgs/seg_resnet34_8s_embedding_cosine_rgbd_add_crop_tabletop.yml \
  --pretrained "$1"
