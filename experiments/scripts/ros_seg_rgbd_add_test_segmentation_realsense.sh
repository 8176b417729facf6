#!/bin/bash
# Live RealSense segmentation via ROS ($1 = checkpoint, $2 = optional crop checkpoint).
set -ex
python ros/test_images_segmentation.py \
  --network seg_resnet34_8s_embedding \
  --cfg experiments/cfgs/seg_resnet34_8s_embedding_cosine_rgbd_add_tabletop.yml \
  --camera D415 \
  --pretrained "$1" \
  ${2:+--pretrained_crop "$2"}
