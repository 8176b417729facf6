#!/bin/bash
# Evaluate the depth networks on OCID ($1 = checkpoint, $2 = optional crop checkpoint).
#
# Real data:   export OCID_ROOT=/path/to/OCID   (layout per lib/datasets/ocid_object.py:43-51)
# Without OCID_ROOT the script materializes the wire-format fixture tree
# (tools/make_real_fixtures.py: same PNG/organized-LZF-PCD formats the real
# archive ships) and runs end-to-end on it, so the full command path is
# verified green before the real archive is ever mounted.
#
# Checkpoints: --pretrained accepts orbax dirs OR the reference's released
# torch .pth files directly -- utils/checkpoint.py converts on load, e.g.
#   $0 seg_resnet34_8s_embedding_cosine_depth_sampling_epoch_16.checkpoint.pth
set -ex
ROOT="${OCID_ROOT:-output/fixtures/OCID}"
if [ -z "$OCID_ROOT" ] && [ ! -d "$ROOT" ]; then
  python tools/make_real_fixtures.py --root output/fixtures --num 8 \
      --dataset ocid
fi
python tools/test_net.py \
  --network seg_resnet34_8s_embedding \
  --dataset ocid_object_test \
  --dataset_root "$ROOT" \
  --cfg experiments/cfgs/seg_resnet34_8s_embedding_cosine_depth_tabletop.yml \
  ${1:+--pretrained "$1"} \
  ${2:+--pretrained_crop "$2"}
