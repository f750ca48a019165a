#!/bin/bash
set -e
python -m densefusion_tpu.cli.train_seg \
  --dataset_root "${YCB_ROOT:-datasets/ycb/YCB_Video_Dataset}" "$@"
