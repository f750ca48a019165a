#!/bin/bash
set -e
python -m densefusion_tpu.cli.train --dataset ycb \
  --dataset_root "${YCB_ROOT:-datasets/ycb/YCB_Video_Dataset}" "$@"
