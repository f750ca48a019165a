#!/bin/bash
set -e
python -m densefusion_tpu.cli.eval_ycb \
  --dataset_root "${YCB_ROOT:-datasets/ycb/YCB_Video_Dataset}" \
  --posecnn_results "${POSECNN_RESULTS:-YCB_Video_toolbox/results_PoseCNN_RSS2018}" --plots "$@"
