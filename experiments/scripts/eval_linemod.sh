#!/bin/bash
set -e
python -m densefusion_tpu.cli.eval_linemod \
  --dataset_root "${LINEMOD_ROOT:-datasets/linemod/Linemod_preprocessed}" "$@"
