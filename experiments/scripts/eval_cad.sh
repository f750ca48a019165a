#!/bin/bash
set -e
python -m densefusion_tpu.cli.eval_cad \
  --dataset_root "${CAD_ROOT:-datasets/customCAD/dataset_processed}" "$@"
