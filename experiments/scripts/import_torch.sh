#!/bin/bash
# Convert the reference's download.sh-able .pth trained models into a
# framework checkpoint (tools/train.py:83-97 resume format).
set -e
python -m densefusion_tpu.cli.import_torch \
  --pose_model "${POSE_PTH:?set POSE_PTH to the pose_model .pth}" \
  ${REFINE_PTH:+--refine_model "$REFINE_PTH"} \
  --dataset "${DATASET:-ycb}" \
  --out "${OUT:-trained_models/imported}" "$@"
