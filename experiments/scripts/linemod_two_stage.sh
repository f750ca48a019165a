#!/bin/bash
# Full 13-object LineMOD-protocol rehearsal: SegNet trained in-repo, its
# PREDICTED masks feeding eval (the reference chain
# vanilla_segmentation/train.py -> segnet_results/ ->
# datasets/linemod/dataset.py:57-58 -> tools/eval_linemod.py), then
# PoseNet(+refiner curriculum) and the per-object ADD(-S) < 0.1*diameter
# table. Budget ~2h on one TPU v5e chip; numbers in docs/PERF.md round 4.
#
# Axon-tunnel hosts: keep /root/.axon_site on PYTHONPATH (the TPU backend
# registers from its sitecustomize) and run ONE TPU process at a time.
set -e
cd "$(dirname "$0")/../.."
# preserve any inherited PYTHONPATH (e.g. /root/.axon_site, whose
# sitecustomize registers the TPU backend) — clobbering it silently
# drops the run to CPU
export PYTHONPATH=$PWD${PYTHONPATH:+:$PYTHONPATH}${AXON_SITE:+:$AXON_SITE}

ROOT=${1:-/tmp/lm_two_stage}
python -u examples/linemod_two_stage.py \
  --objlist 1,2,4,5,6,8,9,10,11,12,13,14,15 \
  --train_frames 200 --test_frames 25 \
  --seg_epochs 10 --seg_batch 8 --seg_lr 5e-4 --seg_fg_weight 30.0 \
  --nepoch 90 --batch 8 --points 500 --crop 192 --iterations 4 \
  --workers 4 --seed 1 --bf16 \
  --root "$ROOT" --out "$ROOT/summary.json"
