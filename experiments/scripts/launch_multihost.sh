#!/bin/bash
# Multi-host data-parallel training launcher.
#
# On TPU pods, run this same command on every host (e.g. via
# `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...`);
# jax.distributed auto-configures from the TPU environment and
# densefusion_tpu shards each host's input by process index.
#
#   LINEMOD_ROOT=/data/lm ./experiments/scripts/launch_multihost.sh \
#       --batch_size 64
set -e
python -m densefusion_tpu.cli.train \
  --dataset "${DATASET:-linemod}" \
  --dataset_root "${LINEMOD_ROOT:-datasets/linemod/Linemod_preprocessed}" \
  --data_parallel --bf16 "$@"
