#!/bin/sh
# bf16-vs-f32 convergence A/B on synthetic YCB (docs/PERF.md round 3).
# One seed-identical dataset, two train runs differing ONLY in --bf16;
# compare the per-epoch test avg_dis curves in the metrics JSONL.
set -e
ROOT=${1:-/root/ab}
EPOCHS=${2:-25}
mkdir -p "$ROOT"
python - "$ROOT" <<'EOF'
import sys
from densefusion_tpu.data.synthetic import generate_ycb_style_dataset
import os
root = os.path.join(sys.argv[1], "dataset")
if not os.path.isdir(os.path.join(root, "dataset_config")):
    generate_ycb_style_dataset(root, n_classes=5, n_real=320, n_syn=64,
                               n_test=32, seed=3,
                               posecnn_dir=os.path.join(sys.argv[1], "posecnn"))
    print("dataset generated ->", root)
EOF
for MODE in f32 bf16; do
  EXTRA=""
  [ "$MODE" = bf16 ] && EXTRA="--bf16"
  echo "=== $MODE run ==="
  python -m densefusion_tpu.cli.train --dataset ycb \
    --dataset_root "$ROOT/dataset" --batch_size 8 --workers 4 \
    --nepoch "$EPOCHS" --crop_size 192 --seed 3 --num_objects 5 \
    --out_dir "$ROOT/out_$MODE" --log_dir "$ROOT/logs_$MODE" $EXTRA
done
echo AB DONE
