#!/usr/bin/env bash
# Fetch the reference's released torch checkpoints (yolov5n..x, -seg, -cls).
# yolov5_tpu imports them directly: models/weights.py attempt_load() reads
# torch .pt files and maps them onto the flax param tree (tested in
# tests/test_weights_import.py). Usage: bash download_weights.sh [v7.0]
set -euo pipefail
ver="${1:-v7.0}"
base="https://github.com/ultralytics/yolov5/releases/download/$ver"
for m in n s m l x; do
  for suffix in "" "-seg" "-cls"; do
    f="yolov5${m}${suffix}.pt"
    echo "downloading $f ..."
    curl -L --retry 3 -O "$base/$f"
  done
done
echo "done; load with: python -c \"from yolov5_tpu.models.weights import attempt_load; attempt_load('yolov5s.pt')\""
