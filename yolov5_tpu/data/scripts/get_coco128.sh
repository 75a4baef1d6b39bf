#!/usr/bin/env bash
# COCO128 smoke-test dataset (128 images) -> ../datasets/coco128.
# Needs egress; zero-egress environments should use the built-in synthetic
# generator instead: python -c "from yolov5_tpu.data.synthetic import *; ..."
set -euo pipefail
dir="$(cd "$(dirname "$0")/../../.." && pwd)/../datasets"
mkdir -p "$dir"
curl -L --retry 3 -o /tmp/coco128.zip \
  "https://github.com/ultralytics/yolov5/releases/download/v1.0/coco128.zip"
unzip -qo /tmp/coco128.zip -d "$dir" && rm -f /tmp/coco128.zip
echo "coco128 ready at $dir/coco128"
