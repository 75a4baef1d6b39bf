#!/usr/bin/env bash
# Download COCO 2017 into ../datasets/coco (the layout data/configs/coco.yaml
# expects: images/{train,val,test}2017 + YOLO-format labels).
# Usage: bash get_coco.sh [--train] [--val] [--test] [--segments]
# Needs network egress; in a zero-egress environment mount the dataset
# instead (see the note at the top of configs/coco.yaml).
set -euo pipefail

dir="$(cd "$(dirname "$0")/../../.." && pwd)/../datasets/coco"
mkdir -p "$dir/images"
train=false; val=false; test=false; segments=false
[ $# -eq 0 ] && { train=true; val=true; }
for a in "$@"; do case "$a" in
  --train) train=true ;; --val) val=true ;; --test) test=true ;;
  --segments) segments=true ;; *) echo "unknown arg $a" >&2; exit 2 ;;
esac; done

fetch() { # url dest-dir
  f="$(basename "$1")"
  echo "downloading $f ..."
  curl -L --retry 3 -o "/tmp/$f" "$1"
  unzip -qo "/tmp/$f" -d "$2"
  rm -f "/tmp/$f"
}

# YOLO-format labels (polygons when --segments)
if $segments; then
  fetch "https://github.com/ultralytics/yolov5/releases/download/v1.0/coco2017labels-segments.zip" "$dir/.."
else
  fetch "https://github.com/ultralytics/yolov5/releases/download/v1.0/coco2017labels.zip" "$dir/.."
fi

base="http://images.cocodataset.org/zips"
$train && fetch "$base/train2017.zip" "$dir/images"   # 19G
$val && fetch "$base/val2017.zip" "$dir/images"       # 1G
$test && fetch "$base/test2017.zip" "$dir/images"     # 7G
echo "COCO ready at $dir"
