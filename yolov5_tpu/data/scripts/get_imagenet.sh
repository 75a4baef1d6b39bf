#!/usr/bin/env bash
# ImageNet ILSVRC2012 -> ../datasets/imagenet (train/ and val/ ImageFolder
# layout for classify training). ImageNet requires registration; download
# ILSVRC2012_img_train.tar and ILSVRC2012_img_val.tar from image-net.org
# first, place them next to this note, then run this script to unpack.
set -euo pipefail
dir="$(cd "$(dirname "$0")/../../.." && pwd)/../datasets/imagenet"
mkdir -p "$dir/train" "$dir/val"
[ -f ILSVRC2012_img_train.tar ] || { echo "missing ILSVRC2012_img_train.tar (download from image-net.org)"; exit 1; }
[ -f ILSVRC2012_img_val.tar ] || { echo "missing ILSVRC2012_img_val.tar"; exit 1; }
tar -xf ILSVRC2012_img_train.tar -C "$dir/train"
( cd "$dir/train" && for t in *.tar; do c="${t%.tar}"; mkdir -p "$c"; tar -xf "$t" -C "$c"; rm -f "$t"; done )
tar -xf ILSVRC2012_img_val.tar -C "$dir/val"
# move val images into per-class dirs using the devkit mapping
curl -L --retry 3 -o /tmp/valprep.sh \
  "https://raw.githubusercontent.com/soumith/imagenetloader.torch/master/valprep.sh"
( cd "$dir/val" && bash /tmp/valprep.sh )
echo "imagenet ready at $dir"
