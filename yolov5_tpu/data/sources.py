"""Inference input sources: images/dirs/globs/videos (host side).

Covers the reference's LoadImages (utils/dataloaders.py:265-371). Streams
(webcam/RTSP) follow the same iterator contract and can be added on top —
they need camera hardware this environment lacks.
"""

from __future__ import annotations

import glob
import os
from pathlib import Path

import numpy as np

from yolov5_tpu.data.dataset import IMG_FORMATS
from yolov5_tpu.data.letterbox import letterbox

VID_FORMATS = {"asf", "avi", "gif", "m4v", "mkv", "mov", "mp4", "mpeg", "mpg", "ts", "wmv"}


class LoadImages:
    """Iterate (path, letterboxed RGB CHW-free (s,s,3) uint8, original BGR,
    meta) over files, dirs, globs, txt lists and videos."""

    def __init__(self, path, img_size=640, stride=32, auto=False):
        files = []
        for p in path if isinstance(path, (list, tuple)) else [str(path)]:
            p = str(Path(p).resolve()) if not str(p).startswith(("http://", "https://")) else p
            if "*" in p:
                files.extend(sorted(glob.glob(p, recursive=True)))
            elif os.path.isdir(p):
                files.extend(sorted(glob.glob(os.path.join(p, "*.*"))))
            elif os.path.isfile(p):
                if p.endswith(".txt"):
                    files.extend(Path(p).read_text().split())
                else:
                    files.append(p)
            else:
                raise FileNotFoundError(f"{p} does not exist")
        self.images = [f for f in files if f.rsplit(".", 1)[-1].lower() in IMG_FORMATS]
        self.videos = [f for f in files if f.rsplit(".", 1)[-1].lower() in VID_FORMATS]
        self.files = self.images + self.videos
        self.img_size = img_size
        self.stride = stride
        self.auto = auto
        self.nf = len(self.files)
        if self.nf == 0:
            raise FileNotFoundError(f"no images/videos found in {path}")

    def __len__(self):
        return self.nf

    def __iter__(self):
        import cv2

        for f in self.images:
            im0 = cv2.imread(f)
            if im0 is None:
                continue
            im, ratio, pad = letterbox(im0, self.img_size, auto=self.auto, stride=self.stride)
            yield f, im[..., ::-1].copy(), im0, {"ratio": ratio, "pad": pad, "frame": 0}
        for f in self.videos:
            cap = cv2.VideoCapture(f)
            frame = 0
            while cap.isOpened():
                ok, im0 = cap.read()
                if not ok:
                    break
                im, ratio, pad = letterbox(im0, self.img_size, auto=self.auto, stride=self.stride)
                yield f, im[..., ::-1].copy(), im0, {"ratio": ratio, "pad": pad, "frame": frame}
                frame += 1
            cap.release()


def batched(source: LoadImages, batch_size=1):
    """Group source items into fixed-size batches (pad by repeating last)."""
    buf = []
    for item in source:
        buf.append(item)
        if len(buf) == batch_size:
            yield buf
            buf = []
    if buf:
        while len(buf) < batch_size:
            buf.append(buf[-1])
        yield buf
