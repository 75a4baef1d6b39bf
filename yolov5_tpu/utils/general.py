"""Small host-side utilities (run dirs, dataset config, console color,
seeding) — the slice of the reference's utils/general.py that a TPU build
still needs."""

from __future__ import annotations

import os
import random
import re
from pathlib import Path

import numpy as np
import yaml


def colorstr(*input):
    """colorstr('blue', 'bold', 'hello') — ANSI-colored string."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
        "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
        "cyan": "\033[36m", "white": "\033[37m", "bright_red": "\033[91m",
        "bright_green": "\033[92m", "bright_yellow": "\033[93m",
        "bold": "\033[1m", "underline": "\033[4m", "end": "\033[0m",
    }
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


def increment_path(path, exist_ok=False, sep="", mkdir=False):
    """runs/exp -> runs/exp2, exp3, ... (reference general.py:864-891)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = f"{path}{sep}{n}{suffix}"
            if not os.path.exists(p):
                path = Path(p)
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def init_seeds(seed=0):
    random.seed(seed)
    np.random.seed(seed)
    return seed


def check_img_size(imgsz, s=32, floor=0):
    """Round image size up to a stride multiple (reference general.py:266)."""
    import math

    if isinstance(imgsz, int):
        new = max(math.ceil(imgsz / s) * s, floor)
        if new != imgsz:
            print(f"WARNING: --imgsz {imgsz} not multiple of stride {s}, using {new}")
        return new
    return [check_img_size(x, s, floor) for x in imgsz]


def check_dataset(data):
    """Load + validate a dataset config (dict or yaml path). Schema:
    {path?, train, val?, test?, names|nc} (reference general.py:350-405,
    minus auto-download — this environment has no egress; a clear error
    replaces the download hook)."""
    if isinstance(data, str) and data.startswith("clearml://"):
        # versioned ClearML dataset: materialize + resolve it first
        # (reference utils/loggers/clearml/clearml_utils.py:41-81)
        from yolov5_tpu.utils.loggers import construct_clearml_dataset

        data = construct_clearml_dataset(data)
    if isinstance(data, (str, Path)):
        p = Path(data)
        if not p.exists():
            # bare preset name ('coco128') -> packaged dataset config
            cand = (Path(__file__).parent.parent / "data" / "configs" /
                    p.with_suffix(".yaml").name)
            if cand.exists():
                p = cand
        with open(p) as f:
            d = yaml.safe_load(f)
        d.setdefault("yaml_file", str(p))
    else:
        d = dict(data)
    if "names" in d:
        if isinstance(d["names"], (list, tuple)):
            d["names"] = dict(enumerate(d["names"]))
        d["nc"] = d.get("nc", len(d["names"]))
    elif "nc" in d:
        d["names"] = {i: f"class{i}" for i in range(d["nc"])}
    else:
        raise ValueError("dataset config needs 'names' or 'nc'")
    root = Path(d.get("path", "."))
    for split in ("train", "val", "test"):
        if d.get(split):
            v = d[split]
            paths = [v] if isinstance(v, (str, Path)) else list(v)
            resolved = []
            for p in paths:
                p = Path(p)
                if not p.is_absolute() and not p.exists() and (root / p).exists():
                    p = root / p  # split given relative to the dataset root
                if not p.exists():
                    raise FileNotFoundError(
                        f"dataset split '{split}' missing: {p} (no auto-download in "
                        "this environment; generate or mount the data)")
                resolved.append(str(p))
            d[split] = resolved if len(resolved) > 1 else resolved[0]
    return d


def labels_to_class_weights(labels_list, nc):
    """Inverse-frequency class weights (reference general.py:530-541)."""
    counts = np.zeros(nc)
    for l in labels_list:
        if len(l):
            counts += np.bincount(l[:, 0].astype(int), minlength=nc)
    weights = 1.0 / np.maximum(counts, 1)
    weights[counts == 0] = 0
    return weights / max(weights.sum(), 1e-9)
