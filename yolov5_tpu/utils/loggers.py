"""Training loggers: console + CSV always; TensorBoard and the cloud sinks
(W&B / ClearML / Comet) when their SDKs are importable.

Mirrors the reference fan-out (utils/loggers/__init__.py): each cloud
logger is enabled by a successful import, exactly like the reference's
``try: import wandb ... except: wandb = None`` pattern, and disabled with
YOLOV5_TPU_LOGGERS=off (or a comma list naming the ones to keep). The
SDKs need egress at runtime, so in the zero-egress build they are
exercised through injected fake modules (tests/test_aux.py).
"""

from __future__ import annotations

import csv
from pathlib import Path


class CSVLogger:
    def __init__(self, path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._keys = None
        # resume: adopt the existing header instead of appending a second
        # one mid-file (which would break plot_results on resumed runs)
        if self.path.exists():
            try:
                with open(self.path, newline="") as f:
                    first = f.readline().strip()
                if first:
                    self._keys = [k.strip() for k in first.split(",")]
            except OSError:
                pass

    def log(self, row: dict):
        write_header = self._keys is None
        if write_header:
            self._keys = list(row.keys())
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._keys, extrasaction="ignore")
            if write_header:
                w.writeheader()
            w.writerow(row)


class TBLogger:
    def __init__(self, log_dir):
        try:
            from torch.utils.tensorboard import SummaryWriter  # torch cpu ships it

            self.writer = SummaryWriter(str(log_dir))
        except Exception:
            self.writer = None

    def log(self, row: dict, step: int):
        if self.writer is None:
            return
        for k, v in row.items():
            if isinstance(v, (int, float)):
                self.writer.add_scalar(k, v, step)

    def close(self):
        if self.writer is not None:
            self.writer.close()


class WandbLogger:
    """Weights & Biases sink (reference utils/loggers/wandb logic): run per
    training, scalar metrics per epoch, final checkpoint as an artifact."""

    def __init__(self, save_dir, config=None):
        try:
            import wandb
        except ImportError:
            self.run = None
            return
        self.wandb = wandb
        self.run = wandb.run or wandb.init(
            project=Path(save_dir).parent.name or "yolov5_tpu",
            name=Path(save_dir).name, config=config or {})

    def log(self, row: dict, step: int):
        if self.run:
            self.run.log(dict(row), step=step)

    def log_model(self, ckpt_path):
        if self.run:
            art = self.wandb.Artifact(f"run_{self.run.id}_model", type="model")
            art.add_file(str(ckpt_path))
            self.run.log_artifact(art)

    def close(self):
        if self.run:
            self.run.finish()


class ClearmlLogger:
    """ClearML sink (reference utils/loggers/clearml logic)."""

    def __init__(self, save_dir, config=None):
        try:
            from clearml import Task
        except ImportError:
            self.task = None
            return
        self.task = Task.init(project_name="yolov5_tpu",
                              task_name=Path(save_dir).name,
                              auto_connect_frameworks=False)
        if config:
            self.task.connect(dict(config))

    def log(self, row: dict, step: int):
        if self.task:
            logger = self.task.get_logger()
            for k, v in row.items():
                if isinstance(v, (int, float)):
                    title, _, series = k.partition("/")
                    logger.report_scalar(title, series or title, v, step)

    def log_model(self, ckpt_path):
        if self.task:
            self.task.update_output_model(model_path=str(ckpt_path))

    def close(self):
        if self.task:
            self.task.close()


class CometLogger:
    """Comet sink (reference utils/loggers/comet logic)."""

    def __init__(self, save_dir, config=None):
        try:
            import comet_ml
        except ImportError:
            self.exp = None
            return
        self.exp = comet_ml.Experiment(project_name="yolov5_tpu")
        self.exp.set_name(Path(save_dir).name)
        if config:
            self.exp.log_parameters(dict(config))

    def log(self, row: dict, step: int):
        if self.exp:
            self.exp.log_metrics(
                {k: v for k, v in row.items() if isinstance(v, (int, float))},
                step=step)

    def log_model(self, ckpt_path):
        if self.exp:
            self.exp.log_model("yolov5_tpu", str(ckpt_path))

    def close(self):
        if self.exp:
            self.exp.end()


_CLOUD = {"wandb": WandbLogger, "clearml": ClearmlLogger, "comet": CometLogger}


def _enabled_cloud():
    import os

    spec = os.environ.get("YOLOV5_TPU_LOGGERS", "").strip().lower()
    if spec in ("off", "none", "0"):
        return {}
    if spec:
        return {k: v for k, v in _CLOUD.items() if k in spec.split(",")}
    return dict(_CLOUD)  # default: anything importable


class Loggers:
    """Facade over console/CSV/TB + importable cloud sinks, driven by the
    callback bus."""

    def __init__(self, save_dir, enable_tb=True, config=None):
        self.save_dir = Path(save_dir)
        self.csv = CSVLogger(self.save_dir / "results.csv")
        self.tb = TBLogger(self.save_dir) if enable_tb else None
        self.cloud = []
        for cls in _enabled_cloud().values():
            sink = cls(save_dir, config=config)
            if getattr(sink, "run", None) or getattr(sink, "task", None)                     or getattr(sink, "exp", None):
                self.cloud.append(sink)

    def log_metrics(self, row: dict, step: int):
        self.csv.log({"step": step, **row})
        if self.tb:
            self.tb.log(row, step)
        for sink in self.cloud:
            sink.log(row, step)

    def log_model(self, ckpt_path):
        for sink in self.cloud:
            sink.log_model(ckpt_path)

    def close(self):
        if self.tb:
            self.tb.close()
        for sink in self.cloud:
            sink.close()
