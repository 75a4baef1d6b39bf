"""Training loggers: console + CSV always; TensorBoard when available.

The reference fans out to csv/TB/W&B/ClearML/Comet (utils/loggers/__init__.py).
Cloud loggers need egress, so this build ships csv+TB with the same hook
surface; third-party sinks can register on the Callbacks bus.
"""

from __future__ import annotations

import csv
from pathlib import Path


class CSVLogger:
    def __init__(self, path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._keys = None

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


class Loggers:
    """Facade over console/CSV/TB, driven by the callback bus."""

    def __init__(self, save_dir, enable_tb=True):
        self.save_dir = Path(save_dir)
        self.csv = CSVLogger(self.save_dir / "results.csv")
        self.tb = TBLogger(self.save_dir) if enable_tb else None

    def log_metrics(self, row: dict, step: int):
        self.csv.log({"step": step, **row})
        if self.tb:
            self.tb.log(row, step)

    def close(self):
        if self.tb:
            self.tb.close()
