"""Metric logging: CSV always, TensorBoard when available.

Replaces the reference's ~20 ``self.log(..., sync_dist=True)`` calls per step
(``Stage1_source/PL_wrapper.py:1092-1112``): metrics accumulate on device and
flush on a cadence, so logging never forces a host sync in the step loop.
"""

from __future__ import annotations

import csv
import os
from typing import Mapping


class MetricLogger:
    def __init__(self, log_dir: str, *, filename: str = "metrics.csv"):
        os.makedirs(log_dir, exist_ok=True)
        self.csv_path = os.path.join(log_dir, filename)
        self._rows: list[dict] = []
        self._fieldnames: list[str] = ["step"]
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._tb = None

    def log(self, step: int, metrics: Mapping[str, float]) -> None:
        values = {"step": step}
        values.update({k: float(v) for k, v in metrics.items()})
        # fieldnames grow over the run (e.g. val_* rows join train rows);
        # the CSV is rewritten with the union so no metric is dropped
        for key in values:
            if key not in self._fieldnames:
                self._fieldnames.append(key)
        self._rows.append(values)
        with open(self.csv_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fieldnames)
            writer.writeheader()
            writer.writerows(self._rows)
        if self._tb is not None:
            for k, v in values.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        if self._tb:
            self._tb.close()
