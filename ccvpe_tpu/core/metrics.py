"""Structured metric logging: CSV always, TensorBoard when available.

Replaces the reference's print-every-200-steps + np.savetxt appends
(reference train_VIGOR.py:155-157, :221-241)."""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Dict, Optional


class MetricWriter:
    def __init__(self, directory: str, run_name: str = "run"):
        os.makedirs(directory, exist_ok=True)
        self._csv_path = os.path.join(directory, f"{run_name}.csv")
        self._jsonl_path = os.path.join(directory, f"{run_name}.jsonl")
        self._fieldnames = None
        self._tb = None
        try:
            from flax.metrics import tensorboard  # optional
            self._tb = tensorboard.SummaryWriter(os.path.join(directory, "tb"))
        except Exception:
            self._tb = None

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        row = {"step": step, "time": time.time(),
               **{k: float(v) for k, v in scalars.items()}}
        write_header = not os.path.exists(self._csv_path) or self._fieldnames is None
        if self._fieldnames is None:
            self._fieldnames = list(row.keys())
        with open(self._csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fieldnames, extrasaction="ignore")
            if write_header and f.tell() == 0:
                w.writeheader()
            w.writerow(row)
        with open(self._jsonl_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.scalar(k, float(v), step)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()
