"""Structured metric logging: stdout + CSV (+ optional TensorBoard).

Replaces the reference's scattered prints (main_mlp.py:362-371,
main_3dident.py:539-553) and the KITTI log.csv (solver.py:57-58,77-81)
with one writer. TensorBoard is optional and gated on availability
(the reference hard-imports it at main_kitti.py:53-61).
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(
        self,
        log_dir: Optional[str] = None,
        csv_name: str = "log.csv",
        use_tensorboard: bool = False,
        print_to_stdout: bool = True,
    ):
        self.log_dir = log_dir
        self.print_to_stdout = print_to_stdout
        self._csv_file = None
        self._csv_writer = None
        self._csv_fields = None
        self._tb = None
        self._t0 = time.time()
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._csv_path = os.path.join(log_dir, csv_name)
        if use_tensorboard and log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def log_args(self, args_dict: Dict):
        """Dump run arguments as json (reference: main_kitti.py:62-63)."""
        if self.log_dir:
            with open(os.path.join(self.log_dir, "args.json"), "w") as fh:
                json.dump(args_dict, fh, indent=2, default=str)
        if self._tb is not None:
            self._tb.add_text("args", json.dumps(args_dict, default=str))

    def log(self, step: int, metrics: Dict[str, float]):
        metrics = {k: float(v) for k, v in metrics.items()}
        if self.print_to_stdout:
            parts = [f"Step: {step}"] + [f"{k}: {v:.4f}" for k, v in metrics.items()]
            print(" \t ".join(parts), flush=True)
        if self.log_dir:
            if self._csv_writer is None:
                self._csv_fields = ["step", "wall_time"] + sorted(metrics)
                self._csv_file = open(self._csv_path, "a", newline="")
                self._csv_writer = csv.DictWriter(
                    self._csv_file, fieldnames=self._csv_fields, extrasaction="ignore"
                )
                if self._csv_file.tell() == 0:
                    self._csv_writer.writeheader()
            row = {"step": step, "wall_time": time.time() - self._t0, **metrics}
            self._csv_writer.writerow(row)
            self._csv_file.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)

    def close(self):
        if self._csv_file:
            self._csv_file.close()
        if self._tb is not None:
            self._tb.close()
