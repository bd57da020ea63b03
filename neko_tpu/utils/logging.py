"""Metrics logging: stdout pretty-print + JSONL sink + optional wandb.

Log key namespaces match the reference exactly (trainer.py:88-116,129:
training/*, time/*, evaluation/<task>/<metric>) so dashboards transfer.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(
        self,
        exp_dir: Optional[str] = None,
        use_wandb: bool = False,
        wandb_project: str = "neko-tpu",
        exp_name: str = "run",
        config: Optional[dict] = None,
        print_logs: bool = True,
        jsonl: bool = True,
    ):
        self.print_logs = print_logs
        self._jsonl_fh = None
        if exp_dir and jsonl:
            os.makedirs(exp_dir, exist_ok=True)
            self._jsonl_fh = open(os.path.join(exp_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=wandb_project, name=exp_name, config=config)
            except ImportError:
                print("[neko-tpu] wandb not installed; falling back to stdout/jsonl")

    def log(self, metrics: Dict, step: Optional[int] = None, header: str = ""):
        if self.print_logs:
            print("=" * 80)
            if header:
                print(header)
            for k, v in metrics.items():
                print(f"{k}: {v}")
            print("=" * 80, flush=True)
        if self._jsonl_fh is not None:
            rec = {"_time": time.time(), **({"_step": step} if step is not None else {}),
                   **{k: _jsonable(v) for k, v in metrics.items()}}
            self._jsonl_fh.write(json.dumps(rec) + "\n")
            self._jsonl_fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self):
        if self._jsonl_fh is not None:
            self._jsonl_fh.close()
        if self._wandb is not None:
            self._wandb.finish()


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        try:
            return float(v)
        except Exception:
            return str(v)
