"""Training scalar streams: TensorBoard + optional wandb + JSONL.

Parity: the reference logs scalars to TensorBoard per iteration and
optionally mirrors them to wandb (HAC/train.py:283-286 tb_writer
add_scalar, :634-645 wandb.init gating). Here one ScalarLogger fans a
metric dict out to every available sink; a JSONL file is always written
so runs remain inspectable without either dependency.
"""

from __future__ import annotations

import json
import os
import time


class ScalarLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True,
                 use_wandb: bool = False, wandb_project: str | None = None,
                 run_name: str | None = None):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        self._wandb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_project or "gauspcc_tpu",
                    name=run_name, dir=log_dir, reinit=True)
            except Exception:
                self._wandb = None

    @property
    def sinks(self) -> list[str]:
        out = ["jsonl"]
        if self._tb is not None:
            out.append("tensorboard")
        if self._wandb is not None:
            out.append("wandb")
        return out

    def log(self, step: int, metrics: dict) -> None:
        clean = {k: float(v) for k, v in metrics.items()
                 if _is_scalar(v)}
        self._jsonl.write(json.dumps(
            {"step": step, "time": time.time(), **clean}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(clean, step=step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


def _is_scalar(v) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False
