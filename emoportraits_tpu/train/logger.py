"""Metrics logger: loss buffering/averaging, leader-only IO, optional W&B, visual grids.

Reference: utils/logger_wandb.py:46-277 — buffers losses and averages every
`logging_freq` iters, reduces across ranks to rank 0, saves visual grids as JPEG +
wandb.Image, restores epoch/iter on resume. Here:
  * cross-device reduction already happened inside the jitted step (metrics come out
    replicated means), so the logger only buffers/averages on the leader;
  * wandb is optional (zero-egress environments log to JSONL + image files);
  * state (epoch, iter) round-trips through the checkpoint for resume parity
    (logger_wandb.py:266-277).
"""
from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import numpy as np


class MetricsLogger:
    def __init__(self, directory: str, logging_freq: int = 10,
                 use_wandb: bool = False, experiment_name: str = "default"):
        self.directory = directory
        self.logging_freq = logging_freq
        self.is_leader = jax.process_index() == 0
        self.buffer: Dict[str, list] = defaultdict(list)
        self.iteration = 0
        self.epoch = 0
        self._wandb = None
        if self.is_leader:
            os.makedirs(directory, exist_ok=True)
            self.jsonl = open(os.path.join(directory, "metrics.jsonl"), "a")
            if use_wandb:
                try:
                    import wandb
                    self._wandb = wandb
                    wandb.init(project="emoportraits_tpu", name=experiment_name,
                               dir=directory)
                except Exception:
                    self._wandb = None

    def log(self, metrics: Dict[str, jax.Array]) -> Optional[Dict[str, float]]:
        """Buffer one step's metrics; flush averaged values every logging_freq steps.

        Buffers the DEVICE scalars and converts to host floats only at flush time —
        a per-step float() would synchronize the host with the jit stream every
        iteration and serialize dispatch against execution.
        """
        self.iteration += 1
        if not self.is_leader:
            return None
        for k, v in metrics.items():
            self.buffer[k].append(v)
        if self.iteration % self.logging_freq:
            return None
        host = jax.device_get(dict(self.buffer))
        means = {k: float(np.mean([np.asarray(x) for x in v]))
                 for k, v in host.items()}
        self.buffer.clear()
        record = {"iter": self.iteration, "epoch": self.epoch,
                  "time": time.time(), **means}
        self.jsonl.write(json.dumps(record) + "\n")
        self.jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(means, step=self.iteration)
        return means

    def log_image_grid(self, name: str, images: np.ndarray) -> None:
        """Save a (N, H, W, 3) [0,1] panel grid as one JPEG (reference visuals grids,
        va_losses_and_visuals.py:914-1054 + logger_wandb.py:191-224)."""
        if not self.is_leader:
            return
        from PIL import Image

        n, h, w, _ = images.shape
        cols = min(n, 4)
        rows = (n + cols - 1) // cols
        grid = np.zeros((rows * h, cols * w, 3), np.float32)
        for i in range(n):
            r, c = divmod(i, cols)
            grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = images[i]
        img = Image.fromarray((np.clip(grid, 0, 1) * 255).astype(np.uint8))
        os.makedirs(os.path.join(self.directory, "visuals"), exist_ok=True)
        img.save(os.path.join(self.directory, "visuals",
                              f"{self.iteration:08d}_{name}.jpg"), quality=90)

    def state_dict(self) -> Dict[str, int]:
        return {"iteration": self.iteration, "epoch": self.epoch}

    def load_state_dict(self, d: Dict[str, int]) -> None:
        self.iteration = int(d.get("iteration", 0))
        self.epoch = int(d.get("epoch", 0))


def normalize_losses_for_display(metrics, weights) -> dict:
    """Display-only renormalization of logged losses (reference --normalize_losses,
    prod True; train.py:262-288): divides the heavily-weighted terms by
    weight/constant so the dashboard curves share a scale. Training totals are
    untouched — this runs on the HOST copy right before logging."""
    out = dict(metrics)
    rules = (
        ("gen/eyes_l1", weights.eyes_l1 / 100.0),
        ("gen/mouth_l1", weights.mouth_l1 / 100.0),
        ("gen/ears_l1", weights.ears_l1 / 100.0),
        ("gen/vgg19_face", weights.vgg19_face / 4.0),
        ("gen/pull_exp", weights.pull_exp / 0.5),
        ("gen/push_exp", weights.push_exp / 0.5),
        ("gen/resnet18_fv_mix", weights.resnet18_fv_mix / 35.0),
        ("gen/volumes_l1", weights.volumes_l1),
    )
    for key, div in rules:
        if key in out and div:
            out[key] = out[key] / div
    return out
