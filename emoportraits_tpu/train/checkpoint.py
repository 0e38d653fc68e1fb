"""Checkpoint / resume via orbax: {params, opt states, sn state, step, negatives queue}
+ the JSON config snapshot.

Reference parity (train.py:357-391 save / :100-171 load):
  * `{epoch:03d}_model.pth` (full state_dict)  -> orbax step dir `model`
  * `{epoch:03d}_trainer.pth` {opt_i, shd_i, logger} -> same tree, one atomic save
  * rank-0-only IO -> process_index()==0 guard
  * keep-latest-unless-on-checkpoint_freq-boundary retention (:372-383)
  * config snapshot args.txt (train.py:80-83) -> config.json alongside.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from ..config import ExperimentConfig
from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, cfg: ExperimentConfig, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.cfg = cfg
        self.is_leader = jax.process_index() == 0
        if self.is_leader:
            os.makedirs(self.directory, exist_ok=True)
            cfg.to_json(os.path.join(self.directory, "config.json"))
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            keep_period=cfg.train.checkpoint_freq,  # boundary epochs are kept forever
            create=True,
        )
        self.mngr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState) -> None:
        self.mngr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, state_like: TrainState, step: Optional[int] = None) -> TrainState:
        step = self.latest_step() if step is None else step
        return self.mngr.restore(
            step, args=ocp.args.StandardRestore(state_like))

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def wait(self):
        self.mngr.wait_until_finished()


def restore_params(checkpoint_dir: str, params_like: Any,
                   step: Optional[int] = None) -> Any:
    """Restore ONLY the generator params from a full TrainState checkpoint — the
    frozen-stage-1 load used by stage-2 training (reference loads stage-1 weights
    strict=False into the stage-2 Model, volumetric_avatar_two.py init)."""
    mngr = ocp.CheckpointManager(os.path.abspath(checkpoint_dir))
    step = mngr.latest_step() if step is None else step
    restored = mngr.restore(step)  # raw pytree of the saved TrainState
    return jax.tree.map(lambda _, x: x, params_like, restored["gen_params"])


def load_config(checkpoint_dir: str) -> ExperimentConfig:
    """Reconstruct the experiment config saved next to the checkpoints (parity with
    re-parsing args.txt at inference, utils/args.py:54, notebooks/infer.py:74-76)."""
    return ExperimentConfig.from_json(os.path.join(checkpoint_dir, "config.json"))
