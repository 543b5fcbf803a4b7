"""Checkpoint / resume via Orbax.

The TPU counterpart of the reference's HF Trainer checkpointing (ZeRO-3
16-bit weight gather on save, SaveProcessorCallback, resume_from_checkpoint;
SURVEY.md section 5 "Checkpoint / resume"): async, sharding-aware
checkpoints of the full TrainState plus a JSON metadata sidecar.
"""

from __future__ import annotations

import json
import os
from typing import Any

import orbax.checkpoint as ocp

from iadr1_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval_steps: int | None = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps or 1,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState, metadata: dict | None = None):
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state._asdict()),
        )
        self._mgr.save(step, args=args)
        if metadata:
            with open(os.path.join(self.directory, f"meta_{step}.json"), "w") as f:
                json.dump(metadata, f)

    def restore(self, state_like: TrainState, step: int | None = None) -> TrainState:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_like._asdict())
            ),
        )
        return TrainState(**restored["state"])

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
