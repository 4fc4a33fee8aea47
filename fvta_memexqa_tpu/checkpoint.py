"""Orbax checkpointing: async save, best-on-val tracking, exact resume.

Replaces the reference's tf.train.Saver flow (SURVEY.md section 2 "Checkpointing":
periodic save + separate best-on-val-accuracy save + --load_best at test time) and
fixes its gap: resume restores params, optimizer state, step/epoch AND the data-order
RNG, so a killed run continues bit-identically (SURVEY.md section 5 "Failure
detection": the reference restores weights only).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp

from fvta_memexqa_tpu.config import Config, load_config, save_config


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager with val-accuracy best tracking."""

    def __init__(self, directory: str, cfg: Config | None = None, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        cfg_path = os.path.join(self.directory, "config.json")
        if cfg is not None:
            save_config(cfg, cfg_path)
            self.cfg = cfg
        elif os.path.exists(cfg_path):
            self.cfg = load_config(cfg_path)
        else:
            self.cfg = None
        self.mgr = ocp.CheckpointManager(
            os.path.join(self.directory, "ckpts"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: m["val_acc"],
                best_mode="max",
                keep_checkpoints_without_metrics=True,
                create=True,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: Any, val_acc: float | None = None) -> None:
        metrics = {"val_acc": float(val_acc)} if val_acc is not None else None
        self.mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics)

    def latest_step(self) -> int | None:
        return self.mgr.latest_step()

    def best_step(self) -> int | None:
        return self.mgr.best_step()

    def restore(self, abstract_state: Any, step: int | None = None, best: bool = False) -> Any:
        """Restore `step` (default: latest; best=True → best-on-val, reference
        --load_best). abstract_state: a pytree of ShapeDtypeStruct/arrays giving
        structure."""
        if step is None:
            step = self.best_step() if best else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self.mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))

    def wait(self):
        self.mgr.wait_until_finished()

    def close(self):
        self.mgr.wait_until_finished()
        self.mgr.close()
