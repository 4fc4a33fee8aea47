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
        # Two directories, exactly like the reference's Saver flow (periodic
        # checkpoints + a separate best_model dir): the latest-N manager prunes
        # EVERY checkpoint by recency (metricless periodic saves included —
        # a single best-tracking manager with keep_checkpoints_without_metrics
        # preserves metricless saves forever, growing disk without bound), and
        # the best manager keeps only the best-on-val state.
        self.mgr = ocp.CheckpointManager(
            os.path.join(self.directory, "ckpts"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
                enable_async_checkpointing=True,
            ),
        )
        self.best_mgr = ocp.CheckpointManager(
            os.path.join(self.directory, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1,
                best_fn=lambda m: m["val_acc"],
                best_mode="max",
                keep_checkpoints_without_metrics=False,
                create=True,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: Any, val_acc: float | None = None) -> None:
        self.mgr.save(step, args=ocp.args.StandardSave(state))
        if val_acc is not None:
            self.best_mgr.save(step, args=ocp.args.StandardSave(state),
                               metrics={"val_acc": float(val_acc)})

    def latest_step(self) -> int | None:
        return self.mgr.latest_step()

    def best_step(self) -> int | None:
        step, _ = self._best()
        return step

    def _best(self) -> tuple[int | None, Any]:
        """(best step, manager holding it). Prefers the best/ directory; on a
        miss, probes the legacy single-manager layout (pre-best-dir runs
        recorded val metrics on the periodic saves in ckpts/) so old run dirs
        restore their actual best-on-val state instead of silently falling
        back to latest."""
        s = self.best_mgr.best_step()
        if s is not None:
            return s, self.best_mgr
        if self.mgr.latest_step() is None:
            return None, None
        try:
            legacy = ocp.CheckpointManager(
                os.path.join(self.directory, "ckpts"),
                options=ocp.CheckpointManagerOptions(
                    best_fn=lambda m: m["val_acc"],
                    best_mode="max",
                    read_only=True,
                ),
            )
            try:
                s = legacy.best_step()  # None unless some ckpts/ step has metrics
            finally:
                legacy.close()
        except Exception:  # corrupt/foreign metadata: treat as no-best
            s = None
        return s, self.mgr

    def restore(self, abstract_state: Any, step: int | None = None, best: bool = False) -> Any:
        """Restore `step` (default: latest; best=True → best-on-val, reference
        --load_best). A best=True request falls back to the latest checkpoint
        when no validation metric was ever recorded (e.g. --val-fraction 0),
        instead of failing a run that has perfectly good checkpoints."""
        if step is None and best:
            bstep, bmgr = self._best()
            if bstep is not None:
                return bmgr.restore(
                    bstep, args=ocp.args.StandardRestore(abstract_state))
            print(f"checkpoint: no best-on-val metric recorded in "
                  f"{self.directory}; restoring the LATEST checkpoint instead",
                  flush=True)
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self.mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))

    def wait(self):
        self.mgr.wait_until_finished()
        self.best_mgr.wait_until_finished()

    def close(self):
        self.wait()
        self.mgr.close()
        self.best_mgr.close()
