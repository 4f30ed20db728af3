"""Crash-safe checkpoint/resume via orbax (SURVEY.md 5).

The reference ``torch.save``s G/D/G-EMA/optimizers + schedule position
(SURVEY.md 2.2). Here the whole ``TrainState`` pytree — including the PRNG
key and the shown-image counter that *derives* the schedule position — is
one orbax item, saved asynchronously with keep-last-k retention, so resume
is bitwise-exact (tested in test_checkpoint.py).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from ganlab_tpu.train.state import TrainState


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for the TrainState."""

    def __init__(self, directory: str, keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True, enable_async_checkpointing=True)
        self._mgr = ocp.CheckpointManager(self._dir, options=options)

    def save(self, step: int, state: TrainState) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, state_like: TrainState,
                step: int | None = None) -> TrainState | None:
        """Restore the latest (or a given) checkpoint into the structure of
        ``state_like``; returns None when no checkpoint exists.

        Migration: ``pl_mean`` is an OPTIONAL leaf (None when path-length
        regularization is not configured — train/state.py). A checkpoint
        written without it restores as None even when the current config
        enables PL; backfill the template's fresh zero so the first PL
        step doesn't crash. The reverse (PL checkpoint into a non-PL
        config) restores through a PL-shaped template and then drops the
        leaf.
        """
        target = step if step is not None else self._mgr.latest_step()
        if target is None:
            return None
        try:
            restored = self._mgr.restore(
                target, args=ocp.args.StandardRestore(state_like))
        except Exception as e:
            # Only the specific pl_mean structure mismatch is migratable:
            # non-PL template vs a checkpoint that carries the leaf. Any
            # other failure (corrupt checkpoint, dtype/sharding mismatch)
            # must surface as-is, not as a confusing second-attempt error.
            if state_like.pl_mean is not None or "pl_mean" not in str(e):
                raise
            # Retry with a PL-shaped template, then drop the leaf.
            import jax.numpy as jnp

            widened = state_like.replace(pl_mean=jnp.zeros((), jnp.float32))
            try:
                restored = self._mgr.restore(
                    target, args=ocp.args.StandardRestore(widened))
            except Exception as e2:
                raise e2 from e
            return restored.replace(pl_mean=None)
        if state_like.pl_mean is not None and restored.pl_mean is None:
            restored = restored.replace(pl_mean=state_like.pl_mean)
        return restored

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def steps(self) -> list[int]:
        """All retained checkpoint steps, ascending."""
        return sorted(self._mgr.all_steps())

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
