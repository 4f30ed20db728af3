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

        Migration: ``pl_mean`` and ``ada_p`` are OPTIONAL leaves (None
        when path-length regularization / ADA is not configured —
        train/state.py). A checkpoint written without one restores as
        None even when the current config enables the feature; backfill
        the template's fresh value so the first step doesn't crash. The
        reverse (a checkpoint carrying the leaf into a config without
        it) restores through a widened template and then drops the leaf.
        """
        target = step if step is not None else self._mgr.latest_step()
        if target is None:
            return None
        optional = ("pl_mean", "ada_p")
        try:
            restored = self._mgr.restore(
                target, args=ocp.args.StandardRestore(state_like))
        except Exception as e:
            # Only a structure mismatch on the optional leaves is
            # migratable: a None-leaved template vs a checkpoint that
            # carries the value. Any other failure (corrupt checkpoint,
            # dtype/sharding mismatch) must surface as-is, not as a
            # confusing second-attempt error.
            import jax.numpy as jnp

            todo = [n for n in optional
                    if getattr(state_like, n) is None and n in str(e)]
            if not todo:
                raise
            widened = state_like.replace(
                **{n: jnp.zeros((), jnp.float32) for n in todo})
            try:
                restored = self._mgr.restore(
                    target, args=ocp.args.StandardRestore(widened))
            except Exception as e2:
                raise e2 from e
            return restored.replace(**{n: None for n in todo})
        for name in optional:
            if getattr(state_like, name) is not None \
                    and getattr(restored, name) is None:
                restored = restored.replace(
                    **{name: getattr(state_like, name)})
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
