"""Learner-style API, mirroring the reference's orchestration classes.

The reference exposes ``ResNetGANLearner`` / ``ProGANLearner`` /
``StyleGANLearner`` objects holding G, D, G-EMA and optimizers with
train/checkpoint/sample methods (``gan_lab/{resnetgan,progan,stylegan}/
learner.py``, SURVEY.md 2.2). Here each is a thin veneer over the functional
``Trainer`` — the state lives in one jit-friendly pytree, not in the object —
so users migrating from the reference keep a familiar surface while the
execution model stays TPU-native.
"""

from __future__ import annotations

import jax

from ganlab_tpu.config import Config, get_config
from ganlab_tpu.train.loop import Trainer


class Learner:
    """Base learner: wraps a Trainer with reference-flavored methods."""

    DEFAULT_PRESET: str = "stylegan-256"
    MODEL: str | None = None

    def __init__(self, config: Config | None = None, workdir: str = ".",
                 **overrides):
        if config is None:
            config = get_config(self.DEFAULT_PRESET, **overrides)
        elif overrides:
            raise ValueError("pass either a Config or overrides, not both")
        if self.MODEL and config.model.model != self.MODEL:
            raise ValueError(
                f"{type(self).__name__} expects model={self.MODEL!r}, "
                f"config has {config.model.model!r}")
        self.trainer = Trainer(config, workdir=workdir)

    # -- reference-surface methods ------------------------------------
    @property
    def config(self) -> Config:
        return self.trainer.cfg

    @property
    def state(self):
        return self.trainer.state

    def train(self, max_steps: int | None = None):
        """The alternating G/D loop over the progressive schedule."""
        return self.trainer.train(max_steps=max_steps)

    def save_model(self) -> None:
        """Checkpoint G, D, G-EMA, optimizers and schedule position."""
        self.trainer.save_checkpoint()
        self.trainer.ckpt.wait()

    def load_model(self) -> bool:
        """Restore the latest checkpoint; True if one existed.

        Mirrors Trainer.__init__: the restored host-side state is
        re-replicated over the trainer's mesh, and cached steppers are
        dropped so their lazy-regularization counters re-seed from the
        restored optimizer step."""
        trainer = self.trainer
        restored = trainer.ckpt.restore(jax.device_get(trainer.state))
        if restored is None:
            return False
        if trainer.mesh is not None:
            from ganlab_tpu.parallel import replicate

            restored = replicate(restored, trainer.mesh)
        trainer.state = restored
        trainer._steps.clear()
        return True

    def gen_samples(self, tag: str = "samples",
                    psi: float | None = None) -> str:
        """Save a fixed-z image grid from G-EMA (truncation for StyleGAN)."""
        return self.trainer.save_samples(tag=tag, psi=psi)

    def close(self) -> None:
        self.trainer.close()


class ResNetGANLearner(Learner):
    DEFAULT_PRESET = "resnetgan-cifar10"
    MODEL = "resnetgan"


class ProGANLearner(Learner):
    DEFAULT_PRESET = "progan-128"
    MODEL = "progan"


class StyleGANLearner(Learner):
    DEFAULT_PRESET = "stylegan-256"
    MODEL = "stylegan"
