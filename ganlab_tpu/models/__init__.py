"""Flax model zoo: ResNet-GAN, ProGAN, StyleGAN generator/discriminator pairs.

Design (SURVEY.md sections 1, 3.3): every progressive model materializes its
FULL maximum-resolution parameter pytree at init; the current resolution and
fade-in state are *call-time* arguments (resolution static per jitted phase,
alpha traced), so progressive growth never mutates module structure — it just
switches to the next compiled step function.
"""

from ganlab_tpu.models.layers import (
    EqualDense,
    EqualConv,
    NoiseInjection,
    StyleAffine,
    ConstInput,
)
from ganlab_tpu.models.resnetgan import ResNetGenerator, ResNetDiscriminator
from ganlab_tpu.models.progan import ProGenerator, ProDiscriminator
from ganlab_tpu.models.stylegan import (
    MappingNetwork,
    SynthesisNetwork,
    StyleGenerator,
)


def build_models(model_cfg):
    """Instantiate the (generator, discriminator) pair for a ModelConfig."""
    from ganlab_tpu.config import ModelConfig  # noqa: F401

    name = model_cfg.model
    if name == "resnetgan":
        g = ResNetGenerator(cfg=model_cfg)
        d = ResNetDiscriminator(cfg=model_cfg)
    elif name == "progan":
        g = ProGenerator(cfg=model_cfg)
        d = ProDiscriminator(cfg=model_cfg)
    elif name == "stylegan":
        g = StyleGenerator(cfg=model_cfg)
        d = ProDiscriminator(cfg=model_cfg, blur_resample=True)
    elif name == "stylegan2":
        from ganlab_tpu.models.stylegan2 import StyleGAN2Generator

        g = StyleGAN2Generator(cfg=model_cfg)
        d = ProDiscriminator(cfg=model_cfg, blur_resample=True)
    else:
        raise ValueError(f"unknown model {name!r}")
    return g, d
