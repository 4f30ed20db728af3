"""Small host-side utilities: latent sampling, image grids, metric logging."""

from ganlab_tpu.utils.image import to_uint8, save_image_grid
from ganlab_tpu.utils.latents import gen_latents
from ganlab_tpu.utils.logging import MetricLogger
