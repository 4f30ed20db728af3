"""TPU-native op library: the reference's hot composite ops as fused XLA ops.

Every op here is a pure function on arrays in NHWC layout. These replace the
reference's torch composites (SURVEY.md section 2.1):

* equalized-LR conv / dense (runtime He-constant weight scaling)
* pixelnorm
* minibatch standard deviation
* instance norm + AdaIN style modulation
* FIR blur / fused upsample+blur / blur+downsample (upfirdn-style)
* fade-in lerp for progressive growing
* GAN losses and gradient penalties (WGAN-GP, R1)

``ganlab_tpu.ops.pallas`` holds hand-written Pallas TPU kernels for the cases
XLA does not already fuse well; each has a parity test against the pure-XLA
implementation here.
"""

from ganlab_tpu.ops.equalized import (
    he_constant,
    equalized_conv2d,
    equalized_dense,
)
from ganlab_tpu.ops.normalization import (
    pixel_norm,
    instance_norm,
    adain,
)
from ganlab_tpu.ops.minibatch_stddev import minibatch_stddev
from ganlab_tpu.ops.upfirdn import (
    binomial_kernel,
    blur2d,
    upsample_nearest_2x,
    downsample_avg_2x,
    upsample_blur_2x,
    blur_downsample_2x,
    up2_conv2d,
    compose_up2_kernel,
)
from ganlab_tpu.ops.fadein import fade_in
from ganlab_tpu.ops import losses
