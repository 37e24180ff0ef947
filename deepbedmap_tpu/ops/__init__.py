"""JAX/XLA/Pallas numerical kernels.

Everything in here is functional, jit-able, and NHWC-native (TPU's preferred
layout). The reference reaches equivalent functionality through cuDNN via Chainer
and through GMT's C library (SURVEY.md section 2.3); here it is all expressed as
XLA programs, with Pallas kernels for the ops XLA has no primitive for
(deformable convolution) or where fusion wins.
"""

from deepbedmap_tpu.ops.resize import (  # noqa: F401
    nearest_upsample,
    space_to_depth,
    avg_pool,
)
from deepbedmap_tpu.ops.ssim import ssim  # noqa: F401
from deepbedmap_tpu.ops.metrics import psnr, rmse  # noqa: F401
from deepbedmap_tpu.ops.losses import (  # noqa: F401
    sigmoid_cross_entropy,
    ragan_loss,
    generator_loss,
    binary_accuracy,
)
from deepbedmap_tpu.ops.deform_conv import deform_conv2d  # noqa: F401
