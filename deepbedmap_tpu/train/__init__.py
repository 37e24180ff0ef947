"""Training subsystem: fused jitted GAN steps, epoch scans, checkpoints, HPO glue.

Reference mapping (SURVEY.md sections 2.1/3.1):
- ``steps``      — train_eval_discriminator / train_eval_generator
                   (srgan_train.py:1084-1263) fused into one jitted train_step
- ``loop``       — trainer() epoch loop (srgan_train.py:1267-1329) as a lax.scan
- ``state``      — model/optimizer state pytrees (Chainer links + two Adams,
                   srgan_train.py:1014-1055)
- ``checkpoint`` — Orbax save/restore; Chainer-npz import shim
                   (srgan_train.py:1333-1383)
"""

from deepbedmap_tpu.train.state import GANState, create_gan_state  # noqa: F401
from deepbedmap_tpu.train.steps import (  # noqa: F401
    make_train_step,
    make_eval_step,
    StepMetrics,
)
from deepbedmap_tpu.train.loop import train_epoch, fit  # noqa: F401
