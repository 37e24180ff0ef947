"""Neural network definitions (flax.linen, NHWC).

Reference parity targets (SURVEY.md section 2.1):
- GeneratorModel: 8,907,749 parameters, (1,1,11,11)+(1,1,110,110)+(1,2,22,22)
  +(1,1,11,11) -> (1,1,36,36)                     (srgan_train.py:437-447)
- DiscriminatorModel: 10,370,761 parameters after first call on (N,1,36,36)
                                                   (srgan_train.py:601-608)
"""

from deepbedmap_tpu.models.generator import Generator  # noqa: F401
from deepbedmap_tpu.models.discriminator import Discriminator  # noqa: F401
from deepbedmap_tpu.models.api import (  # noqa: F401
    build_generator,
    build_discriminator,
    generator_forward_nchw,
    count_params,
)
from deepbedmap_tpu.models.summary import summary, param_table, to_dot  # noqa: F401
