"""deepbedmap_tpu — a TPU-native (JAX/XLA/Pallas/pjit) super-resolution DEM framework.

A ground-up rebuild of the capabilities of weiji14/deepbedmap (see SURVEY.md): an
end-to-end pipeline that 4x super-resolves Antarctica's 1000 m BEDMAP2 bed-elevation
DEM into a 250 m bed DEM with an adapted ESRGAN generator conditioned on REMA ice
surface elevation, MEaSUREs ice velocity, and snow accumulation rasters.

Package layout (maps to reference layers, SURVEY.md section 1):

- ``data``      — manifest / vector->raster gridding / tiling  (L0-L3)
- ``ops``       — JAX/Pallas numerical kernels: deformable conv, SSIM, losses,
                  tension-spline gridding, bilinear window reads       (L1/L2/L4)
- ``models``    — flax generator (RRDB ESRGAN) + VGG discriminator     (L4)
- ``train``     — fused jitted D+G train step, epoch scan, checkpoints (L4/L7)
- ``parallel``  — mesh construction, sharding rules, halo exchange     (new: TPU)
- ``inference`` — halo'd tile-predict-stitch engine, continent scale   (L5)
- ``evalx``     — grdtrack-style point sampling, RMSE/PSNR/SSIM eval   (L6)
- ``hpo``       — self-contained hyperparameter search (TPE-lite + Hyperband) (L7)
- ``viz``       — figures / roughness analysis                         (L8)
"""

__version__ = "0.1.0"

from deepbedmap_tpu.config import (  # noqa: F401
    GeneratorConfig,
    DiscriminatorConfig,
    LossConfig,
    TrainConfig,
    InferenceConfig,
)
from deepbedmap_tpu.api import DeepBedMap  # noqa: F401
