"""Tiled inference engine (reference L5, deepbedmap.py:629-756).

The reference's whole-continent loop is a Python for-loop of 396 independent
GPU forwards with host-side crops and stitches. Here the same halo'd
crop-predict-stitch semantics are one jitted scan over static-shape tiles
(region scale), sharded over the device mesh (continent scale), with row-band
streaming for inputs that exceed HBM.
"""

from deepbedmap_tpu.inference.engine import (  # noqa: F401
    TilePlan,
    predict_region,
    predict_region_tiled,
    make_tile_forward,
)
from deepbedmap_tpu.inference.continent import (  # noqa: F401
    predict_continent,
    predict_continent_sharded,
    predict_continent_to_geotiff,
    save_continent_dem,
)
from deepbedmap_tpu.inference.multihost import (  # noqa: F401
    predict_continent_multihost,
    predict_continent_multihost_to_geotiff,
)
