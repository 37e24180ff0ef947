"""Device-mesh parallelism.

The reference is single-device (SURVEY.md section 2.2): its only parallelism is
share-nothing HPO across GPUs. Here the TPU-native equivalents:

- data parallel training: batch axis sharded over the mesh, parameters
  replicated; XLA inserts the gradient/batch-norm collectives over ICI from the
  sharding annotations alone (GSPMD) — no hand-written psums;
- tile-parallel inference: the continent's tile grid sharded over the mesh —
  the spatial analogue of context parallelism, with the 18-px halo handled by
  redundant overlapping reads from the replicated (or band-streamed) inputs;
- tensor (channel) parallelism (SURVEY.md 2.2 stretch goal): conv kernels
  sharded on output channels over a 2-D ('data', 'model') mesh, composing
  with DP for fully-sharded training (parallel.tp).
"""

from deepbedmap_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
)
from deepbedmap_tpu.parallel.api import (  # noqa: F401
    make_sharded_train_step,
    sharded_predict_tiles,
    stitch_tiles,
)
from deepbedmap_tpu.parallel.tp import (  # noqa: F401
    make_mesh_2d,
    make_tp_forward,
    shard_params_tp,
    tp_param_shardings,
    tp_state_shardings,
)
