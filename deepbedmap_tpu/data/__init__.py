"""Data subsystem: manifests, gridding, tiling, datasets (reference L0-L3).

Host-side I/O (file reads, manifests) stays NumPy/pandas; everything numerical
that touches tiles is jit-able JAX (``deepbedmap_tpu.ops``).
"""

from deepbedmap_tpu.data.dataset import (  # noqa: F401
    TileDataset,
    train_dev_split,
    epoch_batches,
)
