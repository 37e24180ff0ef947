"""Training-tile dataset: the X/W1/W2/W3/Y array contract.

The reference saves five .npy arrays (data_prep.py:925-930) and loads them into
a Chainer DictDataset with a 95/5 split at seed 42 and a shuffling
SerialIterator of batch 128 (srgan_train.py:87-166). Here the whole dataset —
a few hundred MB at reference scale — lives as device arrays; an epoch is a
``lax.scan`` over gathered index batches, so there is no per-step host->device
transfer at all (the reference pays one per minibatch).

Deviation noted for the record: the reference's SerialIterator tops up the last
partial minibatch with examples from the following epoch; we drop the last
partial batch instead to keep shapes static under jit (28 x 128 = 3584 of 3634
reference train tiles per epoch).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


ARRAY_KEYS = ("X", "W1", "W2", "W3", "Y")

# Reference-contract NCHW channel/shape suffixes per tile (data_prep.py:745-930)
REFERENCE_SHAPES_NCHW = {
    "X": (1, 11, 11),
    "W1": (1, 110, 110),
    "W2": (2, 22, 22),
    "W3": (1, 11, 11),
    "Y": (1, 36, 36),
}


@dataclasses.dataclass
class TileDataset:
    """NHWC device-resident tile arrays, all sharing the leading tile axis."""

    arrays: Dict[str, jax.Array]

    def __post_init__(self):
        lengths = {k: v.shape[0] for k, v in self.arrays.items()}
        assert len(set(lengths.values())) == 1, f"ragged dataset: {lengths}"

    def __len__(self) -> int:
        return next(iter(self.arrays.values())).shape[0]

    @classmethod
    def from_nchw(cls, arrays: Dict[str, np.ndarray]) -> "TileDataset":
        """Accept reference-layout (N, C, H, W) float32 arrays (the .npy
        contract of data_prep.py:925-930)."""
        converted = {}
        for key in ARRAY_KEYS:
            a = np.asarray(arrays[key], np.float32)
            assert a.ndim == 4, (key, a.shape)
            converted[key] = jnp.asarray(a.transpose(0, 2, 3, 1))
        return cls(converted)

    @classmethod
    def load_npy_dir(
        cls, directory: str, expected_hash: Optional[str] = None
    ) -> "TileDataset":
        """Load X.npy/W1.npy/... from a directory (the model/train layout).

        ``expected_hash`` pins the dataset content (the reference pins a quilt
        hash, srgan_train.py:89); mismatch raises.
        """
        import os

        arrays = {
            k: np.load(os.path.join(directory, f"{k}.npy")) for k in ARRAY_KEYS
        }
        if expected_hash is not None:
            actual = content_hash(arrays)
            if actual != expected_hash:
                raise ValueError(
                    f"dataset hash mismatch: {actual} != {expected_hash}"
                )
        return cls.from_nchw(arrays)

    def save_npy_dir(self, directory: str) -> str:
        """Write the reference NCHW npy contract (data_prep.py:925-930);
        returns the content hash for pinning."""
        import os

        os.makedirs(directory, exist_ok=True)
        arrays = {}
        for k in ARRAY_KEYS:
            a = np.asarray(self.arrays[k]).transpose(0, 3, 1, 2)
            np.save(os.path.join(directory, f"{k}.npy"), a)
            arrays[k] = a
        return content_hash(arrays)

    @classmethod
    def from_package(
        cls, registry: str, name: str = "deepbedmap/model/train",
        pkg_hash: str | None = None,
    ) -> "TileDataset":
        """Restore the training arrays from a content-addressed package
        (the reference's quilt.load-by-hash path, srgan_train.py:87-125);
        every blob's sha256 is verified on the way out."""
        from deepbedmap_tpu.data.packaging import load_arrays

        loaded = load_arrays(registry, name, pkg_hash)
        arrays = {k: loaded[f"{k}_data"] for k in ARRAY_KEYS}
        return cls.from_nchw(arrays)

    @classmethod
    def synthetic(cls, n: int, seed: int = 0) -> "TileDataset":
        """Random dataset with the reference tile shapes — for tests/benches."""
        rs = np.random.RandomState(seed)
        arrays = {
            k: rs.rand(n, *REFERENCE_SHAPES_NCHW[k]).astype(np.float32)
            for k in ARRAY_KEYS
        }
        return cls.from_nchw(arrays)

    def take(self, indices) -> Dict[str, jax.Array]:
        """Gather a batch by index array — jit-able."""
        return {k: jnp.take(v, indices, axis=0) for k, v in self.arrays.items()}


def content_hash(arrays: Dict[str, np.ndarray]) -> str:
    """Deterministic sha256 of the dataset content (quilt-hash-pinning
    equivalent, SURVEY.md 2.1 'Data versioning')."""
    import hashlib

    digest = hashlib.sha256()
    for key in ARRAY_KEYS:
        a = np.ascontiguousarray(arrays[key])
        digest.update(key.encode())
        digest.update(str(a.shape).encode())
        digest.update(a.tobytes())
    return digest.hexdigest()


def train_dev_split(
    n: int, train_fraction: float = 0.95, seed: int = 42
) -> Tuple[np.ndarray, np.ndarray]:
    """Random 95/5 index split, seed 42 (srgan_train.py:132-151)."""
    rs = np.random.RandomState(seed)
    perm = rs.permutation(n)
    n_train = int(n * train_fraction)
    return perm[:n_train], perm[n_train:]


def epoch_batches(
    indices: np.ndarray, batch_size: int, rs: np.random.RandomState
) -> np.ndarray:
    """Shuffled (num_batches, batch_size) index matrix; drops the last partial
    batch to keep shapes static (see module docstring)."""
    shuffled = rs.permutation(indices)
    n_batches = len(shuffled) // batch_size
    if n_batches == 0:
        raise ValueError(
            f"dataset split of {len(indices)} tiles smaller than one batch "
            f"({batch_size}); lower batch_size"
        )
    return shuffled[: n_batches * batch_size].reshape(n_batches, batch_size)
