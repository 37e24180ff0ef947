"""Packaged training-array builder (reference data_prep.py:745-930).

The reference composes its X/W1/W2/W3/Y training arrays inline in the
notebook: per-survey high-res tiles (no interpolation), BEDMAP2 low-res bed
with a 1 km context pad, gap-filled REMA surface elevation, MEaSUREs velocity
x/y resampled to 500 m and concatenated on the channel axis, Arthern
accumulation — then ``np.save``s the five arrays. ``build_training_arrays``
is that whole section as one function: rasters + window bounds in,
hash-pinned :class:`TileDataset` out.
"""

from __future__ import annotations

import os
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from deepbedmap_tpu.data.dataset import TileDataset, content_hash
from deepbedmap_tpu.data.raster import Raster
from deepbedmap_tpu.data.tiler import selective_tile
from deepbedmap_tpu.data.windows import Bounds


def build_training_arrays(
    highres: Mapping[str, Raster],
    window_bounds: Mapping[str, Sequence[Bounds]],
    lowres: Raster,
    surface: Raster,
    velocity: Tuple[Raster, Raster],
    accumulation: Raster,
    padding: float = 1000.0,
    velocity_resolution: float = 500.0,
    lowres_gapfiller: Optional[float] = None,
    drop_invalid: bool = True,
    out_dir: Optional[str] = None,
) -> TileDataset:
    """Assemble the X/W1/W2/W3/Y training arrays.

    Args:
      highres: per-survey gridded bed rasters keyed by survey/grid name
        (the reference groups ``tiles_3031.geojson`` rows by ``grid_name``,
        data_prep.py:745-750).
      window_bounds: per-survey window bboxes over each high-res grid
        (same keys as ``highres``).
      lowres: BEDMAP2 bed (1000 m) — tiled with a ``padding`` context ring
        into (N, 1, 11, 11) for 36 px windows (data_prep.py:766-769).
      surface: gap-filled REMA surface elevation (100 m) -> (N, 1, 110, 110).
      velocity: (VX, VY) MEaSUREs rasters, each resampled to
        ``velocity_resolution`` (500 m) and concatenated channel-wise ->
        (N, 2, 22, 22) (data_prep.py:895-909).
      accumulation: Arthern accumulation (1000 m) -> (N, 1, 11, 11).
      lowres_gapfiller: optional nodata fill for X (the reference training
        build uses none — windows are pre-filtered to valid regions; the
        inference fetcher uses -5000, deepbedmap.py:170).
      drop_invalid: drop tiles where any array still contains NaN after
        tiling (keeps the on-disk arrays finite, as the reference's
        pre-filtered windows guarantee by construction).
      out_dir: if given, ``np.save`` the five arrays there with the
        reference filenames (X_data.npy, ...) plus a content-hash pin
        (data_prep.py:925-930 + the quilt hash-pinning role).

    Returns the assembled :class:`TileDataset` (NCHW contract).
    """
    assert set(highres) == set(window_bounds), (
        set(highres),
        set(window_bounds),
    )
    names = sorted(highres)
    per_grid: List[np.ndarray] = []
    all_bounds: List[Bounds] = []
    for name in names:
        wb = list(window_bounds[name])
        if not wb:
            continue
        per_grid.append(
            selective_tile(highres[name], wb, interpolate=False)
        )
        all_bounds.extend(wb)
    assert per_grid, "no windows over any high-res grid"
    y = np.concatenate(per_grid, axis=0)

    x = selective_tile(
        lowres, all_bounds, padding=padding, gapfiller=lowres_gapfiller
    )
    w1 = selective_tile(surface, all_bounds, padding=padding)
    vx = selective_tile(
        velocity[0], all_bounds, padding=padding, resolution=velocity_resolution
    )
    vy = selective_tile(
        velocity[1], all_bounds, padding=padding, resolution=velocity_resolution
    )
    assert vx.shape == vy.shape
    w2 = np.concatenate([vx, vy], axis=1)
    w3 = selective_tile(accumulation, all_bounds, padding=padding)

    n = y.shape[0]
    assert x.shape[0] == w1.shape[0] == w2.shape[0] == w3.shape[0] == n
    # reference shape contract for 36 px @250 m windows with 1 km padding:
    # X (n,1,11,11) W1 (n,1,110,110) W2 (n,2,22,22) W3 (n,1,11,11) Y (n,1,36,36)
    arrays: Dict[str, np.ndarray] = {
        "X": x,
        "W1": w1,
        "W2": w2,
        "W3": w3,
        "Y": y,
    }

    if drop_invalid:
        ok = np.ones(n, bool)
        for a in arrays.values():
            ok &= ~np.isnan(a).any(axis=(1, 2, 3))
        if not ok.all():
            arrays = {k: a[ok] for k, a in arrays.items()}

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        for key, arr in arrays.items():
            np.save(os.path.join(out_dir, f"{key}_data.npy"), arr)
        with open(os.path.join(out_dir, "CONTENT_HASH"), "w") as f:
            f.write(content_hash(arrays) + "\n")

    return TileDataset.from_nchw(arrays)
