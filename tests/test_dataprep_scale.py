"""Reference-cardinality data-prep rehearsal (VERDICT round-4 item 8).

Drives the FULL L1->L3 path at the reference's geometry — 11 surveys
(every packaged pipeline config) -> ascii_to_xyz -> get_region ->
xyz_to_grid -> 36 px windows at step 3 -> grounding-line polygon filter ->
~3800 tiles -> X/W1/W2/W3/Y arrays — on synthetic bytes/rasters, timed.
The reference build produces 3826 tiles from the same stage sequence
(data_prep.py:745-930); the small fixtures elsewhere prove correctness,
this proves the pipeline at scale and gives data-prep a throughput number
(recorded in benchmarks/RESULTS.md round 5).
"""


import os
import time

import numpy as np
import pytest

from deepbedmap_tpu.data.builder import build_training_arrays
from deepbedmap_tpu.data.gridder import get_region, xyz_to_grid
from deepbedmap_tpu.data.pipeline import ascii_to_xyz, list_survey_configs
from deepbedmap_tpu.data.raster import Raster
from deepbedmap_tpu.data.windows import filter_within_polygon, get_window_bounds
from tests.survey_fixtures import bed_elevation, make_survey_miniature

SPAN = 23_000.0       # m per survey patch -> ~93 px at 250 m
PITCH = 26_000.0      # mosaic pitch (3 km gap between patches)


@pytest.mark.slow
def test_reference_cardinality_data_prep(tmp_path):
    configs = sorted(list_survey_configs())
    assert len(configs) == 11  # the reference's 11 highres pipelines

    # lay the 11 surveys out as a 4x3 mosaic in EPSG:3031 near the West
    # Antarctica patch the reprojection fixtures use
    from deepbedmap_tpu.data.proj import lonlat_to_xy

    cx, cy = lonlat_to_xy(np.array([-99.9]), np.array([-75.99]))
    base = (float(cx[0]), float(cy[0]))

    t0 = time.time()
    highres = {}
    window_bounds = {}
    raw_counts = {}
    for k, cfg in enumerate(configs):
        name = os.path.splitext(os.path.basename(cfg))[0]
        origin = (base[0] + (k % 4) * PITCH, base[1] + (k // 4) * PITCH)
        d = tmp_path / name
        d.mkdir()
        make_survey_miniature(
            cfg, str(d), n_points=12_000, seed=100 + k, span_m=SPAN,
            origin=origin,
        )
        xyz = ascii_to_xyz(cfg, data_dir=str(d))           # L1: parse
        raw_counts[name] = len(xyz)
        region = get_region(xyz)                           # L1: region
        raster = xyz_to_grid(xyz, region, spacing=250)     # L1: grid
        highres[name] = raster
        window_bounds[name] = get_window_bounds(raster)    # L2: windows
    t_grid = time.time() - t0

    total_windows = sum(len(b) for b in window_bounds.values())
    assert total_windows > 3000, total_windows

    # grounding-line filter: a polygon covering the mosaic with one corner
    # notched out — some windows must survive, some must be dropped
    xmin = base[0] - 5_000
    ymin = base[1] - 5_000
    xmax = base[0] + 4 * PITCH + 5_000
    ymax = base[1] + 3 * PITCH + 5_000
    # notch the bottom-left 20x20 km out (survey 0's patch corner): its
    # windows beyond the 10 km buffer must be dropped
    notch_x = xmin + 20_000
    notch_y = ymin + 20_000
    polygon = np.array(
        [
            (notch_x, ymin),
            (xmax, ymin),
            (xmax, ymax),
            (xmin, ymax),
            (xmin, notch_y),
            (notch_x, notch_y),
        ]
    )
    t1 = time.time()
    kept_bounds = {}
    for name, wb in window_bounds.items():
        idx = filter_within_polygon(wb, polygon, buffer=10_000.0)
        kept_bounds[name] = [wb[i] for i in idx]
    t_filter = time.time() - t1
    total_kept = sum(len(b) for b in kept_bounds.values())
    assert 0 < total_kept < total_windows  # the notch dropped windows
    assert total_kept > 2500, total_kept

    # L3: conditioning rasters over the mosaic + array build
    def grid_raster(res, pad, channels_fn):
        left = xmin - pad
        top = ymax + pad
        w = int((xmax + pad - left) / res)
        h = int((top - (ymin - pad)) / res)
        ys = top - (np.arange(h) + 0.5) * res
        xs = left + (np.arange(w) + 0.5) * res
        return Raster(
            data=channels_fn(*np.meshgrid(xs, ys)).astype(np.float32),
            left=float(left), top=float(top), res=float(res), nodata=None,
        )

    lowres = grid_raster(1000.0, 4000.0, bed_elevation)
    surface = grid_raster(
        100.0, 4000.0, lambda x, y: bed_elevation(x, y) + 1500.0
    )
    vx = grid_raster(500.0, 4000.0, lambda x, y: 0.001 * (x - base[0]))
    vy = grid_raster(500.0, 4000.0, lambda x, y: 0.001 * (y - base[1]))
    accum = grid_raster(1000.0, 4000.0, lambda x, y: 0.2 + 0 * x)

    t2 = time.time()
    dataset = build_training_arrays(
        highres={k: v for k, v in highres.items() if kept_bounds[k]},
        window_bounds={k: v for k, v in kept_bounds.items() if v},
        lowres=lowres,
        surface=surface,
        velocity=(vx, vy),
        accumulation=accum,
        out_dir=str(tmp_path / "model"),
    )
    t_build = time.time() - t2

    n = dataset.arrays["X"].shape[0]
    assert n > 2500, n
    # the reference shape contract at full cardinality (device arrays are
    # NHWC; the persisted .npy files carry the reference's NCHW layout)
    assert dataset.arrays["X"].shape == (n, 11, 11, 1)
    assert dataset.arrays["W1"].shape == (n, 110, 110, 1)
    assert dataset.arrays["W2"].shape == (n, 22, 22, 2)
    assert dataset.arrays["W3"].shape == (n, 11, 11, 1)
    assert dataset.arrays["Y"].shape == (n, 36, 36, 1)
    x_npy = np.load(tmp_path / "model" / "X_data.npy")
    assert x_npy.shape == (n, 1, 11, 11)
    for k, a in dataset.arrays.items():
        assert np.isfinite(a).all(), k
    # persisted artifacts with content pin
    assert os.path.exists(tmp_path / "model" / "X_data.npy")
    assert os.path.exists(tmp_path / "model" / "CONTENT_HASH")

    total_pts = sum(raw_counts.values())
    print(
        f"\n[data-prep scale] {len(configs)} surveys, {total_pts} points: "
        f"parse+grid+windows {t_grid:.1f}s, sjoin-filter {t_filter:.2f}s "
        f"({total_windows}->{total_kept} windows), array build {t_build:.1f}s "
        f"-> {n} tiles"
    )
