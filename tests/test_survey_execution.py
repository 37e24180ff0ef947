"""Execute (not just parse) every bundled survey pipeline config.

Round-2 verdict: the 11 configs were parse-tested but never driven through
ascii_to_xyz -> get_region(mode='surface') -> xyz_to_grid on actual bytes.
Here each config gets a synthetic miniature file in its exact format (junk
header rows, junk columns, converters + dropcols, '*' NaN markers, zip
packaging, multi-file globs, 4326->3031 reprojection — see
tests/survey_fixtures.py) and must recover the known point table; a
representative subset then grids to a raster that reproduces the synthetic
bed surface. Ref: data_prep.py:259-453.
"""

import os

import numpy as np
import pytest

from deepbedmap_tpu.data.gridder import get_region, xyz_to_grid
from deepbedmap_tpu.data.pipeline import ascii_to_xyz, list_survey_configs

from tests.survey_fixtures import bed_elevation, make_survey_miniature

CONFIGS = list_survey_configs()
assert len(CONFIGS) == 11, CONFIGS


@pytest.mark.parametrize(
    "config", CONFIGS, ids=[os.path.basename(c)[:-5] for c in CONFIGS]
)
def test_survey_config_executes(config, tmp_path):
    """ascii_to_xyz on a format-exact miniature recovers the point table."""
    expected = make_survey_miniature(config, str(tmp_path))
    df = ascii_to_xyz(config, data_dir=str(tmp_path))
    assert list(df.columns) == ["x", "y", "z"]
    assert len(df) == len(expected)
    np.testing.assert_allclose(df["x"].to_numpy(), expected["x"].to_numpy(), rtol=1e-9)
    np.testing.assert_allclose(df["y"].to_numpy(), expected["y"].to_numpy(), rtol=1e-9)
    np.testing.assert_allclose(df["z"].to_numpy(), expected["z"].to_numpy(), rtol=1e-9)


# one per format family: tab+glob, CReSIS converter+reprojection, zip+'\s+'
# +na_values, plain csv — the gridding math itself is pinned by
# tests/test_gridder.py; this proves each family's bytes survive the FULL
# survey -> grid path
GRID_REPRESENTATIVES = [
    "2007tx",
    "20xx_Antarctica_TO",
    "WISE_ISODYN_RadarByFlight",
    "bed_depth_below_WGS84_datum",
]


@pytest.mark.parametrize("name", GRID_REPRESENTATIVES)
def test_survey_grids_to_bed_surface(name, tmp_path):
    """survey bytes -> xyz -> get_region('surface') -> xyz_to_grid reproduces
    the synthetic bed surface on data cells."""
    config = next(c for c in CONFIGS if os.path.basename(c) == name + ".json")
    make_survey_miniature(config, str(tmp_path), n_points=2500)
    df = ascii_to_xyz(config, data_dir=str(tmp_path))
    region = get_region(df, 250, mode="surface")
    raster = xyz_to_grid(df, region, spacing=250.0)

    h, w = raster.data.shape
    xs = raster.left + (np.arange(w) + 0.5) * raster.res
    ys = raster.top - (np.arange(h) + 0.5) * raster.res
    xx, yy = np.meshgrid(xs, ys)
    truth = bed_elevation(xx, yy)
    finite = np.isfinite(raster.data)
    assert finite.mean() > 0.5  # most cells near data

    # evaluate interpolation on cells actually containing/adjacent to data —
    # cells further out (the mask keeps up to mask_cell_radius=3 away, and
    # reprojected footprints are rotated quads with data-free corners) are
    # extrapolation, not the surface-fit claim under test
    occupied = np.zeros((h, w), bool)
    ix = np.clip(((df["x"] - raster.left) / raster.res).astype(int), 0, w - 1)
    iy = np.clip(((raster.top - df["y"]) / raster.res).astype(int), 0, h - 1)
    occupied[iy, ix] = True
    near = occupied.copy()
    near[1:] |= occupied[:-1]
    near[:-1] |= occupied[1:]
    near[:, 1:] |= occupied[:, :-1]
    near[:, :-1] |= occupied[:, 1:]
    sel = near & finite
    err = np.abs(raster.data[sel] - truth[sel])
    assert np.median(err) < 10.0, float(np.median(err))
    assert np.percentile(err, 90) < 40.0, float(np.percentile(err, 90))
