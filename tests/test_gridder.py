"""Gridding tests: region rounding, blockmedian, spline reconstruction
quality, masking, registration."""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from deepbedmap_tpu.data.gridder import blockmedian, get_region, xyz_to_grid
from deepbedmap_tpu.ops.spline import (
    distance_mask,
    gridline_to_pixel,
    solve_tension_spline,
)


def test_get_region_rounds_outward():
    # Reference doctest (data_prep.py:365-370) yields '-250/9500/0/9750':
    # gmt info -Is additionally *expands* the region toward grid dimensions
    # GMT surface factors well. We keep plain outward rounding to the
    # increment (the expansion is a solver-era performance quirk, not part of
    # the data contract); x in [580.8, 8324.4], y in [205.8, 9507.1]:
    xyz = pd.DataFrame(
        10000 * np.random.RandomState(seed=42).rand(30).reshape(10, 3),
        columns=["x", "y", "z"],
    )
    assert get_region(xyz) == (500.0, 8500.0, 0.0, 9750.0)


def test_blockmedian_reduces_to_cells():
    rs = np.random.RandomState(0)
    xyz = pd.DataFrame(
        {"x": rs.rand(500) * 1000, "y": rs.rand(500) * 1000, "z": rs.rand(500)}
    )
    med = blockmedian(xyz, (0, 1000, 0, 1000), spacing=250)
    assert len(med) <= 25  # at most (4+1)^2 cells
    assert {"x", "y", "z"} == set(med.columns)


def test_spline_interpolates_plane_exactly():
    """A plane satisfies both the biharmonic and Laplace equations, so the
    solver must reproduce it through sparse constraints."""
    h = w = 33
    yy, xx = np.mgrid[0:h, 0:w]
    truth = 2.0 + 0.1 * xx + 0.05 * yy
    rs = np.random.RandomState(1)
    mask = rs.rand(h, w) < 0.15
    mask[0, 0] = mask[-1, -1] = mask[0, -1] = mask[-1, 0] = True
    data = np.where(mask, truth, 0.0)

    z = np.asarray(
        solve_tension_spline(
            jnp.asarray(data, jnp.float32), jnp.asarray(mask), tension=0.35,
            iterations=800,
        )
    )
    # interior is ~1e-4-exact; boundary nodes carry the free-BC approximation
    np.testing.assert_allclose(z, truth, atol=0.1)
    assert np.median(np.abs(z - truth)) < 1e-3


def test_spline_smooth_surface_reconstruction():
    h = w = 33
    yy, xx = np.mgrid[0:h, 0:w]
    truth = np.sin(xx / 8.0) * np.cos(yy / 9.0) * 10.0
    rs = np.random.RandomState(2)
    mask = rs.rand(h, w) < 0.3
    data = np.where(mask, truth, 0.0)
    z = np.asarray(
        solve_tension_spline(
            jnp.asarray(data, jnp.float32), jnp.asarray(mask), tension=0.35,
            iterations=800,
        )
    )
    err = np.abs(z - truth)
    assert np.median(err) < 0.5, np.median(err)


def test_distance_mask():
    has = np.zeros((9, 9), bool)
    has[4, 4] = True
    far = distance_mask(has, radius=2)
    assert not far[4, 4] and not far[2, 2] and not far[6, 6]
    assert far[0, 0] and far[4, 7]


def test_gridline_to_pixel():
    z = jnp.asarray(np.arange(9.0).reshape(3, 3))
    pix = np.asarray(gridline_to_pixel(z))
    assert pix.shape == (2, 2)
    np.testing.assert_allclose(pix, [[2.0, 3.0], [5.0, 6.0]])


def test_xyz_to_grid_end_to_end():
    # reference doctest shape contract: seeded 20 points in 600x600 -> 3x3
    # pixel-registered grid (data_prep.py:393-404)
    xyz = pd.DataFrame(
        600 * np.random.RandomState(seed=42).rand(60).reshape(20, 3),
        columns=["x", "y", "z"],
    )
    region = get_region(xyz)
    raster = xyz_to_grid(xyz, region, spacing=250, iterations=200)
    assert raster.data.shape == (3, 3)
    assert raster.res == 250.0
    finite = np.isfinite(raster.data)
    assert finite.any()
    # values must lie within the data range (no wild overshoot)
    zmin, zmax = xyz.z.min(), xyz.z.max()
    vals = raster.data[finite]
    assert vals.min() > zmin - 200 and vals.max() < zmax + 200


def test_spline_agrees_with_thin_plate_rbf():
    """Independent-solver check: at zero tension the variational problem is
    the thin-plate (biharmonic) spline, so scipy's RBFInterpolator with the
    same node constraints must produce a closely matching interior (boundary
    conditions legitimately differ: RBF is global, our solver has free local
    edges)."""
    from scipy.interpolate import RBFInterpolator

    rs = np.random.RandomState(3)
    h = w = 33
    px = rs.uniform(0, w - 1, 60)
    py = rs.uniform(0, h - 1, 60)
    pz = np.sin(px / 6.0) * np.cos(py / 7.0) * 10 + 0.3 * px

    data = np.zeros((h, w), np.float32)
    mask = np.zeros((h, w), bool)
    for x_, y_, z_ in zip(np.round(px).astype(int), np.round(py).astype(int), pz):
        data[y_, x_] = z_
        mask[y_, x_] = True

    ours = np.asarray(
        solve_tension_spline(
            jnp.asarray(data), jnp.asarray(mask), tension=0.0, iterations=600
        )
    )
    pts = np.argwhere(mask)[:, ::-1].astype(float)
    rbf = RBFInterpolator(pts, data[mask], kernel="thin_plate_spline")
    gy, gx = np.mgrid[0:h, 0:w]
    theirs = rbf(np.stack([gx.ravel(), gy.ravel()], -1)).reshape(h, w)

    rng = theirs.max() - theirs.min()
    diff = np.abs(ours - theirs)[4:-4, 4:-4] / rng
    assert np.median(diff) < 0.01, np.median(diff)
    assert diff.max() < 0.10, diff.max()
