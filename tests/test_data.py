"""Data-layer tests mirroring the reference doctests: selective_tile golden
array (data_prep.py:640-656), get_window_bounds golden (data_prep.py:513-521),
raster round-trips, GeoTIFF codec, projection sanity."""

import numpy as np
import pytest

from deepbedmap_tpu.data import geotiff
from deepbedmap_tpu.data.proj import lonlat_to_xy, parallel_radius, xy_to_lonlat
from deepbedmap_tpu.data.raster import Raster, read_netcdf, write_netcdf
from deepbedmap_tpu.data.tiler import selective_tile
from deepbedmap_tpu.data.windows import (
    filter_within_polygon,
    get_window_bounds,
)


def _diag_raster():
    # the reference selective_tile doctest grid: flipud(diag(arange(8))),
    # y = linspace(7, 0, 8), x = linspace(0, 7, 8)  (data_prep.py:640-644)
    data = np.flipud(np.diag(np.arange(8))).astype(np.float32)
    return Raster.from_centers(data, x=np.linspace(0, 7, 8), y=np.linspace(7, 0, 8))


def test_selective_tile_golden():
    raster = _diag_raster()
    tiles = selective_tile(
        raster, [(0.5, 0.5, 2.5, 2.5), (2.5, 1.5, 4.5, 3.5)]
    )
    expected = np.array(
        [[[[0.0, 2.0], [1.0, 0.0]]], [[[3.0, 0.0], [0.0, 0.0]]]], np.float32
    )
    np.testing.assert_array_equal(tiles, expected)


def test_selective_tile_padding_and_gapfill():
    raster = _diag_raster()
    # padding 2 reaches outside the grid (outermost centers fall past the
    # first/last cell centers) -> NaN -> gapfilled
    tiles = selective_tile(
        raster, [(0.5, 0.5, 2.5, 2.5)], padding=2.0, gapfiller=-99.0
    )
    assert tiles.shape == (1, 1, 6, 6)
    assert (tiles == -99.0).any()
    # interior must be unchanged
    np.testing.assert_array_equal(
        tiles[0, 0, 2:4, 2:4], np.array([[0.0, 2.0], [1.0, 0.0]], np.float32)
    )


def test_selective_tile_resolution_resample():
    raster = _diag_raster()
    tiles = selective_tile(raster, [(0.5, 0.5, 4.5, 4.5)], resolution=2.0)
    assert tiles.shape == (1, 1, 2, 2)


def test_get_window_bounds_golden():
    # reference doctest: 40x36 zeros, y 0.5..39.5, x 0.5..35.5 ->
    # [(0.0, 4.0, 36.0, 40.0), (0.0, 1.0, 36.0, 37.0)]  (data_prep.py:513-521)
    raster = Raster.from_centers(
        np.zeros((40, 36)), x=np.arange(0.5, 36.5), y=np.arange(0.5, 40.5)
    )
    bounds = get_window_bounds(raster)
    assert bounds == [(0.0, 4.0, 36.0, 40.0), (0.0, 1.0, 36.0, 37.0)]


def test_get_window_bounds_masks_nan():
    data = np.zeros((40, 36))
    # ascending-y row 2 -> top-down row 37: poisons only the lower window
    # (top-down rows 3-38), keeping the first window (rows 0-35)
    data[2, 10] = np.nan
    raster = Raster.from_centers(
        data, x=np.arange(0.5, 36.5), y=np.arange(0.5, 40.5)
    )
    bounds = get_window_bounds(raster)
    assert bounds == [(0.0, 4.0, 36.0, 40.0)]


def test_filter_within_polygon():
    square = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], np.float64)
    windows = [
        (10, 10, 20, 20),  # inside
        (95, 95, 105, 105),  # corner outside but within 10 buffer
        (200, 200, 210, 210),  # far outside
    ]
    assert filter_within_polygon(windows, square, buffer=10.0) == [0, 1]


def test_netcdf_roundtrip(tmp_path):
    raster = _diag_raster()
    path = str(tmp_path / "grid.nc")
    write_netcdf(raster, path)
    back = read_netcdf(path)
    np.testing.assert_array_equal(back.data, raster.data)
    assert back.left == raster.left and back.top == raster.top
    assert back.res == raster.res


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize(
    "dtype", [np.int16, np.float32]
)
def test_geotiff_roundtrip(tmp_path, compress, tiled, dtype):
    rs = np.random.RandomState(0)
    if np.issubdtype(dtype, np.integer):
        data = rs.randint(-3000, 4000, size=(37, 53)).astype(dtype)
    else:
        data = rs.randn(37, 53).astype(dtype)
    path = str(tmp_path / "t.tif")
    geotiff.write_geotiff(
        path, data, left=-100.0, top=250.0, res=2.5, nodata=-2000,
        compress=compress, tiled=tiled, tile_size=16,
    )
    back, meta = geotiff.read_geotiff(path)
    np.testing.assert_array_equal(back, data)
    assert meta["left"] == -100.0 and meta["top"] == 250.0 and meta["res"] == 2.5
    assert meta["nodata"] == -2000
    assert meta["crs_epsg"] == 3031


def test_netcdf_windowed_read(tmp_path):
    """read_netcdf(bounds=) reads only the intersecting hyperslab and must
    equal the full read followed by Raster.crop (grdcut snap semantics),
    for both y directions."""
    from deepbedmap_tpu.data.raster import Raster, read_netcdf, write_netcdf

    rs = np.random.RandomState(8)
    data = rs.rand(40, 60).astype(np.float32)
    r = Raster(data, left=1000.0, top=9000.0, res=200.0, nodata=-9.0)
    p = str(tmp_path / "w.nc")
    write_netcdf(r, p)

    bounds = (1500.0, 2300.0, 7701.0, 8500.0)  # non-pixel-aligned on purpose
    want = read_netcdf(p).crop(bounds)
    got = read_netcdf(p, bounds=bounds)
    np.testing.assert_array_equal(got.data, want.data)
    assert (got.left, got.top, got.res) == (want.left, want.top, want.res)
    assert got.nodata == -9.0

    # ascending-y file (xarray often writes bottom-up)
    import h5py

    p2 = str(tmp_path / "asc.nc")
    with h5py.File(p2, "w") as f:
        yv = f.create_dataset("y", data=(r.y_centers[::-1]).astype(np.float64))
        xv = f.create_dataset("x", data=r.x_centers.astype(np.float64))
        z = f.create_dataset("z", data=data[::-1])
        yv.make_scale("y"); xv.make_scale("x")
        z.dims[0].attach_scale(yv); z.dims[1].attach_scale(xv)
    got2 = read_netcdf(p2, bounds=bounds)
    np.testing.assert_array_equal(got2.data, want.data)
    assert (got2.left, got2.top) == (want.left, want.top)

    with pytest.raises(ValueError):
        read_netcdf(p, bounds=(1e7, 1e7, 2e7, 2e7))


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("tiled", [False, True])
def test_geotiff_windowed_read(tmp_path, compress, tiled):
    """read_geotiff_window decodes only the intersecting strips/tiles and
    returns the exact crop with window-shifted georeferencing."""
    rs = np.random.RandomState(3)
    data = rs.randint(-3000, 4000, size=(37, 53)).astype(np.int16)
    path = str(tmp_path / "w.tif")
    geotiff.write_geotiff(
        path, data, left=-100.0, top=250.0, res=2.5, nodata=-2000,
        compress=compress, tiled=tiled, tile_size=16,
    )
    for (r0, r1), cols in [
        ((0, 37), None),            # full
        ((5, 21), (7, 40)),         # interior, spans block boundaries
        ((30, 37), (48, 53)),       # bottom-right corner (ragged blocks)
        ((0, 1), (0, 1)),           # single pixel
        ((-5, 100), (-3, 99)),      # clipped to the raster
    ]:
        got, meta = geotiff.read_geotiff_window(path, (r0, r1), cols)
        cr0, cr1 = max(0, r0), min(37, r1)
        cc0, cc1 = (0, 53) if cols is None else (
            max(0, cols[0]), min(53, cols[1])
        )
        np.testing.assert_array_equal(got, data[cr0:cr1, cc0:cc1])
        assert meta["left"] == -100.0 + cc0 * 2.5
        assert meta["top"] == 250.0 - cr0 * 2.5
        assert meta["res"] == 2.5 and meta["nodata"] == -2000
    with pytest.raises(ValueError):
        geotiff.read_geotiff_window(path, (10, 10))


def test_geotiff_windowed_read_strip_writer_pages(tmp_path):
    """Windowed reads work against the streaming writer's sub-strip layout
    and its overview pages (window meta scales with the page res)."""
    from deepbedmap_tpu.data.geotiff import GeoTiffStripWriter

    rs = np.random.RandomState(4)
    data = (rs.rand(48, 64) * 1000 - 500).astype(np.float32)
    path = str(tmp_path / "sw.tif")
    w = GeoTiffStripWriter(
        path, height=48, width=64, left=0.0, top=4800.0, res=100.0,
        dtype=np.int16, nodata=-2000.0, compress=True,
        rows_per_strip=8, overviews=1,
    )
    w.write_strip(data[:24])
    w.write_strip(data[24:])
    w.close()

    full, _ = geotiff.read_geotiff(path)
    got, meta = geotiff.read_geotiff_window(path, (13, 30), (9, 50))
    np.testing.assert_array_equal(got, full[13:30, 9:50])
    assert meta["left"] == 900.0 and meta["top"] == 4800.0 - 1300.0

    lev1, _ = geotiff.read_geotiff(path, page=1)
    got1, meta1 = geotiff.read_geotiff_window(path, (3, 20), (5, 30), page=1)
    np.testing.assert_array_equal(got1, lev1[3:20, 5:30])
    assert meta1["res"] == 200.0
    assert meta1["left"] == 5 * 200.0


def test_geotiff_predictor_roundtrip(tmp_path):
    """PREDICTOR=2 horizontal differencing: exact roundtrip through our
    reader (full, windowed, overview pages), PIL/libtiff interop, smaller
    files on smooth data, and the integer-dtype guard."""
    from PIL import Image

    from deepbedmap_tpu.data.geotiff import GeoTiffStripWriter

    # smooth field: row deltas are small ints -> LZW loves it
    grid = np.add.outer(np.arange(48), np.arange(64)).astype(np.int16)
    grid += (np.sin(np.arange(64) / 5) * 10).astype(np.int16)

    sizes = {}
    for pred in (False, True):
        p = str(tmp_path / f"p{pred}.tif")
        w = GeoTiffStripWriter(
            p, height=48, width=64, left=0.0, top=4800.0, res=100.0,
            dtype=np.int16, nodata=-2000.0, compress=True,
            rows_per_strip=8, overviews=1, predictor=pred,
        )
        w.write_strip(grid.astype(np.float32))
        w.close()
        back, meta = geotiff.read_geotiff(p)
        np.testing.assert_array_equal(back, grid)
        np.testing.assert_array_equal(np.array(Image.open(p)), grid)
        win, _ = geotiff.read_geotiff_window(p, (10, 30), (5, 60))
        np.testing.assert_array_equal(win, grid[10:30, 5:60])
        lev1, _ = geotiff.read_geotiff(p, page=1)
        assert lev1.shape == (24, 32)
        import os

        sizes[pred] = os.path.getsize(p)
    assert sizes[True] < sizes[False]

    # write_geotiff path too (strip + tiled)
    for tiled in (False, True):
        p = str(tmp_path / f"wg{tiled}.tif")
        geotiff.write_geotiff(
            p, grid, left=0.0, top=48.0, res=1.0, compress=True,
            tiled=tiled, tile_size=16, predictor=True,
        )
        back, _ = geotiff.read_geotiff(p)
        np.testing.assert_array_equal(back, grid)
        np.testing.assert_array_equal(np.array(Image.open(p)), grid)

    with pytest.raises(ValueError):
        geotiff.write_geotiff(
            str(tmp_path / "bad.tif"), grid.astype(np.float32),
            left=0.0, top=48.0, res=1.0, compress=True, predictor=True,
        )
    with pytest.raises(ValueError):
        GeoTiffStripWriter(
            str(tmp_path / "bad2.tif"), height=4, width=4, left=0.0,
            top=4.0, res=1.0, dtype=np.int16, compress=False, predictor=True,
        )


def test_geotiff_bigtiff_roundtrip(tmp_path):
    data = np.arange(64 * 48, dtype=np.int16).reshape(64, 48)
    path = str(tmp_path / "big.tif")
    geotiff.write_geotiff(
        path, data, left=0.0, top=64.0, res=1.0, bigtiff=True, compress=True
    )
    back, meta = geotiff.read_geotiff(path)
    np.testing.assert_array_equal(back, data)
    assert meta["res"] == 1.0


def test_geotiff_bigtiff_overviews_predictor_window(tmp_path):
    """The 8-byte BigTIFF layout composes with every writer feature: chained
    overview pages, PREDICTOR=2, sub-strips, and windowed reads of both."""
    from deepbedmap_tpu.data.geotiff import GeoTiffStripWriter

    rs = np.random.RandomState(2)
    data = (rs.rand(40, 56) * 900).astype(np.float32)
    p = str(tmp_path / "big_ov.tif")
    w = GeoTiffStripWriter(
        p, height=40, width=56, left=0.0, top=4000.0, res=100.0,
        dtype=np.int16, nodata=-2000.0, compress=True, bigtiff=True,
        rows_per_strip=8, overviews=2, predictor=True,
    )
    w.write_strip(data)
    w.close()
    full, meta = geotiff.read_geotiff(p)
    np.testing.assert_array_equal(full, data.astype(np.int16))
    l1, m1 = geotiff.read_geotiff(p, page=1)
    assert l1.shape == (20, 28) and m1["res"] == 200.0
    win, _ = geotiff.read_geotiff_window(p, (5, 25), (10, 50))
    np.testing.assert_array_equal(win, full[5:25, 10:50])
    win1, _ = geotiff.read_geotiff_window(p, (2, 18), (3, 20), page=1)
    np.testing.assert_array_equal(win1, l1[2:18, 3:20])


def test_lzw_roundtrip():
    rs = np.random.RandomState(1)
    for payload in [
        b"",
        b"A",
        b"TOBEORNOTTOBEORTOBEORNOT",
        rs.randint(0, 256, 10000).astype(np.uint8).tobytes(),
        (b"\x00" * 5000) + rs.bytes(100),
    ]:
        assert geotiff.lzw_decode(geotiff.lzw_encode(payload)) == payload


def test_geotiff_interop_with_libtiff(tmp_path):
    """Cross-validate the LZW codec against an independent implementation
    (PIL/libtiff) in both directions."""
    from PIL import Image

    rs = np.random.RandomState(0)
    data = rs.randint(-3000, 4000, size=(200, 300)).astype(np.int16)
    ours = str(tmp_path / "ours.tif")
    geotiff.write_geotiff(ours, data, left=0, top=200, res=1, compress=True)
    np.testing.assert_array_equal(np.array(Image.open(ours)), data)

    img = rs.randint(0, 255, size=(200, 300)).astype(np.uint8)
    theirs = str(tmp_path / "pil.tif")
    Image.fromarray(img).save(theirs, compression="tiff_lzw")
    back, _ = geotiff.read_geotiff(theirs)
    np.testing.assert_array_equal(back, img)


def test_projection_roundtrip_and_scale():
    rs = np.random.RandomState(0)
    lon = rs.uniform(-180, 180, 100)
    lat = rs.uniform(-89.9, -60, 100)
    x, y = lonlat_to_xy(lon, lat)
    lon2, lat2 = xy_to_lonlat(x, y)
    # wrap-safe longitude comparison
    dlon = (np.asarray(lon2) - lon + 180) % 360 - 180
    np.testing.assert_allclose(dlon, 0, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)

    # true scale on the -71 parallel: map radius == true parallel radius
    x71, y71 = lonlat_to_xy(0.0, -71.0)
    np.testing.assert_allclose(
        np.hypot(x71, y71), parallel_radius(-71.0), rtol=1e-12
    )
    # south pole at origin; y positive toward lon 0, x toward lon 90E
    x0, y0 = lonlat_to_xy(0.0, -90.0)
    assert abs(x0) < 1e-6 and abs(y0) < 1e-6
    xe, ye = lonlat_to_xy(90.0, -80.0)
    assert xe > 0 and abs(ye) < 1e-6


def test_raster_bounds():
    # centers 0..7 with res 1 -> outer bounds extend half a pixel past
    raster = _diag_raster()
    assert raster.bounds == (-0.5, -0.5, 7.5, 7.5)
    np.testing.assert_allclose(raster.x_centers, np.arange(8.0))
    np.testing.assert_allclose(raster.y_centers, 7.0 - np.arange(8.0))


def test_raster_crop_grdcut():
    """Raster.crop = gmt grdcut -R: outward pixel-snapped, clipped, correct
    georeferencing (reference data_prep.py:478)."""
    from deepbedmap_tpu.data.raster import Raster

    data = np.arange(100, dtype=np.float32).reshape(10, 10)
    r = Raster(data, left=0.0, top=1000.0, res=100.0)

    c = r.crop((150.0, 250.0, 450.0, 750.0))
    # snapped outward: x [100, 500), y (200, 800]
    assert c.bounds == (100.0, 200.0, 500.0, 800.0)
    np.testing.assert_array_equal(c.data, data[2:8, 1:5])

    # clipped to the raster
    c2 = r.crop((-500.0, -500.0, 5000.0, 5000.0))
    assert c2.bounds == r.bounds
    np.testing.assert_array_equal(c2.data, data)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        r.crop((2000.0, 2000.0, 3000.0, 3000.0))
