"""Serving tests: the HTTP inference service exercised over loopback with a
tiny model — healthz, predict (NetCDF out, raster cache), evaluate, and
error surfacing."""

import json
import threading
import urllib.request

import numpy as np
import pandas as pd
import pytest

from deepbedmap_tpu import DeepBedMap, GeneratorConfig
from deepbedmap_tpu.data.raster import Raster, read_netcdf, write_netcdf
from deepbedmap_tpu.serve import make_server

TINY = GeneratorConfig(num_residual_blocks=1)


def _rasters():
    rs = np.random.RandomState(0)

    def r(h, w, res):
        return Raster(
            rs.rand(h, w).astype(np.float32), left=-5000.0, top=35000.0, res=res
        )

    return {
        "bed_lowres": r(40, 40, 1000.0),
        "surface": r(400, 400, 100.0),
        "velocity_x": r(90, 90, 450.0),
        "velocity_y": r(90, 90, 450.0),
        "accumulation": r(40, 40, 1000.0),
    }


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    raster_paths = {}
    for name, raster in _rasters().items():
        p = str(tmp / f"{name}.nc")
        write_netcdf(raster, p)
        raster_paths[name] = p

    dbm = DeepBedMap(cfg=TINY)
    srv = make_server(dbm, data_root=str(tmp))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_port}", raster_paths, tmp
    srv.shutdown()
    thread.join(timeout=5)


def test_healthz(server):
    base, _, _ = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        body = json.loads(resp.read())
    assert body["status"] == "ok"
    assert body["model"]["num_residual_blocks"] == 1


def test_predict_roundtrip(server):
    base, raster_paths, tmp = server
    out = str(tmp / "dem.nc")
    status, body = _post(
        base,
        "/predict",
        {
            "bounds": [1000.0, 1000.0, 10000.0, 10000.0],
            "rasters": raster_paths,
            "out": out,
        },
    )
    assert status == 200, body
    assert body["shape"] == [36, 36]
    dem = read_netcdf(out)
    assert dem.bounds == (1000.0, 1000.0, 10000.0, 10000.0)
    assert np.isfinite(dem.data).all()

    # same-shape second request reuses the jitted executable (fast path);
    # just assert it still answers correctly
    status2, body2 = _post(
        base,
        "/predict",
        {"bounds": [2000.0, 2000.0, 11000.0, 11000.0], "rasters": raster_paths},
    )
    assert status2 == 200 and body2["shape"] == [36, 36]


def test_evaluate_endpoint(server):
    base, raster_paths, tmp = server
    dem = read_netcdf(raster_paths["bed_lowres"])
    rs = np.random.RandomState(3)
    tx = rs.uniform(0, 30000, 50)
    ty = rs.uniform(5000, 30000, 50)
    import jax.numpy as jnp

    from deepbedmap_tpu.evalx import grdtrack

    tz = np.asarray(
        grdtrack(
            jnp.asarray(dem.data), jnp.asarray(tx), jnp.asarray(ty),
            dem.left, dem.top, dem.res,
        )
    )
    track = str(tmp / "track.csv")
    pd.DataFrame({"x": tx, "y": ty, "z": tz}).to_csv(track, index=False)
    status, body = _post(
        base, "/evaluate", {"dem": raster_paths["bed_lowres"], "track": track}
    )
    assert status == 200
    assert body["rmse_m"] < 1e-4  # exact self-samples
    assert body["points"] == 50


def test_dem_product_endpoint(server):
    """/dem serves crops of a finished GeoTIFF product through windowed
    reads: bounds- and pixel-window selection, overview pages, stats,
    inline values, NetCDF out, and the window cap."""
    from deepbedmap_tpu.data.geotiff import GeoTiffStripWriter

    base, _, tmp = server
    rs = np.random.RandomState(7)
    data = (rs.rand(64, 80) * 1000 - 200).astype(np.float32)
    data[5, :4] = np.nan
    w = GeoTiffStripWriter(
        str(tmp / "product.tif"), height=64, width=80,
        left=10000.0, top=74000.0, res=125.0,
        dtype=np.int16, nodata=-2000.0, compress=True, overviews=1,
    )
    w.write_strip(data)
    w.close()
    want = np.where(np.isfinite(data), data, -2000.0).astype(np.int16)

    # pixel window + inline values (nodata -> null)
    code, body = _post(base, "/dem", {
        "product": "product.tif", "rows": [5, 7], "cols": [0, 6],
        "values": True,
    })
    assert code == 200, body
    assert body["shape"] == [2, 6]
    assert body["left"] == 10000.0 and body["top"] == 74000.0 - 5 * 125.0
    got = body["values"]
    assert got[0][:4] == [None] * 4
    assert got[0][4] == float(want[5, 4])

    # bounds selection + NetCDF out + stats
    out = "crop.nc"
    code, body = _post(base, "/dem", {
        "product": "product.tif",
        "bounds": [10000.0 + 10 * 125.0, 74000.0 - 30 * 125.0,
                   10000.0 + 30 * 125.0, 74000.0 - 10 * 125.0],
        "out": out,
    })
    assert code == 200, body
    assert body["shape"] == [20, 20]
    back = read_netcdf(str(tmp / out))
    np.testing.assert_allclose(
        back.data, want[10:30, 10:30].astype(np.float32)
    )
    assert back.res == 125.0
    assert body["stats"]["valid_pct"] == 100.0

    # overview page
    code, body = _post(base, "/dem", {
        "product": "product.tif", "rows": [0, 32], "cols": [0, 40],
        "page": 1,
    })
    assert code == 200, body
    assert body["shape"] == [32, 40] and body["res"] == 250.0

    # caps and confinement
    code, body = _post(base, "/dem", {
        "product": "product.tif", "rows": [0, 64], "cols": [0, 80],
        "values": True,
    })
    assert code == 200  # 5120 px <= inline cap
    code, body = _post(base, "/dem", {"product": "../escape.tif",
                                      "rows": [0, 1]})
    assert code == 403


def test_error_surfacing(server):
    base, _, _ = server
    status, body = _post(base, "/predict", {"bounds": [0, 0, 1000, 1000], "rasters": {}})
    assert status == 500
    assert "error" in body


def test_path_escape_rejected(server):
    """Requests naming paths outside data_root must get 403, not file access
    (ADVICE r2: arbitrary server-side path probing)."""
    base, raster_paths, _ = server
    for bad in ("/etc/passwd", "../../etc/passwd"):
        status, body = _post(
            base,
            "/predict",
            {
                "bounds": [1000.0, 1000.0, 10000.0, 10000.0],
                "rasters": {**raster_paths, "bed_lowres": bad},
            },
        )
        assert status == 403, body
        assert "escapes data root" in body["error"]
    # and the out path is confined too
    status, body = _post(
        base,
        "/predict",
        {
            "bounds": [1000.0, 1000.0, 10000.0, 10000.0],
            "rasters": raster_paths,
            "out": "/tmp/evil.nc",
        },
    )
    assert status == 403, body


def test_oversize_body_and_window_rejected(server):
    base, raster_paths, _ = server
    # window cap: default max_window_px=8192 at 250 m/px = 2048 km
    status, body = _post(
        base,
        "/predict",
        {"bounds": [0.0, 0.0, 3e9, 3e9], "rasters": raster_paths},
    )
    assert status == 500 and "max_window_px" in body["error"]


def test_huge_padding_rejected(server):
    """Client padding expands every raster crop — uncapped it re-opens the
    resource hole max_window_px closes."""
    base, raster_paths, _ = server
    status, body = _post(
        base,
        "/predict",
        {
            "bounds": [0.0, 0.0, 1000.0, 1000.0],
            "rasters": raster_paths,
            "padding": 1e9,
        },
    )
    assert status == 500 and "padding" in body["error"]
    status, body = _post(
        base,
        "/predict",
        {
            "bounds": [0.0, 0.0, 1000.0, 1000.0],
            "rasters": raster_paths,
            "padding": -1.0,
        },
    )
    assert status == 500 and "padding" in body["error"]


def test_negative_content_length_rejected(server):
    """Content-Length: -1 would make rfile.read(-1) buffer the stream to EOF,
    bypassing max_body_bytes."""
    import http.client

    base, _, _ = server
    host = base.removeprefix("http://")
    conn = http.client.HTTPConnection(host, timeout=30)
    try:
        conn.putrequest("POST", "/predict", skip_accept_encoding=True)
        conn.putheader("Content-Length", "-1")
        conn.endheaders()
        resp = conn.getresponse()
        body = json.loads(resp.read())
        assert resp.status == 500 and "cap" in body["error"]
    finally:
        conn.close()


def test_bearer_token_required(tmp_path):
    dbm = DeepBedMap(cfg=TINY)
    srv = make_server(dbm, data_root=str(tmp_path), token="s3cret")
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        # healthz stays open (load-balancer probes)
        with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
            assert resp.status == 200
        status, body = _post(base, "/evaluate", {"dem": "x", "track": "y"})
        assert status == 401
        req = urllib.request.Request(
            base + "/evaluate",
            data=json.dumps({"dem": "missing.nc", "track": "t.csv"}).encode(),
            headers={"Authorization": "Bearer s3cret"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                status = resp.status
        except urllib.error.HTTPError as e:
            status = e.code
        assert status != 401  # authorized; fails later on the missing file
    finally:
        srv.shutdown()
        thread.join(timeout=5)


def test_bucketed_windows_match_direct_predict(tmp_path):
    """bucket_px bounds the distinct-jit-shape count by rounding windows up
    to power-of-two buckets; the sliced-back result must equal a direct
    predict of the requested bounds (same pixels, same origin)."""
    tmp = tmp_path
    raster_paths = {}
    rasters = _rasters()
    for name, raster in rasters.items():
        p = str(tmp / f"{name}.nc")
        write_netcdf(raster, p)
        raster_paths[name] = p

    dbm = DeepBedMap(cfg=TINY)
    with pytest.raises(ValueError):
        make_server(dbm, data_root=str(tmp), bucket_px=6)  # not a multiple of 4
    srv = make_server(dbm, data_root=str(tmp), bucket_px=8)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        # 3000x2000 m at 250 m/px = 12x8 px -> buckets to 16x8
        bounds = [0.0, 25000.0, 3000.0, 27000.0]
        out = str(tmp / "bucketed.nc")
        status, body = _post(
            base, "/predict",
            {"bounds": bounds, "rasters": raster_paths, "out": out},
        )
        assert status == 200, body
        assert body["shape"] == [8, 12]  # requested px, not the bucket
        got = read_netcdf(out)
        # contract: identical to predicting the expanded (bucketed) window
        # and cropping — NOT to a direct small-window predict, whose east/
        # south edge pixels see padding instead of real raster context
        bucketed = dbm.predict((0.0, 25000.0, 4000.0, 27000.0), rasters)
        np.testing.assert_allclose(
            got.data, bucketed.data[:8, :12], rtol=1e-5, atol=1e-6
        )
        assert got.left == 0.0 and got.top == 27000.0 and got.res == 250.0
    finally:
        srv.shutdown()
        thread.join(timeout=5)


def test_cache_invalidates_on_rewrite(server):
    """A rewritten raster file must not be served stale (ADVICE r2: cache
    keyed by path only)."""
    base, raster_paths, tmp = server
    dem_a = Raster(
        np.full((4, 4), 7.0, np.float32), left=0.0, top=4000.0, res=1000.0
    )
    p = str(tmp / "mutable.nc")
    write_netcdf(dem_a, p)
    track = str(tmp / "flat_track.csv")
    pd.DataFrame({"x": [1500.0], "y": [1500.0], "z": [7.0]}).to_csv(
        track, index=False
    )
    status, body = _post(base, "/evaluate", {"dem": p, "track": track})
    assert status == 200 and body["rmse_m"] < 1e-6
    # rewrite the file with different values; the cached raster is stale now
    import os as _os
    import time as _time

    write_netcdf(
        Raster(np.full((4, 4), 9.0, np.float32), left=0.0, top=4000.0, res=1000.0),
        p,
    )
    _os.utime(p, ns=(_time.time_ns(), _time.time_ns() + 1))  # force mtime change
    status, body = _post(base, "/evaluate", {"dem": p, "track": track})
    assert status == 200
    assert abs(body["rmse_m"] - 2.0) < 1e-6  # z=7 vs new dem=9
