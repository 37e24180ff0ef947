"""Model serving: a small HTTP inference service over the DeepBedMap API.

The reference has no serving story (prediction = rerunning a notebook); for
production deployment this module exposes the loaded model behind a JSON/HTTP
surface (stdlib-only, threaded):

    GET  /healthz            -> {"status": "ok", "model": {...}}
    POST /predict            {"bounds": [xmin, ymin, xmax, ymax],
                              "rasters": {name: path.nc, ...},   # server-side
                              "out": "path"                       # optional
                             }
                             -> {"out": path.nc, "shape": [...], "rmse?": ...}
                             (writes NetCDF; add "format": "geotiff" for .tif)
    POST /evaluate           {"dem": path, "track": path.csv, "method": ...}
                             -> {"rmse_m": ...}

Design notes:
- one jitted forward lives in the DeepBedMap instance; requests of the same
  window shape reuse the compiled executable (XLA jit cache keyed on shapes),
  so steady-state latency is one device execution + raster IO;
- requests execute on the server's worker threads; JAX dispatch is
  thread-safe, and raster IO overlaps compute across requests;
- rasters are referenced by server-visible path (DEM sources are tens of GB —
  shipping them per-request would dwarf compute; deployments mount the data
  volume next to the server).

Start from the CLI: ``python -m deepbedmap_tpu serve --checkpoint CKPT
--port 8500`` — or in-process via ``make_server`` (used by the tests).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


def make_server(
    dbm,  # api.DeepBedMap
    host: str = "127.0.0.1",
    port: int = 0,
    raster_cache: Optional[dict] = None,
) -> ThreadingHTTPServer:
    """Build (not start) a ThreadingHTTPServer serving ``dbm``.

    ``raster_cache``: optional {name: Raster} preloaded inputs; paths in
    requests fall back to reading NetCDF from disk (cached thereafter).
    """
    from deepbedmap_tpu.data.raster import read_netcdf, write_netcdf

    cache = dict(raster_cache or {})
    cache_lock = threading.Lock()

    def get_raster(path: str):
        with cache_lock:
            if path in cache:
                return cache[path]
        raster = read_netcdf(path)
        with cache_lock:
            cache[path] = raster
        return raster

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n)) if n else {}

        def do_GET(self):
            if self.path == "/healthz":
                return self._json(
                    {
                        "status": "ok",
                        "model": {
                            "num_residual_blocks": dbm.cfg.num_residual_blocks,
                            "residual_scaling": dbm.cfg.residual_scaling,
                            "resolution": dbm.resolution,
                        },
                    }
                )
            self._json({"error": "not found"}, 404)

        def do_POST(self):
            try:
                req = self._body()
                if self.path == "/predict":
                    return self._predict(req)
                if self.path == "/evaluate":
                    return self._evaluate(req)
                self._json({"error": "not found"}, 404)
            except Exception as e:  # surface the failure to the client
                self._json({"error": f"{type(e).__name__}: {e}"}, 500)

        def _predict(self, req):
            bounds = tuple(float(v) for v in req["bounds"])
            rasters = {k: get_raster(v) for k, v in req["rasters"].items()}
            dem = dbm.predict(bounds, rasters, padding=req.get("padding", 1000.0))
            out = req.get("out")
            result = {"shape": list(dem.data.shape), "bounds": list(bounds)}
            if out:
                if req.get("format") == "geotiff":
                    from deepbedmap_tpu.data import geotiff

                    geotiff.write_geotiff(
                        out, dem.data, dem.left, dem.top, dem.res,
                        nodata=-2000.0, compress=True,
                    )
                else:
                    write_netcdf(dem, out)
                result["out"] = out
            return self._json(result)

        def _evaluate(self, req):
            import pandas as pd

            from deepbedmap_tpu.evalx import track_rmse

            dem = get_raster(req["dem"])
            track = pd.read_csv(req["track"])
            rmse = track_rmse(
                dem,
                track.x.values,
                track.y.values,
                track.z.values,
                method=req.get("method", "bicubic"),
            )
            return self._json({"rmse_m": float(rmse), "points": int(len(track))})

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever(dbm, host: str = "0.0.0.0", port: int = 8500) -> None:
    server = make_server(dbm, host, port)
    print(f"serving DeepBedMap on {host}:{server.server_port}", flush=True)
    server.serve_forever()
