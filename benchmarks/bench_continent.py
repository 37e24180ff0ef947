"""Whole-continent-scale inference benchmark: the reference's 396-tile
18000x22000 px workload (deepbedmap.py:689-736), run for real on the attached
TPU as 18 row bands of 22 tiles via the band engine.

Band inputs are generated on device (this image's TPU is behind a ~26 MB/s
tunnel, so host->device transfer would measure the tunnel, not the machine;
on a real TPU host, PCIe/DMA moves a 634 MB band in ~20 ms). Completion is
forced per band with a scalar fetch. Output strips stay on device for the
same reason; the GeoTIFF product path is benchmarked separately at the end
from host-generated data.

Prints one JSON line per measurement.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import json
import time

import jax

from deepbedmap_tpu.utils.compilation_cache import enable_persistent_cache

enable_persistent_cache()  # compiled executables persist across runs
import jax.numpy as jnp
import numpy as np


def main():
    from deepbedmap_tpu.config import GeneratorConfig
    from deepbedmap_tpu.inference.continent import _make_band_predictor
    from deepbedmap_tpu.inference.engine import TilePlan
    from deepbedmap_tpu.models import build_generator

    # argv[1]: band tile iteration ('scan' = device loop, 'host' = one jitted
    # tile fn — the fast-first-compile path; see _make_band_predictor)
    tile_loop = sys.argv[1] if len(sys.argv) > 1 else "scan"

    plan = TilePlan(out_h=18000, out_w=22000)  # the reference geometry
    gy, gx = plan.grid
    assert (gy, gx) == (18, 22) and plan.num_tiles == 396

    # generator-variant sweeps without editing the script (r4 session):
    # TAIL_FUSED=1, PACK_TAPS=1, DTYPE=bfloat16, TPD=2 (tiles per dispatch)
    cfg = GeneratorConfig(
        tail_fused=os.environ.get("TAIL_FUSED", "") == "1",
        tail_pack_taps=os.environ.get("PACK_TAPS", "") == "1",
        compute_dtype=os.environ.get("DTYPE", "float32"),
        rdb_mxu_bf16=os.environ.get("RDB_BF16", "") == "1",
        upsample_phase_conv=os.environ.get("PHASE_UP", "") == "1",
        rdb_resident={"1": "auto", "0": "never"}.get(
            os.environ.get("RDB_RESIDENT", ""), GeneratorConfig().rdb_resident
        ),
        rrdb_fused=os.environ.get("RRDB_FUSED", "") == "1",
        rrdb_sweep=os.environ.get("RRDB_SWEEP", "") == "1",
    )
    print(json.dumps({"config": {
        "tail_fused": cfg.tail_fused, "tail_pack_taps": cfg.tail_pack_taps,
        "compute_dtype": cfg.compute_dtype,
        "rdb_mxu_bf16": cfg.rdb_mxu_bf16,
        "upsample_phase_conv": cfg.upsample_phase_conv,
        "rdb_resident": cfg.rdb_resident,
        "tiles_per_dispatch": int(os.environ.get("TPD", "1"))}}), flush=True)
    model, params = build_generator(cfg, lr=11)

    def forward_fn(x, w1, w2, w3):
        return model.apply({"params": params}, x, w1, w2, w3)

    tpd = int(os.environ.get("TPD", "1"))
    band_predict = _make_band_predictor(
        forward_fn, plan, clip_conditioning=True, tile_loop=tile_loop,
        tiles_per_dispatch=tpd,
    )

    lh, lw = plan.lr_shape
    band_rows = plan.tile_lr + 2 * plan.pad_lr  # 288 lr rows incl. halo

    @jax.jit
    def make_band(key):
        ks = jax.random.split(key, 4)
        return {
            "X": jax.random.normal(ks[0], (1, band_rows, lw, 1), jnp.float32),
            "W1": jax.random.normal(ks[1], (1, 10 * band_rows, 10 * lw, 1), jnp.float32),
            "W2": jax.random.normal(ks[2], (1, 2 * band_rows, 2 * lw, 2), jnp.float32),
            "W3": jax.random.normal(ks[3], (1, band_rows, lw, 1), jnp.float32),
        }

    # compile + warm (timed: the scan/host tile-loop compile gap is itself a
    # headline — the fused trunk inside lax.scan is ~25 min through this
    # image's uncached remote Mosaic tunnel, the host loop ~1 min)
    t0 = time.perf_counter()
    band = make_band(jax.random.PRNGKey(0))
    strip = band_predict(band)
    _ = float(jnp.sum(strip))
    print(
        json.dumps(
            {
                "metric": "band_predictor_first_call",
                "value": round(time.perf_counter() - t0, 1),
                "unit": f"s (compile+run, tile_loop={tile_loop}, tpd={tpd})",
            }
        ),
        flush=True,
    )

    start = time.perf_counter()
    checksum = 0.0
    for b in range(gy):
        band = make_band(jax.random.PRNGKey(b))
        strip = band_predict(band)
        checksum += float(jnp.sum(strip))  # forces completion per band
    total = time.perf_counter() - start

    print(
        json.dumps(
            {
                "metric": "continent_396_tiles_wallclock",
                "value": round(total, 2),
                "unit": "s/chip (18 bands x 22 tiles, compute+sync)",
                "tiles_per_sec": round(396 / total, 2),
            }
        )
    )

    # product path: int16 LZW tiled GeoTIFF of an 18000x22000 canvas
    from deepbedmap_tpu.inference.continent import save_continent_dem

    rs = np.random.RandomState(0)
    block = rs.randn(1000, 1000).astype(np.float32) * 200
    canvas = np.tile(block, (18, 22))
    t0 = time.perf_counter()
    save_continent_dem(
        canvas,
        (-2_700_000.0, -2_200_000.0, 2_800_000.0, 2_300_000.0),
        "/tmp/deepbedmap_dem_bench",
    )
    t_write = time.perf_counter() - t0
    size_mb = os.path.getsize("/tmp/deepbedmap_dem_bench.tif") / 1e6
    print(
        json.dumps(
            {
                "metric": "continent_geotiff_write",
                "value": round(t_write, 1),
                "unit": f"s (int16 LZW tiled, {size_mb:.0f} MB file)",
            }
        )
    )

    # pipelined product: device computes band i+1 while a writer thread
    # LZW-encodes + writes strip i (GeoTiffStripWriter). Strips here are
    # host-generated (fetching real strips would measure this image's
    # ~26 MB/s tunnel, not the machine; a real TPU host moves 88 MB over
    # PCIe in ~30 ms), so the number isolates compute/encode overlap.
    import queue
    import threading

    from deepbedmap_tpu.data.geotiff import GeoTiffStripWriter

    writer = GeoTiffStripWriter(
        "/tmp/deepbedmap_dem_piped.tif",
        height=plan.out_h,
        width=plan.out_w,
        left=-2_700_000.0,
        top=2_300_000.0,
        res=250.0,
        dtype=np.int16,
        nodata=-2000.0,
        compress=True,
        # the production default (predict_continent_to_geotiff): 8 uniform
        # sub-strips per band, encoded on the native thread pool (no-op on
        # this 1-core sandbox; real hosts parallelise the encode)
        rows_per_strip=125,
    )
    strips: "queue.Queue" = queue.Queue(maxsize=2)

    def drain():
        while True:
            s = strips.get()
            if s is None:
                return
            writer.write_strip(s)

    th = threading.Thread(target=drain, daemon=True)
    th.start()
    host_strips = [canvas[i * 1000 : (i + 1) * 1000] for i in range(gy)]
    t0 = time.perf_counter()
    checksum = 0.0
    for b in range(gy):
        band = make_band(jax.random.PRNGKey(b))
        strip = band_predict(band)
        checksum += float(jnp.sum(strip))
        strips.put(host_strips[b])
    strips.put(None)
    th.join()
    writer.close()
    t_piped = time.perf_counter() - t0
    size_mb = os.path.getsize("/tmp/deepbedmap_dem_piped.tif") / 1e6
    print(
        json.dumps(
            {
                "metric": "continent_product_pipelined",
                "value": round(t_piped, 1),
                "unit": f"s (compute + int16 LZW product overlapped, {size_mb:.0f} MB)",
                "vs_sequential": round((total + t_write) / t_piped, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
