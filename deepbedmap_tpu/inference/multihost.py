"""Pod-scale continent inference: row bands distributed across HOSTS.

The single-host continent paths (``inference.continent``) keep the full
conditioning rasters host-side and stream row bands to the local devices —
correct and fast for the stated v5e-8 production target, but on a
multi-controller pod every process would have to hold (and ship) every
band. This module adds the missing distribution level:

- **bands -> processes, round-interleaved**: band ``b`` belongs to process
  ``b % P``.  In round ``r`` the P processes compute the CONTIGUOUS band
  group ``r*P .. r*P+P-1`` concurrently, so one ``process_allgather`` per
  round hands process 0 exactly the next in-order strips for the streamed
  GeoTIFF writer (strict write order is what lets the product stream —
  reference analogue: deepbedmap.py:629-756 computes everything, then pays
  the full write afterwards).
- **tiles -> local chips, within each process**: each process predicts its
  band with its process-LOCAL mesh via the same
  ``sharded_predict_tiles`` machinery as the single-host path (vertical
  halos are REAL neighbour rows, so outputs are bit-identical to the
  single-host paths — parity-tested in tests/test_multihost.py).
- **data stays process-local**: ``band_source`` may be a callable
  ``band -> {X, W1, W2, W3}`` of halo-extended NHWC rows, so each host
  reads ONLY its own bands (e.g. windowed GeoTIFF/NetCDF reads,
  data.geotiff/data.raster); a host-global dict also works for
  convenience and is sliced locally with the shared band geometry
  (``continent._band_inputs`` — single source of truth for halos).

Collective traffic: one (tile_out, out_w) fp32 strip per process per round
(~70 MB at reference scale), stacked by ``process_allgather`` — DCN-bound,
overlapped poorly by design (the gather IS the sync point); at reference
scale compute per round dwarfs it. Failure semantics: an exception on any
process abandons its peers' next allgather (Gloo/ICI surfaces a distributed
error there) — same contract as every jax multi-controller program.

Run one process per host with ``parallel.distributed.initialize``;
P == 1 degenerates to the single-host behaviour and needs no distributed
init.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple, Union

import jax
import numpy as np

from deepbedmap_tpu.inference.continent import (
    _band_inputs,
    _make_band_predictor,
    _make_sharded_band_pipeline,
    _ThreadedStripWriter,
)
from deepbedmap_tpu.inference.engine import TilePlan

BandSource = Union[Dict[str, np.ndarray], Callable[[int], Dict[str, np.ndarray]]]


def _make_local_strip_fn(
    forward_fn, plan: TilePlan, mesh, clip_conditioning: bool, tile_loop: str
) -> Callable[[Dict[str, np.ndarray]], np.ndarray]:
    """band_inputs (halo'd NHWC dict) -> (tile_out, out_w) fp32 strip, using
    this process's local devices (mesh-sharded tiles, or the single-device
    band predictor when mesh is None)."""
    if mesh is not None:
        for d in mesh.devices.flat:
            if d.process_index != jax.process_index():
                raise ValueError(
                    "multihost continent inference shards TILES over a "
                    "process-LOCAL mesh (bands are already distributed "
                    "across processes); build the mesh from "
                    "jax.local_devices()"
                )
        dispatch, fetch = _make_sharded_band_pipeline(
            forward_fn, plan, mesh, clip_conditioning
        )
        return lambda band_inputs: fetch(dispatch.dispatch_band(band_inputs))
    band_predict = _make_band_predictor(
        forward_fn, plan, clip_conditioning, tile_loop=tile_loop
    )
    import jax.numpy as jnp

    return lambda band_inputs: np.asarray(
        band_predict({k: jnp.asarray(v) for k, v in band_inputs.items()})
    )


def _rounds(
    forward_fn,
    band_source: BandSource,
    plan: TilePlan,
    mesh,
    clip_conditioning: bool,
    tile_loop: str,
    consume0: Callable[[int, np.ndarray], None],
    progress,
) -> None:
    """Shared round loop: every process computes band r*P + pid (a zero
    dummy past the grid), one stacked allgather per round, process 0
    consumes the round's strips in band order."""
    from jax.experimental import multihost_utils

    p_count = jax.process_count()
    pid = jax.process_index()
    gy, _ = plan.grid

    if callable(band_source):
        load = band_source
    else:
        load = lambda band: _band_inputs(band_source, plan, band)

    strip_fn = _make_local_strip_fn(
        forward_fn, plan, mesh, clip_conditioning, tile_loop
    )
    shape = (plan.tile_out, plan.out_w)

    for r in range(-(-gy // p_count)):
        band = r * p_count + pid
        if band < gy:
            strip = np.ascontiguousarray(strip_fn(load(band)), np.float32)
            assert strip.shape == shape, (strip.shape, shape)
        else:
            strip = np.zeros(shape, np.float32)  # dummy past the grid edge
        if p_count > 1:
            gathered = multihost_utils.process_allgather(strip)
        else:
            gathered = strip[None]
        if pid == 0:
            for p in range(p_count):
                b = r * p_count + p
                if b < gy:
                    consume0(b, gathered[p])
                    if progress is not None:
                        progress(b + 1, gy)


def predict_continent_multihost(
    forward_fn: Callable[..., jax.Array],
    band_source: BandSource,
    plan: TilePlan,
    mesh=None,  # process-LOCAL mesh (tiles sharded over local chips)
    clip_conditioning: bool = True,
    progress: Optional[Callable[[int, int], None]] = None,
    tile_loop: str = "scan",
) -> Optional[np.ndarray]:
    """Predict the full (out_h, out_w) DEM with bands distributed across
    processes. Returns the assembled canvas on process 0, ``None`` on every
    other process (hold the full canvas once, not P times); ``progress``
    fires on process 0 only."""
    canvas = (
        np.empty((plan.out_h, plan.out_w), np.float32)
        if jax.process_index() == 0
        else None
    )

    def consume0(band: int, strip: np.ndarray) -> None:
        canvas[band * plan.tile_out : (band + 1) * plan.tile_out] = strip

    _rounds(
        forward_fn, band_source, plan, mesh, clip_conditioning, tile_loop,
        consume0, progress,
    )
    return canvas


def predict_continent_multihost_to_geotiff(
    forward_fn: Callable[..., jax.Array],
    band_source: BandSource,
    plan: TilePlan,
    bounds: Tuple[float, float, float, float],  # (xmin, ymin, xmax, ymax)
    outfilepath: str,
    mesh=None,
    clip_conditioning: bool = True,
    nodataval: float = -2000.0,
    compress: bool = True,
    progress: Optional[Callable[[int, int], None]] = None,
    tile_loop: str = "scan",
    rows_per_strip: Optional[int] = None,
    overviews: int = 0,
    predictor: bool = False,
) -> Optional[str]:
    """Band-distributed inference streamed into ONE int16 LZW GeoTIFF on
    process 0 (writer thread overlaps LZW encode with the next round's
    compute and gather, exactly like the single-host streamed path).
    Returns the product path on process 0, ``None`` elsewhere. Writer
    options match ``continent.predict_continent_to_geotiff``."""
    if rows_per_strip is None:
        for d in (8, 10, 5, 4, 2):
            if plan.tile_out % d == 0:
                rows_per_strip = plan.tile_out // d
                break
        else:
            rows_per_strip = 0

    if jax.process_index() != 0:
        _rounds(
            forward_fn, band_source, plan, mesh, clip_conditioning,
            tile_loop, lambda band, strip: None, None,
        )
        return None

    tw = _ThreadedStripWriter(
        outfilepath, plan, bounds, nodataval, compress,
        rows_per_strip or None, overviews, predictor,
    )
    try:
        _rounds(
            forward_fn, band_source, plan, mesh, clip_conditioning,
            tile_loop, lambda band, strip: tw.put(strip), progress,
        )
        tw.close()
    except BaseException:
        tw.abort()
        raise
    return tw.path
