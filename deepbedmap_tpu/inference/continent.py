"""Whole-continent inference: row-band streaming around the tiled engine.

Reference (deepbedmap.py:629-756): 22000x18000 output px from a 4500x5500 px
BEDMAP2 canvas + conditioning rasters, predicted as 396 one-at-a-time GPU
tiles with host-side crops. TPU-native layout here:

- full-resolution conditioning rasters (the 45000x55000 REMA grid is ~10 GB
  fp32 — larger than one chip's HBM) stay host-side as numpy arrays;
- one *row band* of tiles at a time moves to device: the band's halo-extended
  inputs (~350 MB fp32 at reference scale) transfer once, every tile of the
  band is predicted from device-resident data in a jitted scan, and one
  (tile_out, out_w) strip returns to the host canvas;
- vertical halos between bands are REAL rows from the neighbouring bands, so
  band-streamed output is bit-identical to the whole-region engine; edge
  bands use the same edge-replicate padding as the engine;
- conditioning clipping (>= 0 for surface/velocity/accumulation,
  deepbedmap.py:663-665) runs on device per band.

The int16 LZW GeoTIFF write goes through ``data.geotiff`` (native codec) —
see ``save_continent_dem``.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepbedmap_tpu.inference.engine import INPUT_RATIOS, TilePlan


def _make_band_predictor(
    forward_fn: Callable[..., jax.Array],
    plan: TilePlan,
    clip_conditioning: bool,
    tile_loop: str = "scan",
    tiles_per_dispatch: int = 1,
):
    """jitted (band_inputs with vertical halo) -> (tile_out, out_w) strip.

    ``tile_loop``: how the band's tiles are iterated.
    - ``'scan'`` (default): one ``lax.scan`` dispatch per band — fewest host
      round-trips, device-resident strip.
    - ``'host'``: ONE jitted tile-update (traced tile index) driven by a host
      loop. Numerically identical (same crop/update math, shared below).
      Exists because a Pallas custom call inside ``lax.scan`` is pathological
      for this image's uncached remote Mosaic compile (~25 min for the fused
      trunk vs ~1 min for the single tile fn); dispatches stay async, so the
      steady-state cost is one RTT per band fetch either way.

    ``tiles_per_dispatch``: tiles stacked on the BATCH dim per forward call.
    Batch-1 leaves the XLA conv stages MXU-underfed at these shapes; batch 2
    amortises it — measured 103.1 -> 97.0 ms/tile, batch 4 96.6 (diminishing;
    bench_ablate_r4i_b{2,4}.log). Device memory per dispatch scales with it.
    A trailing remainder group clamps its tile indices to the last tile
    (recomputing it into the same strip slot), so any ``gx`` works.
    """
    if tile_loop not in ("scan", "host"):
        raise ValueError(f"tile_loop must be 'scan' or 'host', got {tile_loop!r}")
    if tiles_per_dispatch < 1:
        raise ValueError(f"tiles_per_dispatch must be >= 1, got {tiles_per_dispatch}")
    gx = plan.grid[1]
    ratioed = {k: r for k, r in INPUT_RATIOS.items()}

    def prep(band_inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        if clip_conditioning:
            band_inputs = {
                "X": band_inputs["X"],
                "W1": jnp.maximum(band_inputs["W1"], 0.0),
                "W2": jnp.maximum(band_inputs["W2"], 0.0),
                "W3": jnp.maximum(band_inputs["W3"], 0.0),
            }
        # horizontal halo: edge padding (region borders); vertical halo is
        # already present in the band rows
        padded = {}
        for key, ratio in ratioed.items():
            p = plan.pad_lr * ratio
            padded[key] = jnp.pad(
                band_inputs[key], ((0, 0), (0, 0), (p, p), (0, 0)), mode="edge"
            )
        return padded

    def tile(padded: Dict[str, jax.Array], tx) -> jax.Array:
        crops = {}
        for key, ratio in ratioed.items():
            a = padded[key]
            size = plan.crop_lr * ratio
            start = tx * plan.tile_lr * ratio
            crops[key] = jax.lax.dynamic_slice(
                a, (0, 0, start, 0), (1, a.shape[1], size, a.shape[3])
            )
        pred = forward_fn(crops["X"], crops["W1"], crops["W2"], crops["W3"])
        d = plan.discard_hr
        return pred[0, d : pred.shape[1] - d, d : pred.shape[2] - d, 0]

    def tile_group(padded: Dict[str, jax.Array], txs) -> jax.Array:
        """txs: (B,) clamped tile indices -> (B, tile_out, tile_out) preds,
        ONE batched forward (tiles stacked on the batch dim)."""
        crops = {}
        for key, ratio in ratioed.items():
            a = padded[key]
            size = plan.crop_lr * ratio
            crops[key] = jax.vmap(
                lambda t, a=a, size=size, ratio=ratio: jax.lax.dynamic_slice(
                    a,
                    (0, 0, t * plan.tile_lr * ratio, 0),
                    (1, a.shape[1], size, a.shape[3]),
                )[0]
            )(txs)
        pred = forward_fn(crops["X"], crops["W1"], crops["W2"], crops["W3"])
        d = plan.discard_hr
        return pred[:, d : pred.shape[1] - d, d : pred.shape[2] - d, 0]

    B = tiles_per_dispatch
    n_groups = -(-gx // B)

    def group_update(padded, strip, g) -> jax.Array:
        """Predict group g's B tiles in one forward and write them into the
        strip. Remainder indices clamp to gx-1: the duplicate prediction
        rewrites the same (correct) strip slot."""
        txs = jnp.minimum(g * B + jnp.arange(B), gx - 1)
        preds = tile_group(padded, txs)
        for i in range(B):
            strip = jax.lax.dynamic_update_slice(
                strip, preds[i], (0, txs[i] * plan.tile_out)
            )
        return strip

    if tile_loop == "scan":

        @jax.jit
        def band_predict(band_inputs: Dict[str, jax.Array]) -> jax.Array:
            padded = prep(band_inputs)

            def body(strip, tx):
                strip = jax.lax.dynamic_update_slice(
                    strip, tile(padded, tx), (0, tx * plan.tile_out)
                )
                return strip, None

            def body_group(strip, g):
                return group_update(padded, strip, g), None

            strip0 = jnp.zeros((plan.tile_out, plan.out_w), jnp.float32)
            if B == 1:  # keep the measured batch-1 graph byte-identical
                strip, _ = jax.lax.scan(body, strip0, jnp.arange(gx))
            else:
                strip, _ = jax.lax.scan(body_group, strip0, jnp.arange(n_groups))
            return strip

        return band_predict

    prep_jit = jax.jit(prep)

    @jax.jit
    def tile_update(padded, strip, tx):
        return jax.lax.dynamic_update_slice(
            strip, tile(padded, tx), (0, tx * plan.tile_out)
        )

    group_update_jit = jax.jit(group_update)

    def band_predict_host(band_inputs: Dict[str, jax.Array]) -> jax.Array:
        padded = prep_jit(band_inputs)
        strip = jnp.zeros((plan.tile_out, plan.out_w), jnp.float32)
        if B == 1:
            for tx in range(gx):
                strip = tile_update(padded, strip, jnp.int32(tx))
        else:
            for g in range(n_groups):
                strip = group_update_jit(padded, strip, jnp.int32(g))
        return strip

    return band_predict_host


def _run_band_pipeline(
    dispatch: Callable[[Dict[str, np.ndarray], int], object],
    fetch: Callable[[object], np.ndarray],
    inputs_host: Dict[str, np.ndarray],
    gy: int,
    consume: Callable[[int, np.ndarray], None],
    progress: Optional[Callable[[int, int], None]],
    prefetch: int,
) -> None:
    """Software-pipelined band loop shared by every continent path.

    jax dispatches are async (``dispatch`` returns an unfinished device
    array; only ``fetch`` blocks), so running ``prefetch`` bands ahead
    overlaps the NEXT band's host slicing + host->device transfer (and, on a
    mesh, the reshard) with the CURRENT band's device compute. ``prefetch=0``
    restores the strict serial loop (one band of inputs resident on device);
    ``prefetch=1`` keeps two."""
    from collections import deque

    pending: "deque" = deque()

    def drain_one():
        band, fut = pending.popleft()
        consume(band, fetch(fut))
        if progress is not None:
            progress(band + 1, gy)

    for band in range(gy):
        pending.append((band, dispatch(inputs_host, band)))
        while len(pending) > max(prefetch, 0):
            drain_one()
    while pending:
        drain_one()


def _band_inputs(
    inputs_host: Dict[str, np.ndarray], plan: TilePlan, band: int
) -> Dict[str, jax.Array]:
    """Slice one vertical-halo'd row band out of the host rasters (edge
    padding at region borders). Shared by the buffered and streamed paths so
    their band geometry cannot diverge."""
    lh, lw = plan.lr_shape
    pad = plan.pad_lr
    r0 = band * plan.tile_lr - pad
    r1 = (band + 1) * plan.tile_lr + pad
    out = {}
    for key, ratio in INPUT_RATIOS.items():
        a = inputs_host[key]
        assert a.shape[1] == ratio * lh and a.shape[2] == ratio * lw, (
            key, a.shape, (ratio * lh, ratio * lw),
        )
        rr0, rr1 = r0 * ratio, r1 * ratio
        top_pad = max(0, -rr0)
        bot_pad = max(0, rr1 - ratio * lh)
        sl = a[:, max(0, rr0) : min(ratio * lh, rr1)]
        if top_pad or bot_pad:
            sl = np.pad(
                sl, ((0, 0), (top_pad, bot_pad), (0, 0), (0, 0)), mode="edge"
            )
        out[key] = jnp.asarray(sl)
    return out


def predict_continent(
    forward_fn: Callable[..., jax.Array],
    inputs_host: Dict[str, np.ndarray],  # NHWC numpy, full region, unpadded
    plan: TilePlan,
    clip_conditioning: bool = True,
    progress: Optional[Callable[[int, int], None]] = None,
    tile_loop: str = "scan",
    prefetch: int = 1,
    tiles_per_dispatch: int = 2,
) -> np.ndarray:
    """Predict the full (out_h, out_w) DEM band by band; returns the host
    canvas (float32). ``tile_loop='host'`` trades one dispatch per band for a
    ~25x faster first compile when the fused Pallas trunk is active (see
    _make_band_predictor). ``prefetch``: bands dispatched ahead of the fetch
    (see _run_band_pipeline; 0 = serial, one band resident on device).
    ``tiles_per_dispatch``: tiles batched per forward (2 recovers ~6% of
    per-tile time — see _make_band_predictor)."""
    gy, _ = plan.grid
    band_predict = _make_band_predictor(
        forward_fn, plan, clip_conditioning, tile_loop=tile_loop,
        tiles_per_dispatch=tiles_per_dispatch,
    )
    canvas = np.empty((plan.out_h, plan.out_w), np.float32)

    def consume(band: int, strip: np.ndarray) -> None:
        canvas[band * plan.tile_out : (band + 1) * plan.tile_out] = strip

    _run_band_pipeline(
        lambda ih, band: band_predict(_band_inputs(ih, plan, band)),
        np.asarray,
        inputs_host, gy, consume, progress, prefetch,
    )
    return canvas


def _make_sharded_band_pipeline(
    forward_fn: Callable[..., jax.Array],
    plan: TilePlan,
    mesh,
    clip_conditioning: bool,
    tiles_per_dispatch: int = 1,
):
    """(dispatch, fetch) for one mesh-sharded row band: dispatch slices the
    band off the host rasters and launches the sharded tile prediction
    (async — returns the unfinished (gx, T, T) device array); fetch blocks
    and assembles the (tile_out, out_w) host strip. Shared by the buffered
    (predict_continent_sharded) and streamed (predict_continent_to_geotiff
    with mesh=) production paths so their band geometry and numerics cannot
    diverge."""
    from deepbedmap_tpu.parallel.api import sharded_predict_tiles

    gy, gx = plan.grid
    # band-local plan: one row of the full grid
    band_plan = TilePlan(
        out_h=plan.tile_out,
        out_w=plan.out_w,
        tile_out=plan.tile_out,
        halo_lr=plan.halo_lr,
        scale=plan.scale,
    )
    hpad = {k: band_plan.pad_lr * r for k, r in INPUT_RATIOS.items()}

    def dispatch_band(band_inputs: Dict[str, jax.Array]) -> jax.Array:
        """Launch the sharded prediction for ONE already-sliced halo'd band
        (the multi-host path feeds process-local bands here directly)."""
        prepped = {}
        for key, ratio in INPUT_RATIOS.items():
            a = jnp.asarray(band_inputs[key])
            if clip_conditioning and key != "X":
                a = jnp.maximum(a, 0.0)
            # horizontal halo is edge padding (region borders); the vertical
            # halo rows are already real data from _band_inputs
            prepped[key] = jnp.pad(
                a,
                ((0, 0), (0, 0), (hpad[key], hpad[key]), (0, 0)),
                mode="edge",
            )
        tiles = sharded_predict_tiles(
            forward_fn, prepped, band_plan, mesh, prepadded=True,
            tiles_per_dispatch=tiles_per_dispatch,
        )
        assert tiles.shape == (gx, plan.tile_out, plan.tile_out)
        return tiles

    def dispatch(inputs_host: Dict[str, np.ndarray], band: int) -> jax.Array:
        return dispatch_band(_band_inputs(inputs_host, plan, band))

    dispatch.dispatch_band = dispatch_band  # inference.multihost uses this

    def fetch(tiles: jax.Array) -> np.ndarray:
        return np.asarray(tiles).transpose(1, 0, 2).reshape(
            plan.tile_out, plan.out_w
        )

    return dispatch, fetch


def _make_sharded_band_strip(
    forward_fn: Callable[..., jax.Array],
    plan: TilePlan,
    mesh,
    clip_conditioning: bool,
) -> Callable[[Dict[str, np.ndarray], int], np.ndarray]:
    """(inputs_host, band) -> (tile_out, out_w) strip (blocking form of
    _make_sharded_band_pipeline, for callers that want one band now)."""
    dispatch, fetch = _make_sharded_band_pipeline(
        forward_fn, plan, mesh, clip_conditioning
    )
    return lambda inputs_host, band: fetch(dispatch(inputs_host, band))


def predict_continent_sharded(
    forward_fn: Callable[..., jax.Array],
    inputs_host: Dict[str, np.ndarray],
    plan: TilePlan,
    mesh,
    clip_conditioning: bool = True,
    progress: Optional[Callable[[int, int], None]] = None,
    prefetch: int = 1,
    tiles_per_dispatch: int = 1,
) -> np.ndarray:
    """Band streaming x mesh-sharded tiles — the multi-chip production path:
    each row band's inputs move to the mesh once (vertical halo = REAL
    neighbour rows, so output matches the single-device paths), and the
    band's tiles are predicted in parallel across the mesh
    (parallel.sharded_predict_tiles with prepadded vertical halos +
    edge-padded horizontal halos). Memory per chip stays ``1 + prefetch``
    bands (the pipeline keeps the next band's transfer in flight behind the
    current band's compute — see _run_band_pipeline); speed scales with the
    mesh.
    """
    _require_single_host()
    gy, _ = plan.grid
    dispatch, fetch = _make_sharded_band_pipeline(
        forward_fn, plan, mesh, clip_conditioning,
        tiles_per_dispatch=tiles_per_dispatch,
    )
    canvas = np.empty((plan.out_h, plan.out_w), np.float32)

    def consume(band: int, strip: np.ndarray) -> None:
        canvas[band * plan.tile_out : (band + 1) * plan.tile_out] = strip

    _run_band_pipeline(
        dispatch, fetch, inputs_host, gy, consume, progress, prefetch
    )
    return canvas


def _require_single_host() -> None:
    """The single-host continent paths feed host-GLOBAL numpy rasters to the
    mesh; on a multi-controller pod every process would have to hold (and
    ship) every band. ``inference.multihost`` distributes bands across
    processes instead — use it there."""
    if jax.process_count() > 1:
        raise NotImplementedError(
            "this continent path is single-host only (band inputs are "
            "host-global numpy); use "
            "inference.multihost.predict_continent_multihost[_to_geotiff] "
            "for per-process band distribution on a pod"
        )


def predict_continent_to_geotiff(
    forward_fn: Callable[..., jax.Array],
    inputs_host: Dict[str, np.ndarray],
    plan: TilePlan,
    bounds: Tuple[float, float, float, float],  # (xmin, ymin, xmax, ymax)
    outfilepath: str,
    clip_conditioning: bool = True,
    nodataval: float = -2000.0,
    compress: bool = True,
    progress: Optional[Callable[[int, int], None]] = None,
    mesh=None,
    tile_loop: str = "scan",
    rows_per_strip: Optional[int] = None,
    prefetch: int = 1,
    overviews: int = 0,
    predictor: bool = False,
    tiles_per_dispatch: int = 2,
) -> str:
    """Band-streamed inference piped straight into the int16 LZW GeoTIFF —
    a writer thread LZW-encodes and writes band strip i while the device
    computes band i+1 (the ctypes LZW call and the device wait both release
    the GIL, so compute and encode genuinely overlap). Peak host memory is
    two strips instead of the full canvas, and the product is finished
    moments after the last band — the reference computes everything, then
    pays the full write afterwards (deepbedmap.py:744-756).

    ``mesh``: shard each band's tiles over a jax Mesh — multi-chip compute
    feeding the same overlapped strip writer (strips are numerically
    identical to predict_continent_sharded's canvas rows).

    ``rows_per_strip``: TIFF strip height. Default (None) picks ~8 uniform
    sub-strips per band so each band LZW-encodes on ~8 native threads — on a
    mesh the encode otherwise becomes the wall-clock floor (single-threaded
    ~45 s continent encode vs ~7 s 8-chip compute). 0 = one strip per band.

    ``prefetch``: bands dispatched ahead of the blocking fetch, overlapping
    the next band's host slice + transfer with the current band's compute
    (see _run_band_pipeline). 0 = serial.

    ``overviews``: 2x pyramid levels appended as chained TIFF pages, built
    incrementally from the strips (nodata-aware block means; the
    gdaladdo--r-average convention) — see GeoTiffStripWriter. The reference
    ships its DEM without overviews; GIS use at continent scale wants them.

    ``predictor``: TIFF PREDICTOR=2 horizontal differencing before the LZW.
    Data-dependent: ~2x smaller on smooth fields, slightly LARGER when the
    bed roughness approaches white noise at the 250 m posting — measure on
    your output before enabling (benchmarks/RESULTS.md).
    """
    _require_single_host()
    gy, _ = plan.grid
    if rows_per_strip is None:
        for d in (8, 10, 5, 4, 2):
            if plan.tile_out % d == 0:
                rows_per_strip = plan.tile_out // d
                break
        else:
            rows_per_strip = 0  # no uniform divisor: one strip per band
    if mesh is not None:
        dispatch, fetch = _make_sharded_band_pipeline(
            forward_fn, plan, mesh, clip_conditioning,
            tiles_per_dispatch=tiles_per_dispatch,
        )
    else:
        band_predict = _make_band_predictor(
            forward_fn, plan, clip_conditioning, tile_loop=tile_loop,
            tiles_per_dispatch=tiles_per_dispatch,
        )
        dispatch = lambda ih, band: band_predict(_band_inputs(ih, plan, band))
        fetch = np.asarray

    tw = _ThreadedStripWriter(
        outfilepath, plan, bounds, nodataval, compress,
        rows_per_strip or None, overviews, predictor,
    )
    try:
        _run_band_pipeline(
            dispatch, fetch, inputs_host, gy,
            lambda band, strip: tw.put(strip), progress, prefetch,
        )
        tw.close()
    except BaseException:
        tw.abort()
        raise
    return tw.path


class _ThreadedStripWriter:
    """GeoTiffStripWriter fed from a drain thread: the ctypes LZW call and
    the device wait both release the GIL, so encode overlaps compute. Shared
    by the single-host streamed path above and inference.multihost's
    process-0 writer. ``put`` re-raises any pending writer-thread error;
    ``abort`` guarantees no dangling handle and no corrupt-but-plausible
    partial product."""

    def __init__(
        self, outfilepath, plan, bounds, nodataval, compress,
        rows_per_strip, overviews, predictor,
    ):
        import queue
        import threading

        from deepbedmap_tpu.data.geotiff import GeoTiffStripWriter

        xmin, ymin, xmax, ymax = bounds
        self.path = f"{outfilepath}.tif"
        self._writer = GeoTiffStripWriter(
            self.path,
            height=plan.out_h,
            width=plan.out_w,
            left=xmin,
            top=ymax,
            res=(xmax - xmin) / plan.out_w,
            dtype=np.int16,
            nodata=nodataval,
            compress=compress,
            rows_per_strip=rows_per_strip,
            overviews=overviews,
            predictor=predictor,
        )
        self._strips: "queue.Queue" = queue.Queue(maxsize=2)
        self._error: list = []
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._thread.start()

    def _drain(self):
        failed = False
        while True:
            strip = self._strips.get()
            if strip is None:
                return
            if failed:
                continue  # keep consuming so the producer's put() never blocks
            try:
                self._writer.write_strip(strip)
            except Exception as e:  # surface in the producer thread
                self._error.append(e)
                failed = True

    def put(self, strip: np.ndarray) -> None:
        if self._error:
            raise self._error[0]
        self._strips.put(strip)

    def _join(self):
        self._strips.put(None)
        self._thread.join()

    def close(self) -> None:
        self._join()
        if self._error:
            # the file is partial — the caller's except path calls abort()
            raise self._error[0]
        self._writer.close()

    def abort(self) -> None:
        self._join()
        self._writer.abort()


def save_continent_dem(
    canvas: np.ndarray,
    bounds: Tuple[float, float, float, float],  # (xmin, ymin, xmax, ymax)
    outfilepath: str,
    nodataval: float = -2000.0,
) -> None:
    """int16 + LZW + tiled GeoTIFF, like the reference's final product
    (deepbedmap.py:749-756)."""
    from deepbedmap_tpu.data import geotiff

    xmin, ymin, xmax, ymax = bounds
    h, w = canvas.shape
    out = np.where(np.isfinite(canvas), canvas, nodataval).astype(np.int16)
    geotiff.write_geotiff(
        f"{outfilepath}.tif",
        out,
        left=xmin,
        top=ymax,
        res=(xmax - xmin) / w,
        nodata=nodataval,
        compress=True,
        tiled=True,
    )
