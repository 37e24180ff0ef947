"""Top-level user API: one object tying model, weights, inference and eval.

The reference's user surface is "load weights from Comet, call model.forward
on tiles you cropped yourself" (deepbedmap.py:381-447). Here:

    from deepbedmap_tpu import DeepBedMap

    dbm = DeepBedMap()                        # fresh weights
    dbm = DeepBedMap.from_checkpoint(path)    # Orbax train state
    dbm = DeepBedMap.from_chainer_npz(path)   # reference-format weights

    dem = dbm.predict(window_bound, rasters)            # one region -> Raster
    dem = dbm.predict_continent(rasters, bounds, out)   # band-streamed + GeoTIFF
    rmse = dbm.track_rmse(dem, x, y, z)
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from deepbedmap_tpu.config import GeneratorConfig, InferenceConfig
from deepbedmap_tpu.data.raster import Raster

Bounds = Tuple[float, float, float, float]  # (xmin, ymin, xmax, ymax)


class DeepBedMap:
    """A trained (or fresh) super-resolution bed-DEM model with inference
    conveniences. All heavy compute is jitted on first use and cached."""

    def __init__(
        self,
        params=None,
        cfg: GeneratorConfig = GeneratorConfig(),
        resolution: float = 250.0,
    ):
        from deepbedmap_tpu.models import build_generator
        from deepbedmap_tpu.models.generator import Generator

        self.cfg = cfg
        self.resolution = resolution
        if params is None:
            self.model, self.params = build_generator(cfg)
        else:
            self.model = Generator(cfg)
            self.params = params
        self._forward = None

    # ---- constructors ----
    @classmethod
    def from_checkpoint(
        cls,
        path: str,
        cfg: GeneratorConfig = GeneratorConfig(),
        use_ema: bool = True,
    ):
        """Load generator params from an Orbax GANState checkpoint.

        ``use_ema``: prefer the EMA weights when the run kept them
        (TrainConfig.ema_decay > 0) — the lower-variance inference choice."""
        from deepbedmap_tpu.config import TrainConfig
        from deepbedmap_tpu.train.checkpoint import (
            checkpoint_has_ema,
            restore_checkpoint,
        )
        from deepbedmap_tpu.train.state import create_gan_state

        if not os.path.exists(path):
            raise FileNotFoundError(f"no checkpoint at {path}")
        # pick the template matching the checkpoint's saved tree (EMA or not)
        # from the Orbax metadata, so a restore failure is a genuine failure
        # and ema_decay=0 checkpoints never pay a doomed first attempt
        template = (
            create_gan_state(cfg, t_cfg=TrainConfig(ema_decay=1.0))
            if checkpoint_has_ema(path)
            else create_gan_state(cfg)
        )
        state = restore_checkpoint(path, template)
        params = (
            state.g_ema
            if use_ema and getattr(state, "g_ema", None) is not None
            else state.g_params
        )
        return cls(params, cfg)

    @classmethod
    def from_chainer_npz(
        cls,
        path: str,
        cfg: GeneratorConfig = GeneratorConfig(),
        offset_order: str = "xy",
    ):
        """Load reference-format (Chainer save_npz) generator weights."""
        from deepbedmap_tpu.train.checkpoint import import_chainer_generator_npz

        params = import_chainer_generator_npz(
            path, cfg.num_residual_blocks, offset_order
        )
        return cls(params, cfg)

    @classmethod
    def from_experiment(
        cls,
        source,  # tracker root dir, http(s) base URL, or a Tracker instance
        experiment_key: str = "latest",
        download_path: str = "model/weights/srgan_generator_model_weights.npz",
        api_key: Optional[str] = None,
        asset_name: str = "srgan_generator_model_weights.npz",
    ):
        """Fetch trained weights by experiment key from a tracker — the
        reference's Comet weight fetcher (_download_model_weights_from_comet,
        features/environment.py:87-127, used by deepbedmap.py:381-410):
        'latest' resolves to the newest experiment, the npz asset is
        downloaded, and the run's logged num_residual_blocks /
        residual_scaling rebuild the matching generator."""
        from deepbedmap_tpu.utils.tracking import download_model_weights

        hp = download_model_weights(
            source,
            experiment_key=experiment_key,
            asset_name=asset_name,
            download_path=download_path,
            api_key=api_key,
        )
        cfg = GeneratorConfig(
            num_residual_blocks=int(hp.get("num_residual_blocks", 12)),
            residual_scaling=float(hp.get("residual_scaling", 0.1)),
        )
        return cls.from_chainer_npz(download_path, cfg)

    # ---- forward ----
    def forward_fn(self):
        if self._forward is None:
            import jax

            model, params = self.model, self.params

            @jax.jit
            def fwd(x, w1, w2, w3):
                return model.apply({"params": params}, x, w1, w2, w3)

            self._forward = fwd
        return self._forward

    def predict(
        self,
        window_bound: Bounds,
        rasters: Dict[str, Raster],
        padding: float = 1000.0,
    ) -> Raster:
        """Predict one region. ``rasters`` keys: bed_lowres, surface,
        velocity_x, velocity_y, accumulation (the reference's five inputs)."""
        import jax.numpy as jnp

        from deepbedmap_tpu.data.groundtruth import get_model_inputs

        inputs = get_model_inputs(
            window_bound,
            rasters["bed_lowres"],
            rasters["surface"],
            rasters["velocity_x"],
            rasters["velocity_y"],
            rasters["accumulation"],
            padding=padding,
        )
        fwd = self.forward_fn()
        pred = fwd(
            *(
                jnp.asarray(np.asarray(inputs[k]).transpose(0, 2, 3, 1))
                for k in ("X", "W1", "W2", "W3")
            )
        )
        xmin, ymin, xmax, ymax = window_bound
        return Raster(
            np.asarray(pred)[0, :, :, 0],
            left=xmin,
            top=ymax,
            res=self.resolution,
        )

    def predict_continent(
        self,
        inputs_nchw: Dict[str, np.ndarray],  # X/W1/W2/W3 full-region stacks
        bounds: Bounds,
        outfilepath: Optional[str] = None,
        tile_out: int = 1000,
        halo_lr: int = 18,
        mesh=None,
        stream_product: bool = False,
        tile_loop: str = "scan",
        prefetch: int = 1,
        rows_per_strip: Optional[int] = None,
        overviews: int = 0,
        predictor: bool = False,
        tiles_per_dispatch: int = 2,
        multihost: bool = False,
    ) -> Optional[Raster]:
        """Band-streamed whole-region prediction; optionally writes the int16
        LZW GeoTIFF product. Inputs follow the reference NCHW contract,
        unpadded (covering exactly ``bounds``).

        ``mesh``: shard each band's tiles over a jax Mesh (multi-chip).
        ``stream_product``: pipe strips straight into the GeoTIFF (encode
        overlaps compute; requires ``outfilepath``; returns None — the
        canvas is never materialised). The two compose: mesh + stream_product
        is the flagship production path — multi-chip tile sharding with the
        GeoTIFF encode overlapped behind the mesh compute.
        ``tile_loop``: 'scan' (device loop, default) or 'host' (one jitted
        tile fn; ~25x faster first compile with the fused Pallas trunk —
        see inference.continent._make_band_predictor). Single-device paths
        only; the mesh path shards tiles instead of looping.
        ``prefetch``: bands dispatched ahead of the blocking fetch (next
        band's transfer overlaps current band's compute; 0 = serial).
        ``rows_per_strip``: TIFF strip height for ``stream_product`` (None
        = ~8 uniform sub-strips per band, parallel native LZW encode).
        ``overviews``: with ``stream_product``, append this many 2x pyramid
        levels as chained TIFF pages (nodata-aware average, built
        incrementally; read back via read_geotiff(path, page=L)).
        ``predictor``: TIFF horizontal differencing before the LZW
        (stream_product; data-dependent — see the writer docstring).
        ``tiles_per_dispatch``: tiles batched per forward on the
        single-device paths (2 recovers ~6% of per-tile time by feeding the
        MXU a real batch — inference.continent._make_band_predictor).
        ``multihost``: distribute row BANDS across jax processes (a pod —
        inference.multihost; call parallel.distributed.initialize first).
        ``mesh`` must then be process-LOCAL (tiles shard over local chips);
        the Raster/product is returned on process 0 and None elsewhere.
        P == 1 degenerates to the single-host path."""
        from deepbedmap_tpu.inference import (
            TilePlan,
            predict_continent,
            predict_continent_to_geotiff,
            save_continent_dem,
        )
        from deepbedmap_tpu.inference.continent import predict_continent_sharded

        xmin, ymin, xmax, ymax = bounds
        out_w = int(round((xmax - xmin) / self.resolution))
        out_h = int(round((ymax - ymin) / self.resolution))
        plan = TilePlan(
            out_h=out_h, out_w=out_w, tile_out=tile_out, halo_lr=halo_lr
        )
        host_inputs = {
            k: np.asarray(v).transpose(0, 2, 3, 1) for k, v in inputs_nchw.items()
        }
        if (overviews or predictor) and not stream_product:
            raise ValueError(
                "overviews/predictor are features of the streamed writer — "
                "pass stream_product=True (the buffered save_continent_dem "
                "path writes a plain single-page tiled GeoTIFF)"
            )
        if multihost:
            from deepbedmap_tpu.inference.multihost import (
                predict_continent_multihost,
                predict_continent_multihost_to_geotiff,
            )

            if stream_product:
                assert outfilepath is not None, "stream_product needs outfilepath"
                predict_continent_multihost_to_geotiff(
                    self.forward_fn(), host_inputs, plan, bounds, outfilepath,
                    mesh=mesh, rows_per_strip=rows_per_strip,
                    overviews=overviews, predictor=predictor,
                    tile_loop=tile_loop,
                )
                return None
            canvas = predict_continent_multihost(
                self.forward_fn(), host_inputs, plan, mesh=mesh,
                tile_loop=tile_loop,
            )
            if canvas is None:  # not process 0
                return None
            if outfilepath is not None:
                save_continent_dem(canvas, bounds, outfilepath)
            return Raster(canvas, left=xmin, top=ymax, res=self.resolution)
        if stream_product:
            assert outfilepath is not None, "stream_product needs outfilepath"
            predict_continent_to_geotiff(
                self.forward_fn(), host_inputs, plan, bounds, outfilepath,
                mesh=mesh, tile_loop=tile_loop, prefetch=prefetch,
                rows_per_strip=rows_per_strip, overviews=overviews,
                predictor=predictor, tiles_per_dispatch=tiles_per_dispatch,
            )
            return None
        if mesh is not None:
            canvas = predict_continent_sharded(
                self.forward_fn(), host_inputs, plan, mesh, prefetch=prefetch
            )
        else:
            canvas = predict_continent(
                self.forward_fn(), host_inputs, plan, tile_loop=tile_loop,
                prefetch=prefetch, tiles_per_dispatch=tiles_per_dispatch,
            )
        if outfilepath is not None:
            save_continent_dem(canvas, bounds, outfilepath)
        return Raster(canvas, left=xmin, top=ymax, res=self.resolution)

    # ---- eval ----
    def track_rmse(
        self, dem: Raster, x: np.ndarray, y: np.ndarray, z: np.ndarray
    ) -> float:
        from deepbedmap_tpu.evalx import track_rmse

        return track_rmse(dem, x, y, z)
