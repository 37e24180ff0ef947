"""Halo'd tile-predict-stitch engine.

Reference semantics (deepbedmap.py:689-736): cut low-res crops extended by
``halo+1`` px per side, forward the fully-convolutional generator, discard
``halo*scale`` output px per side, write the ``tile_out`` center into the
canvas. Here that is:

- static shapes everywhere: inputs are edge-padded once by ``halo+1`` low-res
  px (x the per-raster resolution ratio), so every tile crop is identical and
  the whole loop is a ``lax.scan`` of ``dynamic_slice`` -> forward ->
  ``dynamic_update_slice`` — one XLA program, no host round-trips;
- the scan axis is the unit that ``parallel.sharded_predict_tiles`` shards
  across the device mesh.

Registration note: the reference's continent loop indexes its *padded* BEDMAP2
array with unpadded-coordinate arithmetic (deepbedmap.py:707-711 vs the
padding=1000 in get_deepbedmap_model_inputs), which shifts its continent DEM by
one low-res pixel (1 km). This engine keeps correct georegistration — crops are
taken in unpadded coordinates — matching the reference's *regional* inference
path (deepbedmap.py:420-447) instead, where output bounds equal the request.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


# resolution ratio of each conditioning raster relative to the low-res bed grid
INPUT_RATIOS = {"X": 1, "W1": 10, "W2": 2, "W3": 1}


@dataclasses.dataclass(frozen=True)
class TilePlan:
    """Static tiling geometry for an (out_h, out_w) output canvas."""

    out_h: int
    out_w: int
    tile_out: int = 1000  # output px per tile side
    halo_lr: int = 18  # discarded low-res halo per side ("xtrapad")
    scale: int = 4

    def __post_init__(self):
        assert self.out_h % self.tile_out == 0, (
            f"out_h={self.out_h} must be a multiple of tile_out={self.tile_out}"
        )
        assert self.out_w % self.tile_out == 0, (
            f"out_w={self.out_w} must be a multiple of tile_out={self.tile_out}"
        )
        assert self.tile_out % self.scale == 0, (
            f"tile_out={self.tile_out} must be a multiple of scale={self.scale}"
        )

    @property
    def tile_lr(self) -> int:
        return self.tile_out // self.scale

    @property
    def pad_lr(self) -> int:
        # halo + 1 px for the input block's valid convolution
        return self.halo_lr + 1

    @property
    def crop_lr(self) -> int:
        return self.tile_lr + 2 * self.pad_lr

    @property
    def discard_hr(self) -> int:
        return self.halo_lr * self.scale

    @property
    def grid(self) -> Tuple[int, int]:
        return self.out_h // self.tile_out, self.out_w // self.tile_out

    @property
    def num_tiles(self) -> int:
        gy, gx = self.grid
        return gy * gx

    @property
    def lr_shape(self) -> Tuple[int, int]:
        return self.out_h // self.scale, self.out_w // self.scale


def pad_inputs(
    inputs: Dict[str, jax.Array], plan: TilePlan, mode: str = "edge"
) -> Dict[str, jax.Array]:
    """Edge-pad each NHWC raster by pad_lr * its resolution ratio per side."""
    padded = {}
    for key, ratio in INPUT_RATIOS.items():
        a = inputs[key]
        lh, lw = plan.lr_shape
        assert a.shape[1] == ratio * lh and a.shape[2] == ratio * lw, (
            key,
            a.shape,
            (ratio * lh, ratio * lw),
        )
        p = plan.pad_lr * ratio
        padded[key] = jnp.pad(
            a, ((0, 0), (p, p), (p, p), (0, 0)), mode=mode
        )
    return padded


def _crop_tile(
    padded: Dict[str, jax.Array], plan: TilePlan, ty: jax.Array, tx: jax.Array
) -> Dict[str, jax.Array]:
    """Static-size dynamic crops of all four rasters for tile (ty, tx)."""
    crops = {}
    for key, ratio in INPUT_RATIOS.items():
        a = padded[key]
        size = plan.crop_lr * ratio
        start_y = ty * (plan.tile_lr * ratio)
        start_x = tx * (plan.tile_lr * ratio)
        crops[key] = jax.lax.dynamic_slice(
            a,
            (0, start_y, start_x, 0),
            (a.shape[0], size, size, a.shape[3]),
        )
    return crops


def make_tile_forward(
    forward_fn: Callable[..., jax.Array], plan: TilePlan
) -> Callable:
    """Single-tile path: crop -> forward -> discard halo. Returns a function
    (padded_inputs, ty, tx) -> (1, tile_out, tile_out, 1)."""

    def tile_forward(padded, ty, tx):
        crops = _crop_tile(padded, plan, ty, tx)
        pred = forward_fn(crops["X"], crops["W1"], crops["W2"], crops["W3"])
        d = plan.discard_hr
        return pred[:, d : pred.shape[1] - d, d : pred.shape[2] - d, :]

    return tile_forward


def make_tile_group_forward(
    forward_fn: Callable[..., jax.Array], plan: TilePlan
) -> Callable:
    """Batched-tile path: crop B tiles, stack them on the BATCH dim, ONE
    forward. Returns (padded_inputs, tys, txs) -> (B, tile_out, tile_out).
    Batch-1 forwards leave the conv stages MXU-underfed at continent tile
    shapes; batch 2 is a measured ~6% per-tile win (benchmarks/RESULTS.md,
    bench_ablate_r4i_b{2,4}.log)."""

    def group_forward(padded, tys, txs):
        def crop1(ty, tx):
            c = _crop_tile(padded, plan, ty, tx)
            return {k: v[0] for k, v in c.items()}  # drop the N=1 dim

        crops = jax.vmap(crop1)(tys, txs)  # each (B, H, W, C)
        pred = forward_fn(crops["X"], crops["W1"], crops["W2"], crops["W3"])
        d = plan.discard_hr
        return pred[:, d : pred.shape[1] - d, d : pred.shape[2] - d, 0]

    return group_forward


def predict_region_tiled(
    forward_fn: Callable[..., jax.Array],
    inputs: Dict[str, jax.Array],
    plan: TilePlan,
    pad_mode: str = "edge",
) -> jax.Array:
    """Tile-predict-stitch over the full grid as one jitted scan.

    ``inputs`` are unpadded NHWC rasters covering exactly the output bbox at
    their native resolutions. Returns (1, out_h, out_w, 1).
    """
    padded = pad_inputs(inputs, plan, pad_mode)
    tile_forward = make_tile_forward(forward_fn, plan)
    gy, gx = plan.grid

    def body(canvas, t):
        ty, tx = t // gx, t % gx
        tile = tile_forward(padded, ty, tx)
        canvas = jax.lax.dynamic_update_slice(
            canvas, tile, (0, ty * plan.tile_out, tx * plan.tile_out, 0)
        )
        return canvas, None

    canvas = jnp.zeros((1, plan.out_h, plan.out_w, 1), jnp.float32)
    canvas, _ = jax.lax.scan(body, canvas, jnp.arange(plan.num_tiles))
    return canvas


def predict_region(
    forward_fn: Callable[..., jax.Array],
    inputs: Dict[str, jax.Array],
    plan: TilePlan,
    pad_mode: str = "edge",
) -> jax.Array:
    """Untiled single-shot prediction of the whole region (one big 'tile').

    Identical output to ``predict_region_tiled`` by conv locality — the seam
    -equivalence property the tests pin down (SURVEY.md section 4).
    """
    padded = pad_inputs(inputs, plan, pad_mode)
    pred = forward_fn(padded["X"], padded["W1"], padded["W2"], padded["W3"])
    d = plan.discard_hr
    return pred[:, d : pred.shape[1] - d, d : pred.shape[2] - d, :]
