"""Regenerate the paper figure set from a prediction (reference
paper_figures.py driven end-to-end). Builds a synthetic DEM family standing in
for DeepBedMap / BEDMAP2 / BedMachine / groundtruth (this image has zero
egress, so the real rasters cannot be fetched), then emits every figure type
the paper uses:

  fig0/2  DEM overview map (+ study regions, training tiles, grounding line)
  fig3    2x2 grid of 3-D perspective views
  fig4    annotated hillshaded closeups
  fig5    elevation + roughness grid maps with transect points
  fig6    1-D elevation/roughness transect profiles
  arch    generator architecture diagram (TikZ replacement)

Run from the repo root: ``python examples/figure_set.py [outdir]`` (CPU, <1 min).
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # figures never need the TPU tunnel

import matplotlib

matplotlib.use("Agg")

import numpy as np

from deepbedmap_tpu.data.geojson import load_polygons
from deepbedmap_tpu.data.raster import Raster
from deepbedmap_tpu.viz import (
    REGION_PINE_ISLAND,
    closeup_fig,
    fig_3d_comparison,
    fig_architecture,
    fig_dem_overview,
    fig_input_thumbnails,
    fig_roughness_grids,
    fig_transect,
)

t0 = time.time()
outdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="dbm_figs_")
os.makedirs(outdir, exist_ok=True)


def log(msg):
    print(f"[{time.time()-t0:5.1f}s] {msg}", flush=True)


# ---- synthetic DEM family over a Pine-Island-sized region ----
rs = np.random.RandomState(42)
left, bottom, right, top = REGION_PINE_ISLAND
res = 250.0
h = int((top - bottom) / res)
w = int((right - left) / res)
yy, xx = np.mgrid[0:h, 0:w]


def bed(phase, rough):
    return (
        -900.0
        + 350.0 * np.sin(xx / 90.0 + phase)
        + 250.0 * np.cos(yy / 70.0)
        + rough * rs.randn(h, w)
    ).astype(np.float32)


deepbedmap = Raster(bed(0.0, 30.0), left=left, top=top, res=res)
groundtruth = Raster(bed(0.0, 35.0), left=left, top=top, res=res)
bedmap2 = Raster(bed(0.05, 2.0), left=left, top=top, res=res)  # smooth
bedmachine = Raster(bed(0.02, 12.0), left=left, top=top, res=res)
diff = Raster(deepbedmap.data - bedmap2.data, left=left, top=top, res=res)
log(f"built synthetic DEM family {deepbedmap.data.shape}")

# ---- fig0/fig2: overview map ----
ring = [
    [left + 30 * res, bottom + 30 * res],
    [right - 30 * res, bottom + 60 * res],
    [right - 60 * res, top - 40 * res],
    [left + 80 * res, top - 30 * res],
    [left + 30 * res, bottom + 30 * res],
]
gl = load_polygons(
    {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {"type": "Polygon", "coordinates": [ring]},
                "properties": {},
            }
        ],
    }
)
tiles = np.asarray(
    [
        [left + 40 * res, bottom + 50 * res, left + 76 * res, bottom + 86 * res],
        [left + 150 * res, top - 120 * res, left + 186 * res, top - 84 * res],
    ]
)
fig = fig_dem_overview(
    deepbedmap,
    grounding_line=gl,
    study_regions={"Pine Island Glacier": REGION_PINE_ISLAND},
    training_tiles=tiles,
)
fig.savefig(os.path.join(outdir, "fig2_deepbedmap_dem.png"), dpi=120)
log("fig2_deepbedmap_dem.png")

# ---- fig3: 3-D qualitative comparison ----
fig = fig_3d_comparison(
    {
        "DeepBedMap": deepbedmap,
        "BEDMAP2": bedmap2,
        "DeepBedMap - BEDMAP2": diff,
        "BedMachine": bedmachine,
    },
    zmins={"DeepBedMap - BEDMAP2": -400.0},
    cmaps={"DeepBedMap - BEDMAP2": "RdBu"},
)
fig.savefig(os.path.join(outdir, "fig3_qualitative_bed_comparison.png"), dpi=100)
log("fig3_qualitative_bed_comparison.png")

# ---- fig4: closeups ----
import matplotlib.pyplot as plt

fig, axes = plt.subplots(1, 2, figsize=(16, 8))
closeup_fig(
    deepbedmap,
    letter="a",
    name="Central trough",
    midx=(left + right) / 2,
    midy=(bottom + top) / 2,
    annotations=[((left + right) / 2, (bottom + top) / 2, "trough")],
    size=20_000.0,
    ax=axes[0],
)
closeup_fig(
    deepbedmap,
    letter="b",
    name="Upstream ridges",
    midx=left + 30_000.0,
    midy=top - 40_000.0,
    annotations=[],
    size=20_000.0,
    ax=axes[1],
)
fig.savefig(os.path.join(outdir, "fig4_deepbedmap_closeups.png"), dpi=120)
log("fig4_deepbedmap_closeups.png")

# ---- transect for figs 5-6: a diagonal survey track ----
n_track = 400
txs = np.linspace(left + 10 * res, right - 10 * res, n_track)
tys = np.linspace(bottom + 10 * res, top - 10 * res, n_track)

fig = fig_roughness_grids(
    {"DeepBedMap": deepbedmap, "Groundtruth": groundtruth, "BedMachine": bedmachine},
    transect_xy=(txs, tys),
)
fig.savefig(os.path.join(outdir, "fig5_elevation_roughness_grids.png"), dpi=100)
log("fig5_elevation_roughness_grids.png")

fig = fig_transect(
    {"DeepBedMap": deepbedmap, "Groundtruth": groundtruth, "BedMachine": bedmachine},
    txs,
    tys,
)
fig.savefig(os.path.join(outdir, "fig6_elevation_roughness_transect.png"), dpi=120)
log("fig6_elevation_roughness_transect.png")

# ---- architecture diagram ----
fig = fig_architecture()
fig.savefig(os.path.join(outdir, "architecture.png"), dpi=120)
log("architecture.png")

# ---- fig1 thumbnails: one panel per model input + the prediction ----
fig = fig_input_thumbnails(
    {
        "BEDMAP2": bedmap2,
        "MEaSUREs": (deepbedmap, bedmap2),  # (vx, vy) stand-ins
        "DeepBedMap": deepbedmap,
    }
)
fig.savefig(os.path.join(outdir, "fig1_input_thumbnails.png"), dpi=120)
log("fig1_input_thumbnails.png")

log(f"figure set written to {outdir}")
