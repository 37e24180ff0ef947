"""End-to-end example of the deepbedmap_tpu public API on synthetic data:
synthetic radar survey -> gridding -> windows -> training tiles -> GAN training
-> regional + sharded + band-streamed inference -> GeoTIFF product -> track
RMSE -> figure. Run from the repo root: `python examples/synthetic_pipeline.py`
(CPU; ~15 min on a 1-core sandbox, dominated by one jit compile)."""
import os, sys, tempfile, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import numpy as np
import pandas as pd

t0 = time.time()
def log(msg):
    print(f"[{time.time()-t0:6.1f}s] {msg}", flush=True)

workdir = tempfile.mkdtemp(prefix="dbm_e2e_")
log(f"workdir {workdir}; devices: {jax.devices()}")

# ---- 1. synthetic survey points over a hilly bed (EPSG:3031-ish coords) ----
rs = np.random.RandomState(42)
def bed(x, y):  # smooth synthetic bed elevation field (m)
    return (-500 + 300*np.sin(x/8000.0) * np.cos(y/11000.0)
            + 120*np.sin(x/2500.0 + 1.0) + 80*np.cos(y/3100.0))
n_pts = 40000
px = rs.uniform(-1_600_000, -1_560_000, n_pts)
py = rs.uniform(-180_000, -140_000, n_pts)
pz = bed(px, py) + rs.randn(n_pts) * 5.0
xyz = pd.DataFrame({"x": px, "y": py, "z": pz})

from deepbedmap_tpu.data.gridder import get_region, xyz_to_grid
region = get_region(xyz)
log(f"region: {region}")
raster = xyz_to_grid(xyz, region, spacing=250, iterations=150)
log(f"gridded highres raster: {raster.data.shape}, "
    f"finite {np.isfinite(raster.data).mean():.2%}, res {raster.res}")

# ---- 2. window proposal over the gridded survey ----
from deepbedmap_tpu.data.windows import get_window_bounds, filter_within_polygon
bounds = get_window_bounds(raster, height=36, width=36, step=12)
log(f"proposed {len(bounds)} fully-valid 36px windows")
assert len(bounds) > 50, "too few windows"
# grounding-line style filter: polygon covering most of the region
poly = np.array([[-1_600_000, -180_000], [-1_560_000, -180_000],
                 [-1_560_000, -140_000], [-1_600_000, -140_000]], float)
keep = filter_within_polygon(bounds, poly, buffer=10_000)
log(f"{len(keep)} windows inside buffered polygon")
bounds = [bounds[i] for i in keep][:256]

# ---- 3. build training tiles via the packaged builder (reference
# data_prep.py:745-930 array contract) -----------------------------------
from deepbedmap_tpu.data.raster import Raster
from deepbedmap_tpu.data.builder import build_training_arrays
lh = raster  # highres Y source
# conditioning rasters: lowres bed (1000m), surface (100m), velocity (500m), accum (1000m)
gx0, gx1, gy0, gy1 = region
W, H = int((gx1-gx0)/250), int((gy1-gy0)/250)
yy, xx = np.mgrid[0:H, 0:W]
cx = gx0 + (xx + 0.5) * 250.0
cy = gy1 - (yy + 0.5) * 250.0
truth250 = bed(cx, cy).astype(np.float32)
def down(a, f):
    return a[:a.shape[0]//f*f, :a.shape[1]//f*f].reshape(a.shape[0]//f, f, -1, f).mean((1,3))
def up(a, f):
    return np.kron(a, np.ones((f, f), np.float32))
bed1000 = Raster(down(truth250, 4).astype(np.float32), left=gx0, top=gy1, res=1000.0)
# synthetic 100 m 'surface': 5x-upsampled 500m field, cropped to the region
surf100 = Raster(up(down(truth250, 2) + 2000.0, 5)[: int(H * 2.5), : int(W * 2.5)]
                 .astype(np.float32), left=gx0, top=gy1, res=100.0)
vel500 = Raster(down(truth250, 2).astype(np.float32) * 0.1,
                left=gx0, top=gy1, res=500.0)
accum1000 = Raster(down(truth250*0.01 + 100.0, 4).astype(np.float32), left=gx0, top=gy1, res=1000.0)

dataset = build_training_arrays(
    highres={"synthetic_survey": lh},
    window_bounds={"synthetic_survey": bounds},
    lowres=bed1000,
    surface=surf100,
    velocity=(vel500, vel500),
    accumulation=accum1000,
    out_dir=os.path.join(workdir, "train_arrays"),
)
n = len(dataset)
batch0 = dataset.take(np.arange(min(n, 4)))
shapes = {k: tuple(v.shape) for k, v in batch0.items()}
log(f"builder tiles (NHWC): {shapes}; {n} clean training tiles")
assert shapes["X"][1:] == (11, 11, 1) and shapes["W2"][1:] == (22, 22, 2)
assert shapes["W1"][1:] == (110, 110, 1) and shapes["Y"][1:] == (36, 36, 1)

# ---- 4. train a small GAN for 2 epochs ----
from deepbedmap_tpu.config import GeneratorConfig, TrainConfig
from deepbedmap_tpu.data.dataset import TileDataset
from deepbedmap_tpu.models import Generator, Discriminator, build_generator
from deepbedmap_tpu.train import create_gan_state, fit
g_cfg = GeneratorConfig(num_residual_blocks=1)
t_cfg = TrainConfig(batch_size=16, learning_rate=3e-4, epochs=2)
g_model, d_model = Generator(g_cfg), Discriminator()
state = create_gan_state(g_cfg, t_cfg=t_cfg)
state, history = fit(state, dataset, g_model, d_model, t_cfg=t_cfg)
log(f"trained 2 epochs: g_loss {history[0]['generator_loss']:.3f} -> "
    f"{history[-1]['generator_loss']:.3f}; psnr {history[-1]['generator_psnr']:.1f}")
assert all(np.isfinite(r['generator_loss']) for r in history)

# ---- 5. orbax checkpoint roundtrip ----
from deepbedmap_tpu.train.checkpoint import save_checkpoint, restore_checkpoint
ck = os.path.join(workdir, "ckpt")
save_checkpoint(state, ck)
state2 = restore_checkpoint(ck, create_gan_state(g_cfg, t_cfg=t_cfg, seed=9))
log("checkpoint saved + restored")

# ---- 6. regional inference: tiled & sharded & band-streamed all agree ----
from deepbedmap_tpu.inference import TilePlan, predict_region, predict_region_tiled
from deepbedmap_tpu.inference.continent import predict_continent, save_continent_dem
from deepbedmap_tpu.parallel import make_mesh, sharded_predict_tiles, stitch_tiles
import jax.numpy as jnp

def forward_fn(x, w1, w2, w3):
    return g_model.apply({"params": state2.g_params}, x, w1, w2, w3)

plan = TilePlan(out_h=96, out_w=96, tile_out=32, halo_lr=3)
lhp, lwp = plan.lr_shape
inputs = {
    "X":  jnp.asarray(rs.rand(1, lhp, lwp, 1), jnp.float32),
    "W1": jnp.asarray(rs.rand(1, 10*lhp, 10*lwp, 1), jnp.float32),
    "W2": jnp.asarray(rs.rand(1, 2*lhp, 2*lwp, 2), jnp.float32),
    "W3": jnp.asarray(rs.rand(1, lhp, lwp, 1), jnp.float32),
}
whole = predict_region(forward_fn, inputs, plan)
tiled = predict_region_tiled(forward_fn, inputs, plan)
mesh = make_mesh(8)
tiles = sharded_predict_tiles(forward_fn, inputs, plan, mesh)
canvas_sharded = stitch_tiles(tiles, plan)
host_inputs = {k: np.asarray(v) for k, v in inputs.items()}
canvas_band = predict_continent(forward_fn, host_inputs, plan, clip_conditioning=False)
d1 = float(np.max(np.abs(np.asarray(whole) - np.asarray(tiled))))
d2 = float(np.max(np.abs(np.asarray(whole)[0,:,:,0] - np.asarray(canvas_sharded))))
d3 = float(np.max(np.abs(np.asarray(whole)[0,:,:,0] - canvas_band)))
log(f"inference agreement: tiled {d1:.2e}, sharded {d2:.2e}, band {d3:.2e}")
assert max(d1, d2, d3) < 1e-3

# ---- 7. product: int16 LZW GeoTIFF + readback + track RMSE ----
from deepbedmap_tpu.data import geotiff
dem_path = os.path.join(workdir, "dem")
save_continent_dem(canvas_band * 1000.0, (0.0, 0.0, 96*250.0, 96*250.0), dem_path)
back, meta = geotiff.read_geotiff(dem_path + ".tif")
log(f"GeoTIFF product: {back.shape} {back.dtype}, meta {meta}")

# streamed product with the full feature set: mesh-sharded bands piped into
# the strip writer with overview pyramid + horizontal predictor, then a
# windowed read of both pages — must match the buffered canvas product
from deepbedmap_tpu.inference.continent import predict_continent_to_geotiff

streamed_path = os.path.join(workdir, "dem_streamed")
forward_scaled = lambda *a: forward_fn(*a) * 1000.0
predict_continent_to_geotiff(
    forward_scaled, host_inputs, plan, (0.0, 0.0, 96 * 250.0, 96 * 250.0),
    streamed_path, clip_conditioning=False, mesh=mesh,
    overviews=1, predictor=True,
)
sback, smeta = geotiff.read_geotiff(streamed_path + ".tif")
assert np.array_equal(sback, back) and smeta == meta
win, wmeta = geotiff.read_geotiff_window(streamed_path + ".tif", (10, 40), (20, 70))
assert np.array_equal(win, back[10:40, 20:70])
lev1, lmeta = geotiff.read_geotiff_window(streamed_path + ".tif", (0, 48), page=1)
log(
    f"streamed product (mesh + overviews + predictor): page0 == buffered, "
    f"window {win.shape} @ ({wmeta['left']:.0f},{wmeta['top']:.0f}), "
    f"page1 {lev1.shape} res {lmeta['res']:.0f}"
)

from deepbedmap_tpu.evalx import track_rmse
from deepbedmap_tpu.data.raster import Raster as R2
dem_raster = R2(back.astype(np.float32), left=0.0, top=96*250.0, res=250.0, nodata=-2000.0)
tx = rs.uniform(1000, 20000, 500); ty = rs.uniform(1000, 20000, 500)
import jax.numpy as jnp2
from deepbedmap_tpu.evalx.track import grdtrack
tz = np.asarray(grdtrack(jnp2.asarray(dem_raster.masked()), jnp2.asarray(tx), jnp2.asarray(ty), 0.0, 96*250.0, 250.0))
rmse_v = track_rmse(dem_raster, tx, ty, tz + rs.randn(500)*2.0)
log(f"track RMSE vs noisy self-samples: {rmse_v:.2f} m (expect ~2)")
assert 1.0 < rmse_v < 3.5

# ---- 8. figure ----
import matplotlib
matplotlib.use("Agg")
from deepbedmap_tpu.viz import plot_dem, standard_deviation_2d
ax = plot_dem(dem_raster, title="e2e synthetic DEM")
fig_path = os.path.join(workdir, "dem.png")
ax.figure.savefig(fig_path, dpi=60)
rough = np.asarray(standard_deviation_2d(jnp2.asarray(dem_raster.masked())))
log(f"figure saved {fig_path} ({os.path.getsize(fig_path)} bytes); "
    f"roughness grid {rough.shape}, median {np.nanmedian(rough):.2f}")

log("E2E DRIVE COMPLETE — all stages ran through the public API")
