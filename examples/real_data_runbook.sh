#!/usr/bin/env bash
# The one-command-per-stage real-data runbook: everything the reference's
# notebook sequence (data_prep.ipynb -> srgan_train.ipynb -> deepbedmap.ipynb)
# does, as CLI stages. Requires network (or pre-mounted data under $DATA) —
# the zero-egress CI rehearses this exact chain on synthetic miniatures in
# tests/test_runbook.py; every survey format is execution-tested in
# tests/test_survey_execution.py.
#
# Usage: DATA=/path/to/data bash examples/real_data_runbook.sh
set -euo pipefail
DATA="${DATA:-data}"
WORK="${WORK:-runbook_work}"
mkdir -p "$WORK"/{surveys_nc,arrays,model}

# --- 0. fetch + verify every input against the pinned manifest -------------
# (33 files: BEDMAP2, REMA, MEaSUREs velocity, Arthern accumulation, the 11
# high-res radar surveys; sha256 from data/datasets.yml = reference
# data_list.yml + misc. Ref: data_prep.py:120-255)
python -m deepbedmap_tpu verify-data --root "$DATA" --download

# --- 1. grid each of the 11 high-res surveys to 250 m ----------------------
# (ascii_to_xyz -> get_region(surface) -> blockmedian -> tension spline.
# Ref: data_prep.py:340-453)
for survey in 2007tx 2010tr 201x_Antarctica_Basler 20xx_Antarctica_DC8 \
              20xx_Antarctica_DC8_THW 20xx_Antarctica_TO Data_20141121_05 \
              WISE_ISODYN_RadarByFlight bed_WGS84_grid \
              bed_depth_below_WGS84_datum istarxx; do
  python -m deepbedmap_tpu grid \
    "$(python -c "from deepbedmap_tpu.data.pipeline import survey_config_path as p; print(p('$survey'))")" \
    --data-dir "$DATA/highres" --region-mode surface \
    -o "$WORK/surveys_nc/$survey.nc"
done

# --- 2. build the X/W1/W2/W3/Y training arrays ------------------------------
# (window proposal over each survey grid, selective tiling of BEDMAP2/REMA/
# velocity/accumulation, content-hash pin. Ref: data_prep.py:745-930)
python -m deepbedmap_tpu build \
  --surveys "$WORK/surveys_nc" \
  --lowres "$DATA/lowres/bedmap2_bed.nc" \
  --surface "$DATA/misc/REMA_100m_dem_filled.nc" \
  --velocity-x "$DATA/misc/antarctic_ice_vel_phase_map_v01_VX.nc" \
  --velocity-y "$DATA/misc/antarctic_ice_vel_phase_map_v01_VY.nc" \
  --accumulation "$DATA/misc/Arthern_accumulation_bedmap2_grid1.nc" \
  -o "$WORK/arrays"

# --- 3. train (the paper's 140-epoch optimum) -------------------------------
# (Ref: srgan_train.py:1479-1757; ~10 min on one v5e chip at reference scale)
python -m deepbedmap_tpu train --tiles "$WORK/arrays" \
  --epochs 140 --batch-size 128 --learning-rate 1.7e-4 \
  --out "$WORK/model/ckpt"

# --- 3b. OR the reference's actual workflow: HPO over the real dataset with
# the real Pine-Island RMSE objective + top-10 trials report ----------------
# (Ref: srgan_train.py:1393-1466 get_fixed_test_inputs — test area = the
# gridded 20xx_Antarctica_DC8_THW bounds, conditioning stack via the
# groundtruth fetcher with the 1 km padding contract, track = the survey's
# own xyz points — and srgan_train.py:1725-1757, the study + top-10 table.)
python - << 'PY'
import numpy as np, os, pandas as pd
from deepbedmap_tpu.data.groundtruth import get_model_inputs
from deepbedmap_tpu.data.pipeline import ascii_to_xyz, survey_config_path
from deepbedmap_tpu.data.raster import read_netcdf
DATA, WORK = os.environ.get("DATA", "data"), os.environ.get("WORK", "runbook_work")
test = read_netcdf(f"{WORK}/surveys_nc/20xx_Antarctica_DC8_THW.nc")
bounds = test.bounds  # (xmin, ymin, xmax, ymax) of the Pine Island grid
inputs = get_model_inputs(
    bounds,
    read_netcdf(f"{DATA}/lowres/bedmap2_bed.nc"),
    read_netcdf(f"{DATA}/misc/REMA_100m_dem_filled.nc"),
    read_netcdf(f"{DATA}/misc/antarctic_ice_vel_phase_map_v01_VX.nc"),
    read_netcdf(f"{DATA}/misc/antarctic_ice_vel_phase_map_v01_VY.nc"),
    read_netcdf(f"{DATA}/misc/Arthern_accumulation_bedmap2_grid1.nc"),
    padding=1000.0,  # the training-contract padding (data_prep.py:761-911)
)
os.makedirs(f"{WORK}/eval_inputs", exist_ok=True)
for k, v in inputs.items():
    np.save(f"{WORK}/eval_inputs/{k}.npy", v)
ascii_to_xyz(
    survey_config_path("20xx_Antarctica_DC8_THW"), data_dir=f"{DATA}/highres"
).to_csv(f"{WORK}/eval_track.csv", index=False)
print("eval bounds:", ",".join(str(b) for b in bounds))
with open(f"{WORK}/eval_bounds.txt", "w") as f:
    f.write(",".join(str(b) for b in bounds))
PY
python -m deepbedmap_tpu hpo --trials 30 --tiles "$WORK/arrays" \
  --eval-inputs "$WORK/eval_inputs" --eval-track "$WORK/eval_track.csv" \
  --eval-bounds "$(cat "$WORK/eval_bounds.txt")" \
  --checkpoint-dir "$WORK/model/trials" \
  --storage sqlite:///"$WORK/hpo.db" --report "$WORK/hpo_top10.json"

# --- 4. whole-Antarctica DEM product ---------------------------------------
# (band-streamed, mesh-sharded when multiple chips are present, GeoTIFF
# encode overlapped with compute. Ref: deepbedmap.py:629-756. The continent
# input stacks come from the groundtruth fetcher over the full bounds.)
python - << 'PY'
import numpy as np, os
from deepbedmap_tpu.data.groundtruth import get_model_inputs
from deepbedmap_tpu.data.raster import read_netcdf
DATA, WORK = os.environ.get("DATA", "data"), os.environ.get("WORK", "runbook_work")
bounds = (-2700000.0, -2200000.0, 2800000.0, 2300000.0)  # deepbedmap.py:640
inputs = get_model_inputs(
    bounds,
    read_netcdf(f"{DATA}/lowres/bedmap2_bed.nc"),
    read_netcdf(f"{DATA}/misc/REMA_100m_dem_filled.nc"),
    read_netcdf(f"{DATA}/misc/antarctic_ice_vel_phase_map_v01_VX.nc"),
    read_netcdf(f"{DATA}/misc/antarctic_ice_vel_phase_map_v01_VY.nc"),
    read_netcdf(f"{DATA}/misc/Arthern_accumulation_bedmap2_grid1.nc"),
    padding=0.0,
)
os.makedirs(f"{WORK}/continent_inputs", exist_ok=True)
for k, v in inputs.items():
    np.save(f"{WORK}/continent_inputs/{k}.npy", v)
PY
python -m deepbedmap_tpu continent \
  --inputs "$WORK/continent_inputs" \
  --bounds "-2700000,-2200000,2800000,2300000" \
  --checkpoint "$WORK/model/ckpt" --stream \
  --mesh-devices "${MESH_DEVICES:-0}" \
  -o "$WORK/deepbedmap3_big_int16"

# --- 5. evaluate: grounding-track RMSE over Pine Island ---------------------
# (the <=1 m north star vs the reference DEM; 2007tx is the held-out track.
# Ref: deepbedmap.py:462-525)
python -m deepbedmap_tpu evaluate \
  --dem "$WORK/deepbedmap3_big_int16.tif" \
  --track "$DATA/highres/2007tx.csv"

# --- 6. (optional) prove parity of a released reference artifact -----------
# python -m deepbedmap_tpu verify-weights \
#   --npz model/weights/srgan_generator_model_weights.npz \
#   --inputs "$WORK/continent_inputs" --expected reference_grid.nc --atol 0.5
