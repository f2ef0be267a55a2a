#!/bin/bash
# Realistic-data end-to-end campaign (VERDICT r3 item 2): the full pipeline
# over the vendored third-party-style CIF corpus — 20 published structures
# in ICSD/MP formats (tests/fixtures/real_cifs/, non-P1 symop loops,
# partial occupancies, uncertainty suffixes, multi-block) — through the
# SAME public CLIs as the synthetic campaigns:
#   parse+voxelize (x11 with rotations) -> U-Net -> DFC-VAE -> CGCNN
#   -> evaluate -> generate (+property annotation)
#
#   bash tools/campaign_realcif.sh
# Stages run as fresh processes (axon host-RAM leak, CLAUDE.md); the whole
# campaign is minutes of chip time (220 grids at 32^3).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export PYTHONUNBUFFERED=1
LOGDIR=output/realcif
mkdir -p $LOGDIR checkpoints/realcif

run() {  # run <name> <timeout> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date)" | tee -a $LOGDIR/driver.log
  timeout "$to" "$@" > $LOGDIR/$name.log 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date)" | tee -a $LOGDIR/driver.log
  [ $rc -ne 0 ] && echo "campaign_realcif: $name FAILED (rc=$rc)" >&2
  return $rc
}

if [ ! -d data/realcif ]; then
  run voxelize 1800 python -m icsg3d_tpu.apps.voxelize \
    --cifs tests/fixtures/real_cifs \
    --targets-csv tests/fixtures/real_cifs/targets.csv \
    --out data/realcif --d 32 --nrot 10 --seed 5 || exit 1
fi

# 20 parents x11 rotations = 220 grids; reference lr, epoch counts scaled
# so the optimizer sees a few thousand steps (the reference's 50-epoch
# U-Net schedule on 1000 samples is ~4000 steps; 176 train grids need
# more epochs for the same step count).
[ -d checkpoints/realcif/unet/best ] || \
run unet 3600 python -m icsg3d_tpu.apps.train_unet \
  --data data/realcif --ckpt checkpoints/realcif/unet \
  --batch-size 16 --lr 3e-6 --nrot 10 --epochs 150 --ckpt-every 50 || exit 1

[ -d checkpoints/realcif/vae/best ] || \
run vae 3600 python -m icsg3d_tpu.apps.train_vae \
  --data data/realcif --ckpt checkpoints/realcif/vae \
  --unet-ckpt checkpoints/realcif/unet \
  --batch-size 20 --lr 5e-4 --nrot 10 --epochs 250 --ckpt-every 50 || exit 1

# CGCNN featurizes graphs straight from the CIF corpus (the packed grid
# store is a voxel artifact; graphs come from sites+lattice): batch 8 so
# the 16-parent train split yields full batches.
[ -d checkpoints/realcif/cgcnn/best ] || \
run cgcnn 3600 python -m icsg3d_tpu.apps.train_cgcnn \
  --cifs tests/fixtures/real_cifs \
  --targets-csv tests/fixtures/real_cifs/targets.csv \
  --target formation_energy_per_atom \
  --ckpt checkpoints/realcif/cgcnn \
  --batch-size 8 --epochs 60 || exit 1

# evaluate's split is always the non-rotated val parents (same parent
# partition as training's --nrot 10 split; evaluate.py data_split n_rot=0)
run eval 3600 python -m icsg3d_tpu.apps.evaluate \
  --data data/realcif --vae-ckpt checkpoints/realcif/vae \
  --unet-ckpt checkpoints/realcif/unet --batch-size 4 \
  --output $LOGDIR/eval.json --plots $LOGDIR/eval_plots

run generate 3600 python -m icsg3d_tpu.apps.generate \
  --data data/realcif --base LaFeO3_Pnma_icsd \
  --vae-ckpt checkpoints/realcif/vae --unet-ckpt checkpoints/realcif/unet \
  --cgcnn-ckpt formation_energy_per_atom=checkpoints/realcif/cgcnn \
  --nsamples 100 --batch-size 20 --var 0.5 \
  --output $LOGDIR/generated

echo "=== campaign_realcif done $(date)" | tee -a $LOGDIR/driver.log
