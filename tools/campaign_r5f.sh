#!/bin/bash
# Round-5 part F — post-recycle end-to-end demonstration at 32^3.
#
# After the SECOND workspace recycle (COVERAGE.md) the judged machine
# held no datasets, checkpoints, or campaign artifacts at all.  This
# bounded (~30 min) campaign regenerates a complete pipeline from the
# bare machine at 2,000-structure scale so end-to-end artifacts exist
# on disk at round end, and — as a bonus — runs the part-E
# merge-closer-than sweep design on hardware at 32^3 (one decode, arms
# m=0/0.5/0.7 from shared watershed output).
#
# NOT the flagship: 2,000 parents vs ns10k's 10,000 and a 25-epoch
# U-Net / 100-epoch VAE schedule vs 50/250 — quality numbers here are
# small-data results, the capability demonstration is the point.
#
#   bash tools/campaign_r5f.sh [stage...]   # default: all
#   stages: data unet vae gen eval
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export PYTHONUNBUFFERED=1
LOGDIR=output/r5
DRIVER=$LOGDIR/r5f_driver.log
mkdir -p $LOGDIR checkpoints/mini32

UNET_EPOCHS=${UNET_EPOCHS:-25}
VAE_EPOCHS=${VAE_EPOCHS:-100}

stamp() { echo "=== $1 $(date)" | tee -a $DRIVER; }

while [ -f .chip_busy.pid ] && kill -0 "$(cat .chip_busy.pid)" 2>/dev/null; do
  sleep 30
done
echo $$ > .chip_busy.pid
trap 'rm -f .chip_busy.pid' EXIT

run() {
  local name=$1 to=$2; shift 2
  stamp "$name start"
  timeout "$to" "$@" > $LOGDIR/$name.log 2>&1
  local rc=$?
  stamp "$name rc=$rc"
  return $rc
}

for stage in ${*:-data unet vae gen eval}; do
  case $stage in
    data)
      [ -d data/mini32 ] && { stamp "data exists, skip"; continue; }
      run voxmini 1200 python -m icsg3d_tpu.apps.voxelize \
        --synthetic 2000 --kinds perovskite --nrot 0 \
        --out data/mini32 --d 32 --seed 7 || exit 1
      ;;
    unet)
      # epoch-scan first (the 32^3 U-Net scan is r4-proven); per-step
      # resident fallback on failure
      run unetmini 2400 python -m icsg3d_tpu.apps.train_unet \
        --data data/mini32 --ckpt checkpoints/mini32/unet \
        --batch-size 64 --lr 3e-6 --nrot 0 --epochs "$UNET_EPOCHS" \
        --resident --ship-dtype float16 --epoch-scan \
        --ckpt-every "$UNET_EPOCHS" --plot-every 10 \
      || run unetmini_psf 2400 python -m icsg3d_tpu.apps.train_unet \
        --data data/mini32 --ckpt checkpoints/mini32/unet \
        --batch-size 64 --lr 3e-6 --nrot 0 --epochs "$UNET_EPOCHS" \
        --resident --ship-dtype float16 --ckpt-every "$UNET_EPOCHS" \
        --plot-every 10 || exit 1
      ;;
    vae)
      run vaemini 2400 python -m icsg3d_tpu.apps.train_vae \
        --data data/mini32 --ckpt checkpoints/mini32/vae \
        --unet-ckpt checkpoints/mini32/unet \
        --epochs "$VAE_EPOCHS" --batch-size 128 --lr 5e-4 --nrot 0 \
        --resident --ship-dtype float16 --epoch-scan \
        --ckpt-every 25 --plot-every 25 \
      || run vaemini_psf 2400 python -m icsg3d_tpu.apps.train_vae \
        --data data/mini32 --ckpt checkpoints/mini32/vae \
        --unet-ckpt checkpoints/mini32/unet \
        --epochs "$VAE_EPOCHS" --batch-size 128 --lr 5e-4 --nrot 0 \
        --resident --ship-dtype float16 --ckpt-every 25 \
        --plot-every 25 || exit 1
      ;;
    gen)
      BASE=$(python -c '
from icsg3d_tpu.data.store import GridDataset
print(GridDataset("data/mini32").ids[0])')
      run genmini 1800 python -m icsg3d_tpu.apps.generate \
        --data data/mini32 --base "$BASE" \
        --vae-ckpt checkpoints/mini32/vae \
        --unet-ckpt checkpoints/mini32/unet \
        --nsamples 200 --batch-size 20 --var 0.5 \
        --merge-closer-than 0,0.5,0.7 \
        --output $LOGDIR/generated_mini32
      ;;
    eval)
      run evalmini 1800 python -m icsg3d_tpu.apps.evaluate \
        --data data/mini32 --vae-ckpt checkpoints/mini32/vae \
        --unet-ckpt checkpoints/mini32/unet --batch-size 64 \
        --samples 200 --output $LOGDIR/eval_mini32.json
      ;;
    *) echo "unknown stage $stage" >&2; exit 1 ;;
  esac
done
stamp "campaign_r5f complete"
