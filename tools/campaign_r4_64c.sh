#!/bin/bash
# Round-4 64^3 campaign, part C — full rerun on a fresh workspace (the
# VM reset wiped data/, checkpoints/ and the compile cache; only the
# repo survived).  Same plan as campaign_r4_64.sh but with part B's
# OOM lessons baked in from the start (10-epoch vae chunks, mid-chunk
# latest saves, thinned best-val plots), plus the ns10k 32^3 data build
# so the follow-on campaign has its dataset ready.
#
#   nohup bash tools/campaign_r4_64c.sh > output/ns10k/r4_64c.log 2>&1 &
#   echo $! > /tmp/campaign64.pid
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export PYTHONUNBUFFERED=1
LOG=output/ns10k/r4_64_driver.log
mkdir -p output/ns10k

stamp() { echo "=== $1 $(date)" | tee -a $LOG; }

stamp "smoke gate"
timeout 2400 python tools/tpu_kernel_smoke.py > output/ns10k/smoke_r4.log 2>&1
rc=$?
stamp "smoke rc=$rc"
if [ $rc -ne 0 ]; then
  echo "kernel smoke gate FAILED - aborting campaign" | tee -a $LOG
  exit 1
fi

if [ ! -d data/mix64 ]; then
  stamp "voxelize64"
  timeout 3600 python -m icsg3d_tpu.apps.voxelize \
    --synthetic 2000 --kinds perovskite,rocksalt --nrot 0 \
    --out data/mix64 --d 64 --seed 11 > output/ns10k/voxelize64.log 2>&1
  rc=$?
  stamp "voxelize64 rc=$rc"
  [ $rc -ne 0 ] && exit 1
fi

if [ ! -d data/ns10k ]; then
  stamp "voxelize ns10k (for the follow-on campaign)"
  timeout 1800 python -m icsg3d_tpu.apps.voxelize \
    --synthetic 10000 --kinds perovskite --nrot 0 \
    --out data/ns10k --d 32 --seed 7 > output/ns10k/voxelize.log 2>&1
  rc=$?
  stamp "voxelize ns10k rc=$rc"
  [ $rc -ne 0 ] && exit 1
fi

stamp "unet64 (50 epochs)"
bash tools/campaign_r3_extras.sh unet64 || { stamp "unet64 FAILED"; exit 1; }
stamp "unet64 done"

stamp "vae64 (250 epochs, chunk 10, perceptual = 64^3 U-Net)"
CKPT_EVERY=5 PLOT_EVERY=5 UNET_CKPT=checkpoints/mix64/unet \
  bash tools/campaign_mix64.sh 250 10 ndhwc \
  || { stamp "vae64 FAILED"; exit 1; }
stamp "vae64 done"

stamp "eval64 + gen64"
bash tools/campaign_r3_extras.sh eval64 gen64
stamp "campaign_r4_64 complete"
