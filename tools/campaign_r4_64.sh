#!/bin/bash
# Round-4 64^3 campaign (VERDICT r3 item 1): the full reference schedule.
#   smoke gate -> voxelize64 (if absent) -> 64^3 U-Net (50 epochs)
#   -> DFC-VAE 250 epochs with the 64^3-trained perceptual U-Net
#   -> eval64 -> gen64
# Every stage through the public CLIs; chunked fresh processes (axon
# host-RAM leak, CLAUDE.md).  Logs under output/ns10k/.
#
#   nohup bash tools/campaign_r4_64.sh > output/ns10k/r4_64.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export PYTHONUNBUFFERED=1
LOG=output/ns10k/r4_64_driver.log
mkdir -p output/ns10k

stamp() { echo "=== $1 $(date)" | tee -a $LOG; }

stamp "smoke gate"
timeout 1800 python tools/tpu_kernel_smoke.py > output/ns10k/smoke_r4.log 2>&1
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

stamp "unet64 (50 epochs)"
bash tools/campaign_r3_extras.sh unet64 || { stamp "unet64 FAILED"; exit 1; }
stamp "unet64 done"

stamp "vae64 (250 epochs, perceptual = 64^3 U-Net)"
UNET_CKPT=checkpoints/mix64/unet bash tools/campaign_mix64.sh 250 25 ndhwc \
  || { stamp "vae64 FAILED"; exit 1; }
stamp "vae64 done"

stamp "eval64 + gen64"
bash tools/campaign_r3_extras.sh eval64 gen64
stamp "campaign_r4_64 complete"
